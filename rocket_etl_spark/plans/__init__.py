from rocket_etl_spark.plans.jobspec import DestSpec, JobSpec, SourceSpec, TransformSpec, run_job

__all__ = ["JobSpec", "SourceSpec", "TransformSpec", "DestSpec", "run_job"]
