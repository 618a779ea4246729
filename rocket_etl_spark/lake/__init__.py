from rocket_etl_spark.lake.merge import CommitResult, merge_batch
from rocket_etl_spark.lake.table import LakeTable

__all__ = ["LakeTable", "merge_batch", "CommitResult"]
