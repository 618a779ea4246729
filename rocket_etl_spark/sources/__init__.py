from rocket_etl_spark.sources.readers import read_source, source_checksum

__all__ = ["read_source", "source_checksum"]
