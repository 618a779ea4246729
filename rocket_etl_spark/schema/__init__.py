from rocket_etl_spark.schema.registry import Field, TableSchema

__all__ = ["Field", "TableSchema"]
