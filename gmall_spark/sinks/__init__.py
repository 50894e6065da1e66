from gmall_spark.sinks.batch import write_jdbc, write_parquet, write_routed_parquet

__all__ = ["write_jdbc", "write_parquet", "write_routed_parquet"]
