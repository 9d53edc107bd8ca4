from etl_rust_spark.lake.format import IceliteTable, ConcurrentCommitError

__all__ = ["IceliteTable", "ConcurrentCommitError"]
