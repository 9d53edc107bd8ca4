from etl_rust_spark.lake.catalog import IceliteCatalog
from etl_rust_spark.lake.format import ConcurrentCommitError, IceliteTable

__all__ = ["IceliteTable", "IceliteCatalog", "ConcurrentCommitError"]
