"""Custom Spark data sources (Python Data Source API, Spark 4)."""

from etl_rust_spark.sources.icelite_source import (
    IceliteDataSource,
    register_icelite_source,
)

__all__ = ["IceliteDataSource", "register_icelite_source"]
