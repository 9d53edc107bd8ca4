from etl_rust_spark.streaming.driver import ChangelogIngest, PipelineManager

__all__ = ["ChangelogIngest", "PipelineManager"]
