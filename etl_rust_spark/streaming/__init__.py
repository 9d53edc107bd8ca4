from etl_rust_spark.streaming.driver import (
    ChangelogIngest,
    PipelineManager,
    WindowedRollupIngest,
)
from etl_rust_spark.streaming.enrich import ChangeFeedEnrich
from etl_rust_spark.streaming.scd2 import ChangeFeedScd2
from etl_rust_spark.streaming.transform import ChangeFeedTransform
from etl_rust_spark.streaming.joins import (
    dedup_within_watermark,
    interval_join,
    interval_join_outer,
)

__all__ = [
    "ChangeFeedEnrich",
    "ChangeFeedScd2",
    "ChangeFeedTransform",
    "ChangelogIngest",
    "PipelineManager",
    "WindowedRollupIngest",
    "interval_join",
    "interval_join_outer",
    "dedup_within_watermark",
]
