"""etl_rust_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of the reference ETL framework
(``cuongtranba/etl-rust``, a Tokio-based extract/transform/load pipeline —
see /root/reference/src/lib.rs:1-37) as an idiomatic Spark design:

- change events (binlog/WAL-style) over conversation-transcript tables are
  read as Structured Streaming micro-batches,
- deduplicated last-writer-wins by max LSN per (conv_id, turn_idx) with
  map-side partial aggregation (and optional explicit salting for extreme
  single-key skew),
- MERGE'd exactly-once into an Iceberg-semantics lake table ("Icelite":
  Parquet data files + split JSON metadata — hard-link-committed snapshot
  pointers over per-commit delta manifests — merge-on-read or
  copy-on-write, bucket-pruned with per-file key-range skipping,
  schema-evolving, time-travelable, incrementally consumable),
- with a per-commit lineage ledger and an idempotent batch-key ledger so
  re-delivered micro-batches are no-ops.

The reference's channel/bucket/worker-pool machinery (its §2.3 operators)
maps onto Spark's own micro-batch engine and task scheduler; nothing in the
hot path runs per-row Python.
"""

from etl_rust_spark.session import get_spark
from etl_rust_spark.changelog import (
    CHANGELOG_SCHEMA,
    TRANSCRIPT_SCHEMA,
    ChangelogConfig,
    generate_changelog_pandas,
    generate_changelog_spark,
    replay_oracle_pandas,
)
from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.lake.seam import TableFormat, open_table
from etl_rust_spark.operators.apply import (
    apply_changes,
    create_transcript_table,
    dedup_max_lsn,
    read_transcripts,
    renumber_turns,
)
from etl_rust_spark.streaming.driver import (
    ChangelogIngest,
    PipelineManager,
    WindowedRollupIngest,
)
from etl_rust_spark.streaming.joins import (
    dedup_within_watermark,
    interval_join,
    interval_join_outer,
)

__all__ = [
    "get_spark",
    "CHANGELOG_SCHEMA",
    "TRANSCRIPT_SCHEMA",
    "ChangelogConfig",
    "generate_changelog_pandas",
    "generate_changelog_spark",
    "replay_oracle_pandas",
    "IceliteTable",
    "TableFormat",
    "open_table",
    "apply_changes",
    "create_transcript_table",
    "dedup_max_lsn",
    "read_transcripts",
    "renumber_turns",
    "ChangelogIngest",
    "PipelineManager",
    "WindowedRollupIngest",
    "interval_join",
    "interval_join_outer",
    "dedup_within_watermark",
]

__version__ = "0.1.0"
