"""Stream-stream operators: event-time interval join and watermarked
exact dedup — the two stateful stream combinators the reference's
channel model cannot express at all (each reference pipeline is a single
linear E→T→L flow, /root/reference/src/etl/processor.rs:94-176; joining
two live streams or deduplicating across batches requires engine-managed
state, which Structured Streaming provides).

Both functions are stream/batch agnostic: ``withWatermark`` is a no-op on
a batch DataFrame, so the SAME code path serves the streaming job and its
batch twin (which is what the oracle checks)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_sec: int,
    upper_sec: int,
    watermark: str,
    how: str,
) -> DataFrame:
    lcols = [F.col(f"l.{c}").alias(f"l_{c}") for c in left.columns]
    rcols = [F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns]
    # watermarks require TIMESTAMP (parquet hands NTZ; session is UTC-pinned)
    left = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    right = right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
    lf = left.withWatermark(left_ts, watermark).alias("l")
    rf = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower_sec} SECONDS")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper_sec} SECONDS")
        )
    )
    return lf.join(rf, cond, how).select(*lcols, *rcols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_sec: int = 0,
    upper_sec: int = 3600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time INTERVAL join: pair each left row with same-key right
    rows whose timestamp lies in ``[left.ts - lower, left.ts + upper]``
    (attribution joins: click → purchase within the hour). On streams
    both sides carry a watermark and the time bound lets Spark EXPIRE
    join state — without it stream-stream join state grows forever.
    Returns left.* prefixed ``l_`` and right.* prefixed ``r_``."""
    return _interval_join(
        left, right, key, left_ts, right_ts, lower_sec, upper_sec,
        watermark, "inner",
    )


def interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_sec: int = 0,
    upper_sec: int = 3600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER event-time interval join: like ``interval_join`` but
    unmatched left rows survive with null right columns — the funnel
    query (clicks that did NOT convert within the hour). On a stream the
    null-extended row can only be emitted once the watermark passes the
    interval's end (the engine must PROVE no match can still arrive), so
    outer results trail the watermark — the correctness/latency trade
    every streaming outer join makes. Same single code path for the
    batch twin."""
    return _interval_join(
        left, right, key, left_ts, right_ts, lower_sec, upper_sec,
        watermark, "left_outer",
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming EXACT dedup: drop redelivered events by key, keeping
    state only within the watermark horizon (bounded state — the
    at-least-once→exactly-once repair for sources that can re-emit, e.g.
    a WAL tail replaying a segment). Batch DataFrames fall back to plain
    ``dropDuplicates`` (the watermark variant is streaming-only)."""
    if events.isStreaming:
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))
