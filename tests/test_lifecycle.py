"""B9/B10/M5 parity: lifecycle hooks, name-wrapped fail-fast errors,
streaming progress listener, and the vectorized pandas-UDF surface."""

import json

import pytest
from pyspark.sql import functions as F

from etl_rust_spark.streaming.driver import PipelineError
from etl_rust_spark.streaming.listener import ProgressLogListener
from tests.test_streaming import _mk_ingest, _mk_log


def test_lifecycle_hooks_and_counts(spark, tmp_path):
    """Reference counts extract=1, pre/post once per run
    (src/etl/manager_test.rs:321-340)."""
    calls = []
    ingest = _mk_ingest(spark, tmp_path, "hooks", _mk_log(300), n_segments=2)
    ingest.pre_process = lambda: calls.append("pre")
    ingest.post_process = lambda: calls.append("post")
    ingest.run_available()
    assert calls == ["pre", "post"]


def test_pipeline_error_is_name_wrapped(spark, tmp_path):
    ingest = _mk_ingest(spark, tmp_path, "boom", _mk_log(300), n_segments=2)

    def bad_transform(df):
        return df.withColumn("lsn", F.col("lsn") / 0)  # ANSI: division by zero

    ingest.transform = bad_transform
    with pytest.raises(PipelineError, match="pipeline 'boom' failed"):
        ingest.run_available()
    assert len(spark.streams.active) == 0  # stopped, not leaked


def test_progress_listener_logs_batches(spark, tmp_path):
    log_path = str(tmp_path / "progress.jsonl")
    listener = ProgressLogListener(log_path)
    spark.streams.addListener(listener)
    try:
        ingest = _mk_ingest(spark, tmp_path, "obs", _mk_log(300), n_segments=3)
        ingest.run_available()
        # listener delivery is async — poll for the terminated event
        import time as _t

        for _ in range(40):
            if "terminated" in open(log_path).read():
                break
            _t.sleep(0.25)
    finally:
        spark.streams.removeListener(listener)
    events = [json.loads(l) for l in open(log_path)]
    kinds = [e["event"] for e in events]
    assert "started" in kinds and "terminated" in kinds
    progress = [e for e in events if e["event"] == "progress"]
    # 300 events + 5% duplicate delivery = 315 rows through the stream.
    # Exactly-once DELIVERY is the invariant: each segment arrives in
    # exactly one micro-batch and each batch commits its rows once
    # (lineage n_changes). num_input_rows counts source EXECUTIONS, not
    # deliveries — a populated-CoW epoch legitimately scans its batch
    # twice (narrow touched-bucket pre-pass + the write; r6, the batch
    # cache removal), so the sum is bounded by 2x, not equal to 315.
    batches_with_rows = [
        e for e in progress if e["num_input_rows"] > 0
    ]
    assert len(batches_with_rows) == 3  # one per segment, none re-delivered
    total_in = sum(e["num_input_rows"] for e in batches_with_rows)
    assert 315 <= total_in <= 2 * 315


def test_vectorized_udfs_agree_with_expressions(spark):
    from etl_rust_spark.functions.vectorized import quality_score_udf, weighted_mean_udaf
    from etl_rust_spark.operators.text import quality_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    both = docs.select(
        quality_score("text").alias("expr_score"),
        quality_score_udf("text").alias("udf_score"),
    )
    bad = both.filter(F.abs(F.col("expr_score") - F.col("udf_score")) > 1e-9)
    assert bad.count() == 0

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    k = F.get_json_object("props", "$.k").cast("double")
    # grouped-agg pandas UDFs can't mix with JVM aggs in one agg — join
    udf_side = ev.groupBy("event_type").agg(
        weighted_mean_udaf(F.col("value"), k).alias("wm_udf")
    )
    expr_side = ev.groupBy("event_type").agg(
        (F.sum(F.col("value") * k) / F.sum(k)).alias("wm_expr")
    )
    agg = udf_side.join(expr_side, "event_type")
    bad = agg.filter(F.abs(F.col("wm_udf") - F.col("wm_expr")) > 1e-9)
    assert bad.count() == 0
