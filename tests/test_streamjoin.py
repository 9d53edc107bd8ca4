"""Stream-stream interval join + watermarked dedup (round 3): the
streaming results must equal the batch twin of the same operator on the
same data — the stream/batch-agnostic code path is the invariant."""

import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_rust_spark.streaming.joins import dedup_within_watermark, interval_join
from tests.conftest import assert_pdf_equal

SRC = "/root/testdata/sf0.001/events.parquet"


def _run_to_memory(spark, df, name, tmp_path, mode="append"):
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {name}").toPandas()
    finally:
        q.stop()
        q.awaitTermination()


def test_interval_join_stream_equals_batch(spark, tmp_path):
    events = spark.read.parquet(SRC)
    clicks_b = events.filter(F.col("event_type") == "click")
    buys_b = events.filter(F.col("event_type") == "purchase")
    expected = interval_join(
        clicks_b, buys_b, key="user_id", upper_sec=3600
    ).toPandas()
    assert len(expected) > 0  # fixture sanity: attribution pairs exist

    src = pd.read_parquet(SRC)
    for sub, pdf in (
        ("clicks", src[src.event_type == "click"]),
        ("buys", src[src.event_type == "purchase"]),
    ):
        (tmp_path / sub).mkdir()
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            tmp_path / sub / "part-0.parquet",
        )
    schema = spark.read.parquet(str(tmp_path / "clicks")).schema

    def stream(sub):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / sub))
        )

    joined = interval_join(
        stream("clicks"), stream("buys"), key="user_id", upper_sec=3600
    )
    assert joined.isStreaming
    actual = _run_to_memory(spark, joined, "ij", tmp_path)
    assert_pdf_equal(actual, expected, sort_cols=["l_event_id", "r_event_id"])


def test_dedup_within_watermark_drops_redelivery(spark, tmp_path):
    """Every event redelivered once (two WAL segments with the same
    rows): the streaming dedup emits each event exactly once, equal to
    the batch distinct."""
    src = pd.read_parquet(SRC)
    d = tmp_path / "dup"
    d.mkdir()
    for i in range(2):  # segment 1 = original, segment 2 = full replay
        pq.write_table(pa.Table.from_pandas(src, preserve_index=False),
                       d / f"seg-{i}.parquet")
    schema = spark.read.parquet(SRC).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = dedup_within_watermark(stream, keys=["event_id"], watermark="2 hours")
    assert out.isStreaming
    actual = _run_to_memory(spark, out, "dd", tmp_path)
    assert len(actual) == len(src)
    assert sorted(actual.event_id) == sorted(src.event_id)
    # batch fallback agrees
    batch = dedup_within_watermark(spark.read.parquet(str(d)), keys=["event_id"])
    assert batch.count() == len(src)


def test_interval_join_outer_stream_equals_batch(spark, tmp_path):
    """LEFT OUTER interval join on streams: unconverted clicks emit with
    null purchase columns once the watermark proves no match can arrive.
    A far-future sentinel event on both streams pushes the watermark past
    every real interval so the trailing unmatched rows flush."""
    from etl_rust_spark.streaming.joins import interval_join_outer

    events = spark.read.parquet(SRC)
    clicks_b = events.filter(F.col("event_type") == "click")
    buys_b = events.filter(F.col("event_type") == "purchase")
    expected = interval_join_outer(
        clicks_b, buys_b, key="user_id", upper_sec=3600, watermark="10 minutes"
    ).toPandas()
    n_unmatched = expected.r_event_id.isna().sum()
    assert n_unmatched > 0  # fixture sanity: some clicks never convert
    assert len(expected) > n_unmatched  # ...and some do

    src = pd.read_parquet(SRC)
    sentinel_ts = src.ts.max() + pd.Timedelta(days=365)
    for sub, pdf in (
        ("clicks", src[src.event_type == "click"]),
        ("buys", src[src.event_type == "purchase"]),
    ):
        (tmp_path / sub).mkdir()
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            tmp_path / sub / "part-0.parquet",
        )
        sent = pdf.iloc[:1].copy()
        sent["event_id"] = -1
        sent["user_id"] = -1
        sent["ts"] = sentinel_ts
        sent["ts"] = sent["ts"].astype(pdf["ts"].dtype)  # keep µs precision
        pq.write_table(
            pa.Table.from_pandas(sent, preserve_index=False),
            tmp_path / sub / "part-1-sentinel.parquet",
        )
    schema = spark.read.parquet(str(tmp_path / "clicks")).schema

    def stream(sub):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / sub))
        )

    joined = interval_join_outer(
        stream("clicks"), stream("buys"), key="user_id", upper_sec=3600,
        watermark="10 minutes",
    )
    assert joined.isStreaming
    actual = _run_to_memory(spark, joined, "ijo", tmp_path)
    actual = actual[actual.l_user_id != -1].reset_index(drop=True)
    assert_pdf_equal(actual, expected, sort_cols=["l_event_id", "r_event_id"])
