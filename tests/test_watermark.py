"""Event-time windows + watermark: streaming result equals the batch
computation of the same rollup (complete mode keeps every window; the
watermark still bounds state for late data)."""


from etl_rust_spark.streaming.driver import windowed_event_counts
from tests.conftest import assert_pdf_equal


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    import shutil

    src = "/root/testdata/sf0.001/events.parquet"
    batch_df = spark.read.parquet(src)
    expected = windowed_event_counts(batch_df).toPandas()

    # file-stream source needs a directory
    stream_dir = tmp_path / "evstream"
    stream_dir.mkdir()
    shutil.copy(src, stream_dir / "events-0.parquet")
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        actual = spark.sql("SELECT * FROM win_counts").toPandas()
    finally:
        q.stop()
        q.awaitTermination()
    assert len(actual) > 0
    assert_pdf_equal(actual, expected, sort_cols=["win_start", "event_type"])


def test_watermark_present_in_stream_plan(spark, tmp_path):
    import shutil

    src = "/root/testdata/sf0.001/events.parquet"
    schema = spark.read.parquet(src).schema
    stream_dir = tmp_path / "evstream2"
    stream_dir.mkdir()
    shutil.copy(src, stream_dir / "events-0.parquet")
    stream = spark.readStream.schema(schema).parquet(str(stream_dir))
    agg = windowed_event_counts(stream, watermark="30 minutes")
    assert agg.isStreaming
    assert "EventTimeWatermark" in agg._jdf.queryExecution().logical().toString()
