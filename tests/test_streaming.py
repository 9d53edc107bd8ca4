"""M3 — streaming driver: WAL tail → exactly-once upsert, crash/resume,
multi-pipeline manager."""

import numpy as np

from etl_rust_spark.changelog import (
    CHANGELOG_SCHEMA,
    ChangelogConfig,
    generate_changelog_pandas,
    replay_oracle_pandas,
    write_wal_segments,
)
from etl_rust_spark.operators.apply import create_transcript_table, read_transcripts
from etl_rust_spark.streaming.driver import ChangelogIngest, PipelineManager
from etl_rust_spark.lake.format import IceliteTable
from tests.conftest import assert_pdf_equal


def _mk_log(n=900, seed=42):
    return generate_changelog_pandas(
        ChangelogConfig(
            n_events=n, n_conversations=8, turns_per_conv=12,
            dup_fraction=0.05, delete_fraction=0.08, seed=seed,
        )
    )


def _mk_ingest(spark, tmp_path, name, log, n_segments=5):
    wal = str(tmp_path / f"wal_{name}")
    write_wal_segments(log, wal, n_segments, spark)
    create_transcript_table(spark, str(tmp_path / f"tbl_{name}"), n_buckets=4)
    return ChangelogIngest(
        spark=spark,
        wal_dir=wal,
        table_path=str(tmp_path / f"tbl_{name}"),
        checkpoint_dir=str(tmp_path / f"ckpt_{name}"),
        schema=CHANGELOG_SCHEMA,
        name=name,
    )


def test_stream_matches_oracle(spark, tmp_path):
    log = _mk_log()
    ingest = _mk_ingest(spark, tmp_path, "s1", log)
    ingest.run_available()
    table = IceliteTable.load(spark, ingest.table_path)
    assert_pdf_equal(read_transcripts(table).toPandas(), replay_oracle_pandas(log))
    # one commit per micro-batch (maxFilesPerTrigger=1 → 5 segments)
    lin = table.lineage().toPandas()
    assert len(lin) == 5
    assert lin.source.str.startswith("stream:").all()


def test_crash_resume_from_checkpoint(spark, tmp_path):
    """Stop after the first segments, restart from the same checkpoint:
    final state identical, no duplicated effects (SURVEY.md §5 resume
    test; the reference cannot do this at all)."""
    log = _mk_log(seed=7)
    wal = str(tmp_path / "wal")
    all_segments = write_wal_segments(log, wal, 6, spark)
    assert len(all_segments) == 6
    create_transcript_table(spark, str(tmp_path / "tbl"), n_buckets=4)
    ingest = ChangelogIngest(
        spark=spark, wal_dir=wal, table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ckpt"), schema=CHANGELOG_SCHEMA, name="cr",
    )
    # phase 1: process a couple of micro-batches then "crash" (stop)
    q = ingest.start()
    while not q.recentProgress:
        q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    table = IceliteTable.load(spark, ingest.table_path)
    seq_mid = table.current_seq()
    assert 0 < seq_mid

    # phase 2: restart from checkpoint; drains the remainder exactly once
    ingest.run_available()
    assert_pdf_equal(read_transcripts(table).toPandas(), replay_oracle_pandas(log))

    # phase 3: a THIRD run with a fresh checkpoint re-delivers everything;
    # the applied_batches ledger must no-op every re-delivered batch
    seq_done = table.current_seq()
    ingest2 = ChangelogIngest(
        spark=spark, wal_dir=wal, table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ckpt"), schema=CHANGELOG_SCHEMA, name="cr",
    )
    ingest2.run_available()
    assert table.current_seq() == seq_done
    assert_pdf_equal(read_transcripts(table).toPandas(), replay_oracle_pandas(log))


def test_stream_mor_with_auto_compaction(spark, tmp_path):
    """Merge-on-read streaming: delta commits + periodic compaction; final
    state still equals the oracle."""
    log = _mk_log(seed=11)
    ingest = _mk_ingest(spark, tmp_path, "mor1", log, n_segments=6)
    ingest.mode = "mor"
    ingest.compact_every = 3
    ingest.run_available()
    table = IceliteTable.load(spark, ingest.table_path)
    assert_pdf_equal(read_transcripts(table).toPandas(), replay_oracle_pandas(log))
    lin = table.lineage().toPandas()
    assert (lin.source == "compact").sum() >= 1


def test_manager_runs_pipelines_concurrently(spark, tmp_path):
    logs = {name: _mk_log(seed=i) for i, name in enumerate(["p1", "p2", "p3"])}
    mgr = PipelineManager(spark)
    for name, log in logs.items():
        mgr.add_pipeline(_mk_ingest(spark, tmp_path, name, log, n_segments=3))
    mgr.run_all_available()
    for name, log in logs.items():
        table = IceliteTable.load(spark, str(tmp_path / f"tbl_{name}"))
        assert_pdf_equal(read_transcripts(table).toPandas(), replay_oracle_pandas(log))
    assert len(spark.streams.active) == 0


def test_json_wal_segments(spark, tmp_path):
    """Binlog-style JSON-lines WAL segments ingest identically to parquet
    segments (S1/S2 source-format parity)."""
    log = _mk_log(600, seed=21)
    wal = str(tmp_path / "wal_json")
    write_wal_segments(log, wal, 3, spark, fmt="json")
    create_transcript_table(spark, str(tmp_path / "tbl_json"), n_buckets=4)
    ingest = ChangelogIngest(
        spark=spark, wal_dir=wal, table_path=str(tmp_path / "tbl_json"),
        checkpoint_dir=str(tmp_path / "ckpt_json"), schema=CHANGELOG_SCHEMA,
        name="json_wal", wal_format="json", mode="mor",
    )
    ingest.run_available()
    table = IceliteTable.load(spark, ingest.table_path)
    assert_pdf_equal(read_transcripts(table).toPandas(), replay_oracle_pandas(log))


def test_windowed_rollup_table_equals_batch_aggregate(spark, tmp_path):
    """Streaming rollup sink (materialized view): hourly per-user
    aggregates continuously upserted into Icelite. Late events in later
    segments re-emit their window with a larger epoch and overwrite the
    row; the final table must equal the batch aggregate of ALL events,
    and a restarted query must not double-apply (ledger no-op)."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_rust_spark.streaming.driver import WindowedRollupIngest

    rng = np.random.RandomState(7)
    base = dt.datetime(2025, 3, 1)
    rows = []
    for i in range(600):
        rows.append(
            (i, base + dt.timedelta(minutes=int(rng.randint(0, 600))),
             int(rng.randint(0, 12)), float(rng.randint(0, 1000)) / 7.0)
        )
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    # segment 1 = first half by time, segments 2-3 = interleaved remainder
    # (so late rows for already-emitted windows arrive in later batches)
    srt = pdf.sort_values("ts").reset_index(drop=True)
    segs = [srt.iloc[:300], srt.iloc[300::2], srt.iloc[301::2]]
    wal = tmp_path / "wal"
    wal.mkdir()
    for i, seg in enumerate(segs):
        pq.write_table(pa.Table.from_pandas(seg, preserve_index=False),
                       wal / f"seg-{i}.parquet")
    schema = spark.read.parquet(str(wal / "seg-0.parquet")).schema

    WindowedRollupIngest.create_table(
        spark, str(tmp_path / "rollup"),
        T.StructField("user_id", T.LongType()), n_buckets=4,
    )
    pipe = WindowedRollupIngest(
        spark=spark, wal_dir=str(wal), table_path=str(tmp_path / "rollup"),
        checkpoint_dir=str(tmp_path / "ck"), schema=schema,
        window="1 hour", watermark="12 hours",
    )
    pipe.run_available()

    from etl_rust_spark.lake.format import IceliteTable

    table = IceliteTable.load(spark, str(tmp_path / "rollup"))
    got = (
        table.read().drop("__lsn").toPandas()
        .sort_values(["user_id", "window_start"]).reset_index(drop=True)
    )
    want = (
        spark.createDataFrame(pdf)
        .groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(24,6)")).cast("double").alias("value_sum"),
        )
        .select("user_id", F.col("w.start").cast("long").alias("window_start"),
                "n_events", "value_sum")
        .toPandas()
        .sort_values(["user_id", "window_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)

    # restart from the same checkpoint: pure replay, table unchanged
    seq = table.current_seq()
    pipe.run_available()
    assert table.current_seq() == seq
