"""Icelite as a Spark streaming source (Python Data Source API):
``readStream.format("icelite")`` tails the table's commit log with
commit-seq offsets — exactly-once resumable from the checkpoint, same
row semantics as the JVM batch API ``read_changes``.

Reference analog: the change-consuming side of the reference's pipeline
(src/etl/processor.rs) — there a Postgres consumer tails LSNs; here any
number of Spark streams tail the lake table itself.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_rust_spark.changelog import CHANGELOG_SCHEMA
from etl_rust_spark.operators.apply import apply_changes, create_transcript_table
from etl_rust_spark.sources import register_icelite_source


def _batch(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "ts"]
    )
    pdf["tool"] = ""
    pdf = pdf[["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    pdf["ts"] = pd.Timestamp("2025-01-01")
    return spark.createDataFrame(pdf, schema=CHANGELOG_SCHEMA)


def _drain(spark, tpath, ck, since=None):
    """Run the stream to exhaustion against a (possibly pre-existing)
    checkpoint; return the rows THIS run delivered (foreachBatch — the
    memory sink cannot recover from a checkpoint)."""
    rows = []
    reader = spark.readStream.format("icelite").option("path", tpath)
    if since is not None:
        reader = reader.option("sinceSeq", str(since))
    q = (
        reader.load()
        .writeStream.foreachBatch(lambda df, _eid: rows.extend(df.collect()))
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def _key_rows(rows):
    if hasattr(rows, "collect"):
        rows = rows.collect()
    return {
        (r["conv_id"], r["turn_idx"], r["__lsn"], r["text"], r["_commit_seq"])
        for r in rows
    }


def test_stream_tails_commits_and_resumes_exactly_once(spark, tmp_path):
    register_icelite_source(spark)
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [
        (1, "I", "c1", 0, "user", "a", None),
        (2, "I", "c2", 0, "user", "b", None),
    ]), batch_key="b0", mode="mor")
    apply_changes(t, _batch(spark, [
        (3, "U", "c1", 0, "user", "a2", None),
    ]), batch_key="b1", mode="mor")

    ck = str(tmp_path / "ck")
    got = _key_rows(_drain(spark, str(tmp_path / "t"), ck))
    want = _key_rows(
        t.read_changes(since_seq=0).select(
            "conv_id", "turn_idx", "__lsn", "text", "_commit_seq"
        )
    )
    assert got == want and len(got) == 3

    # new commit; SAME checkpoint → only the delta arrives (offset resume)
    apply_changes(t, _batch(spark, [
        (4, "I", "c3", 0, "user", "late", None),
    ]), batch_key="b2", mode="mor")
    got2 = _key_rows(_drain(spark, str(tmp_path / "t"), ck))
    assert len(got2) == 1
    (new_row,) = got2
    assert new_row[0] == "c3" and new_row[4] == t.current_seq()

    # re-drain with nothing new: no duplicates (exactly-once)
    assert _drain(spark, str(tmp_path / "t"), ck) == []


def test_batch_reader_matches_read_changes(spark, tmp_path):
    register_icelite_source(spark)
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [
        (1, "I", "c1", 0, "user", "x", None),
        (2, "I", "c1", 1, "assistant", "y", None),
    ]), batch_key="b0", mode="mor")
    apply_changes(t, _batch(spark, [
        (5, "U", "c1", 1, "assistant", "y2", None),
    ]), batch_key="b1", mode="mor")
    via_source = spark.read.format("icelite").option(
        "path", str(tmp_path / "t")
    ).load()
    via_jvm = t.read_changes(since_seq=0)
    cols = ["conv_id", "turn_idx", "__lsn", "text", "_commit_seq"]
    assert _key_rows(via_source.select(*cols[:4], "_commit_seq")) == _key_rows(
        via_jvm.select(*cols[:4], "_commit_seq")
    )
    # ranged read: only the second commit
    ranged = spark.read.format("icelite").option("path", str(tmp_path / "t")) \
        .option("sinceSeq", str(t.current_seq() - 1)).load()
    assert ranged.count() == 1 and ranged.first()["text"] == "y2"


def test_stream_skips_compaction_and_rejects_cow(spark, tmp_path):
    register_icelite_source(spark)
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "a", None)]),
                  batch_key="b0", mode="mor")
    ck = str(tmp_path / "ck")
    assert len(_drain(spark, str(tmp_path / "t"), ck)) == 1
    t.compact()
    # compaction commit is a rewrite, not a change: nothing new arrives
    assert _drain(spark, str(tmp_path / "t"), ck) == []

    # a copy-on-write commit breaks per-file change semantics: fail fast
    apply_changes(t, _batch(spark, [(9, "U", "c1", 0, "user", "rewrite", None)]),
                  batch_key="b1", mode="cow")
    with pytest.raises(Exception, match="copy-on-write"):
        _drain(spark, str(tmp_path / "t"), ck)


def test_stream_resolves_renamed_columns_by_field_id(spark, tmp_path):
    """Files written before a rename must surface under the NEW name —
    the Python reader applies the same manifest id→name stamps as the
    JVM reader."""
    register_icelite_source(spark)
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "old-file", None)]),
                  batch_key="b0", mode="mor")
    t.rename_column("text", "body")
    apply_changes(
        t,
        _batch(spark, [(2, "I", "c2", 0, "user", "new-file", None)])
        .withColumnRenamed("text", "body"),
        batch_key="b1", mode="mor",
    )
    df = spark.read.format("icelite").option("path", str(tmp_path / "t")).load()
    got = {r["conv_id"]: r["body"] for r in df.collect()}
    assert got == {"c1": "old-file", "c2": "new-file"}


def test_chained_pipelines_lake_as_source_and_sink(spark, tmp_path):
    """The composition the source exists for: pipeline 1 ingests the WAL
    into table A; pipeline 2 tails A AS A STREAM and maintains a rollup
    table B (turn counts per conversation) — a materialized view over
    the lake, exactly-once on both hops, no re-scan of A."""
    from etl_rust_spark.changelog import (
        ChangelogConfig,
        generate_changelog_pandas,
        replay_oracle_pandas,
        write_wal_segments,
    )
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.streaming.driver import ChangelogIngest
    import pyspark.sql.types as T

    register_icelite_source(spark)
    log = generate_changelog_pandas(
        ChangelogConfig(n_events=600, n_conversations=12, turns_per_conv=10, seed=7)
    )
    wal = str(tmp_path / "wal")
    write_wal_segments(log, wal, 3, spark)
    create_transcript_table(spark, str(tmp_path / "a"), n_buckets=4)
    ChangelogIngest(
        spark=spark, wal_dir=wal, table_path=str(tmp_path / "a"),
        checkpoint_dir=str(tmp_path / "ck_a"), schema=CHANGELOG_SCHEMA,
        name="hop1", mode="mor",
    ).run_available()

    b = IceliteTable.create(
        spark, str(tmp_path / "b"),
        T.StructType()
        .add("conv_id", T.StringType())
        .add("n_changes", T.LongType())
        .add("max_lsn", T.LongType()),
        key_cols=["conv_id"], bucket_key="conv_id", n_buckets=4,
        order_cols=["conv_id"], seq_col="max_lsn",
    )

    def upsert_rollup(df, epoch_id):
        roll = df.groupBy("conv_id").agg(
            F.count("*").alias("n_changes"), F.max("__lsn").alias("max_lsn")
        )
        b.merge(
            roll.withColumn("op", F.lit("U")),
            batch_key=f"hop2:{epoch_id}", source="rollup", seq_col="max_lsn",
        )

    q = (
        spark.readStream.format("icelite")
        .option("path", str(tmp_path / "a"))
        .load()
        .writeStream.foreachBatch(upsert_rollup)
        .option("checkpointLocation", str(tmp_path / "ck_b"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    want = replay_oracle_pandas(log).groupby("conv_id").size().to_dict()
    got_rows = {r["conv_id"]: r for r in b.read().collect()}
    # change-feed rows include superseded versions and tombstones; the
    # rollup's max_lsn must match the feed's per-conv max exactly
    feed = IceliteTable.load(spark, str(tmp_path / "a")).read_changes(0)
    want_lsn = {
        r["conv_id"]: r["m"]
        for r in feed.groupBy("conv_id").agg(F.max("__lsn").alias("m")).collect()
    }
    assert set(got_rows) >= set(want)
    assert {c: r["max_lsn"] for c, r in got_rows.items()} == want_lsn


def test_source_survives_snapshot_expiry(spark, tmp_path):
    """Expired snapshots delete old POINTERS but lineage is append-only:
    the source must resolve commits whose pointers are gone (glob
    fallbacks, like the JVM reader) and fail with the same clear
    'expired' contract when the data itself was folded away."""
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    register_icelite_source(spark)
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "a", None)]),
                  batch_key="b0", mode="mor")
    apply_changes(t, _batch(spark, [(2, "I", "c2", 0, "user", "b", None)]),
                  batch_key="b1", mode="mor")
    t.expire_snapshots(keep_last=1)
    # pointers for seq 1 are gone, but manifests/lineage resolve by glob:
    # the full-range read still returns both commits' rows
    df = spark.read.format("icelite").option("path", str(tmp_path / "t")).load()
    assert {r["conv_id"] for r in df.collect()} == {"c1", "c2"}

    t.compact()
    t.expire_snapshots(keep_last=1)
    t.remove_orphans(grace_sec=0.0)
    # now the pre-compaction deltas are truly gone: same contract as
    # read_changes — a consumer resuming from before the fold fails fast
    with pytest.raises(Exception, match="expired"):
        spark.read.format("icelite").option(
            "path", str(tmp_path / "t")
        ).load().collect()
    # resuming at the fold point is clean (nothing after it yet)
    ok = spark.read.format("icelite").option(
        "path", str(tmp_path / "t")
    ).option("sinceSeq", str(t.current_seq())).load()
    assert ok.count() == 0


def test_mid_stream_schema_evolution_keeps_declared_shape(spark, tmp_path):
    """A commit that ADDS a column while a query is RUNNING must not
    change the stream's shape mid-flight — Spark pins the analyzed
    schema at query start, so the reader must keep emitting the declared
    columns (new ones are simply not selected until a restart, which
    re-infers). Without the declared-schema threading this crashed the
    micro-batch with an arrow/schema mismatch."""
    import time

    register_icelite_source(spark)
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "plain", None)]),
                  batch_key="b0", mode="mor")
    rows = []
    q = (
        spark.readStream.format("icelite")
        .option("path", str(tmp_path / "t"))
        .load()
        .writeStream.foreachBatch(lambda df, _e: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        # generous deadlines: under a loaded box (parallel suites) the
        # 1-second trigger can crawl — timing out here would misreport a
        # host-contention stall as an engine bug
        deadline = time.monotonic() + 180
        while not rows and time.monotonic() < deadline:
            time.sleep(0.5)
        assert rows and "lang" not in rows[0].asDict()

        # schema evolves WHILE the query runs
        wide = _batch(
            spark, [(2, "I", "c2", 0, "user", "tagged", None)]
        ).withColumn("lang", F.lit("en"))
        apply_changes(t, wide, batch_key="b1", mode="mor")
        deadline = time.monotonic() + 180
        while len(rows) < 2 and time.monotonic() < deadline:
            time.sleep(0.5)
        assert q.exception() is None  # the evolved commit didn't kill it
        assert len(rows) == 2
        c2 = next(r for r in rows if r["conv_id"] == "c2")
        assert "lang" not in c2.asDict()  # declared shape preserved
    finally:
        q.stop()

    # a restart (same checkpoint, fresh query) re-infers and sees lang
    nxt = _drain(spark, str(tmp_path / "t"), str(tmp_path / "ck"))
    assert nxt == []  # nothing new — exactly-once held across the stop
    fresh = _drain(spark, str(tmp_path / "t"), str(tmp_path / "ck2"))
    got = {r["conv_id"]: r.asDict().get("lang") for r in fresh}
    assert got == {"c1": None, "c2": "en"}


def test_source_differential_vs_jvm_across_interleavings(spark, tmp_path):
    """Differential check: after EVERY step of a mixed workload (append
    batches, an update, a compaction), the source's batch reader over the
    full range returns exactly the JVM read_changes rows — same rows,
    same _commit_seq stamps."""
    register_icelite_source(spark)
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)

    def diff_check():
        cols = ["conv_id", "turn_idx", "__lsn", "text", "_commit_seq"]
        src = spark.read.format("icelite").option(
            "path", str(tmp_path / "t")
        ).load().select(*cols)
        jvm = t.read_changes(since_seq=0).select(*cols)
        assert _key_rows(src) == _key_rows(jvm)

    steps = [
        ("append", [(1, "I", "a", 0, "user", "one", None),
                    (2, "I", "b", 0, "user", "two", None)]),
        ("append", [(3, "I", "c", 0, "user", "three", None)]),
        ("update", [(4, "U", "a", 0, "user", "one-v2", None)]),
        ("compact", None),
        ("append", [(5, "I", "d", 0, "user", "four", None)]),
        ("delete", [(6, "D", "b", 0, "user", "", None)]),
        ("compact", None),
        ("append", [(7, "I", "e", 0, "user", "five", None)]),
    ]
    for i, (kind, rows) in enumerate(steps):
        if kind == "compact":
            t.compact()
        else:
            apply_changes(t, _batch(spark, rows), batch_key=f"s{i}", mode="mor")
        diff_check()


def test_live_tail_consumes_writer_commits_exactly_once(spark, tmp_path):
    """Liveness under concurrency: a CONTINUOUS tail query runs while a
    writer lands commits one by one; every committed row arrives exactly
    once, in commit order per key, without stopping the stream."""
    import time

    register_icelite_source(spark)
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [(0, "I", "seed", 0, "user", "s", None)]),
                  batch_key="seed", mode="mor")
    rows = []
    q = (
        spark.readStream.format("icelite")
        .option("path", str(tmp_path / "t"))
        .load()
        .writeStream.foreachBatch(lambda df, _e: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        n_commits = 5
        for b in range(n_commits):
            apply_changes(
                t,
                _batch(spark, [(10 + b, "I", f"c{b}", 0, "user", f"live {b}", None)]),
                batch_key=f"b{b}",
                mode="mor",
            )
            time.sleep(0.4)
        deadline = time.monotonic() + 180  # loaded-box tolerance
        while len(rows) < 1 + n_commits and time.monotonic() < deadline:
            time.sleep(0.5)
        assert q.exception() is None
    finally:
        q.stop()
    got = [(r["conv_id"], r["_commit_seq"]) for r in rows]
    assert len(got) == len(set(got)) == 1 + n_commits  # exactly once
    seqs = {c: s for c, s in got}
    assert all(seqs[f"c{b}"] < seqs[f"c{b + 1}"] for b in range(n_commits - 1))


def test_max_commits_per_batch_bounds_catchup(spark, tmp_path):
    """B1/B2 backpressure analog (reference: bounded enqueue +
    size-triggered flush, src/bucket/bucket.rs:93-100,198-206): a
    consumer starting N commits behind with maxCommitsPerBatch=k drains
    the backlog in ceil(N/k) micro-batches — each spanning at most k
    commits — exactly once, in commit order."""
    import time

    register_icelite_source(spark)
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    n_commits = 6
    for b in range(n_commits):
        apply_changes(
            t,
            _batch(spark, [(b + 1, "I", f"c{b}", 0, "user", f"v{b}", None)]),
            batch_key=f"b{b}",
            mode="mor",
        )
    batches = []
    q = (
        spark.readStream.format("icelite")
        .option("path", str(tmp_path / "t"))
        .option("maxCommitsPerBatch", "2")
        .load()
        .writeStream.foreachBatch(
            lambda df, eid: batches.append((eid, df.collect()))
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 180  # loaded-box tolerance
        while (
            sum(len(r) for _, r in batches) < n_commits
            and time.monotonic() < deadline
        ):
            time.sleep(0.3)
        assert q.exception() is None
    finally:
        q.stop()
    nonempty = [rows for _, rows in batches if rows]
    assert len(nonempty) == 3  # ceil(6/2): the backlog drains bounded
    seq_ranges = []
    for rows in nonempty:
        seqs = {r["_commit_seq"] for r in rows}
        assert len(seqs) <= 2  # never more than k commits per batch
        seq_ranges.append((min(seqs), max(seqs)))
    # batches advance monotonically through the commit log
    assert all(
        seq_ranges[i][1] < seq_ranges[i + 1][0]
        for i in range(len(seq_ranges) - 1)
    )
    got = _key_rows([r for rows in nonempty for r in rows])
    want = _key_rows(
        t.read_changes(0).select(
            "conv_id", "turn_idx", "__lsn", "text", "_commit_seq"
        )
    )
    assert got == want and len(got) == n_commits  # exactly once


def test_mid_stream_rename_fails_fast_then_restart_recovers(spark, tmp_path):
    """ADVICE r04: a rename landing mid-stream must FAIL the stream —
    the declared column no longer resolves at the current pointer — not
    silently null-backfill every file while the JVM read_changes returns
    real data under the new name. A restart from the SAME checkpoint
    re-infers the renamed schema and delivers the outstanding commits
    exactly once under the new name."""
    import time

    register_icelite_source(spark)
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(
        t,
        _batch(spark, [(1, "I", "c1", 0, "user", "before", None)]),
        batch_key="b0",
        mode="mor",
    )
    rows = []
    q = (
        spark.readStream.format("icelite")
        .option("path", str(tmp_path / "t"))
        .load()
        .writeStream.foreachBatch(lambda df, _e: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 180
        while not rows and time.monotonic() < deadline:
            time.sleep(0.5)
        assert rows and rows[0]["text"] == "before"

        # rename + new data WHILE the query runs → the stream must die
        # with the restart instruction, not deliver all-NULL columns
        t.rename_column("text", "body")
        apply_changes(
            t,
            _batch(spark, [(2, "I", "c2", 0, "user", "after", None)])
            .withColumnRenamed("text", "body"),
            batch_key="b1",
            mode="mor",
        )
        deadline = time.monotonic() + 180
        while q.exception() is None and time.monotonic() < deadline:
            time.sleep(0.5)
        exc = q.exception()
        assert exc is not None and "renamed or dropped" in str(exc)
    finally:
        q.stop()

    # restart on the SAME checkpoint: re-infers the schema and delivers
    # the outstanding commit under the new name; c1 is not redelivered
    # (exactly-once held). Two drains: the availableNow single-batch
    # fallback spends its batch on the WAL-recovered in-flight range.
    fresh = _drain(spark, str(tmp_path / "t"), str(tmp_path / "ck"))
    fresh += _drain(spark, str(tmp_path / "t"), str(tmp_path / "ck"))
    got = {r["conv_id"]: r["body"] for r in fresh}
    assert got == {"c2": "after"} and len(fresh) == 1


def test_sharded_consumers_partition_the_feed(spark, tmp_path):
    """Parallel downstream consumption: k consumers each reading
    option("shard", "i/k") must partition the change feed DISJOINTLY and
    COMPLETELY (every row delivered by exactly one shard), with the
    pruning happening at the manifest level — a shard never opens the
    files it skips. The consumer-side analog of the reference's
    multi-pipeline manager (src/etl/manager.rs:76-102): N downstream
    pipelines without N full feed scans."""
    import pytest as _pytest

    from etl_rust_spark.sources.icelite_source import _TableMeta

    register_icelite_source(spark)
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    for b in range(3):
        apply_changes(
            t,
            _batch(spark, [
                (b * 10 + i, "I", f"c{b}-{i}", 0, "user", f"v{b}-{i}", None)
                for i in range(6)
            ]),
            batch_key=f"b{b}",
            mode="mor",
        )
    cols = ["conv_id", "turn_idx", "__lsn", "text", "_commit_seq"]

    def shard_rows(spec):
        df = (
            spark.read.format("icelite")
            .option("path", str(tmp_path / "t"))
            .option("shard", spec)
            .load()
        )
        return _key_rows(df.select(*cols))

    full = _key_rows(t.read_changes(0).select(*cols))
    s0, s1 = shard_rows("0/2"), shard_rows("1/2")
    assert s0 and s1            # both shards carry data (4 buckets, k=2)
    assert s0 | s1 == full      # complete
    assert not (s0 & s1)        # disjoint

    # pruning is metadata-level: each shard plans strictly fewer FILES
    meta = _TableMeta(str(tmp_path / "t"))
    seq = t.current_seq()
    n_all = len(meta.change_files(0, seq))
    n0 = len(meta.change_files(0, seq, (0, 2)))
    n1 = len(meta.change_files(0, seq, (1, 2)))
    assert n0 + n1 == n_all and 0 < n0 < n_all and 0 < n1 < n_all

    # a sharded STREAM drains only its shard and resumes exactly-once
    got = []
    for _ in range(2):
        q = (
            spark.readStream.format("icelite")
            .option("path", str(tmp_path / "t"))
            .option("shard", "0/2")
            .load()
            .writeStream.foreachBatch(lambda df, _e: got.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ck0"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    assert _key_rows(got) == s0  # shard content, once (second drain empty)

    with _pytest.raises(Exception, match="shard"):
        shard_rows("3/2")


def test_columns_projection_batch_and_stream(spark, tmp_path):
    """.option("columns", ...) projects the feed: only the named columns
    (+ _commit_seq) come back, values exactly matching the full feed's
    projection — batch and stream — and the Arrow reader decodes only
    those parquet columns."""
    register_icelite_source(spark)
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    apply_changes(t, _batch(spark, [
        (1, "I", "a", 0, "user", "t1", None), (2, "I", "b", 1, "user", "t2", None),
    ]), batch_key="b0", mode="mor")
    apply_changes(t, _batch(spark, [(3, "U", "a", 0, "user", "t3", None)]),
                  batch_key="b1", mode="mor")

    proj = (spark.read.format("icelite").option("path", str(tmp_path / "t"))
            .option("columns", "conv_id,turn_idx,__lsn").load())
    assert proj.columns == ["conv_id", "turn_idx", "__lsn", "_commit_seq"]
    full = spark.read.format("icelite").option("path", str(tmp_path / "t")).load()
    want = {(r["conv_id"], r["turn_idx"], r["__lsn"], r["_commit_seq"])
            for r in full.collect()}
    got = {(r["conv_id"], r["turn_idx"], r["__lsn"], r["_commit_seq"])
           for r in proj.collect()}
    assert got == want and len(got) == 3

    # stream twin
    rows = []
    q = (spark.readStream.format("icelite").option("path", str(tmp_path / "t"))
         .option("columns", "conv_id,__lsn").load()
         .writeStream.foreachBatch(lambda df, _e: rows.extend(df.collect()))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert {tuple(r) for r in rows} == {
        ("a", 1, 1), ("b", 2, 1), ("a", 3, 2)}


def test_columns_projection_unknown_column_raises(spark, tmp_path):
    register_icelite_source(spark)
    create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    with pytest.raises(Exception, match="columns option names"):
        (spark.read.format("icelite").option("path", str(tmp_path / "t"))
         .option("columns", "conv_id,nope").load().collect())


def test_columns_projection_resolves_renames_by_field_id(spark, tmp_path):
    """A projected column that was RENAMED after old files were written
    still reads the old files' bytes (field-id resolution is independent
    of projection)."""
    register_icelite_source(spark)
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    apply_changes(t, _batch(spark, [(1, "I", "a", 0, "user", "old-text", None)]),
                  batch_key="b0", mode="mor")
    t.rename_column("text", "body")
    proj = (spark.read.format("icelite").option("path", str(tmp_path / "t"))
            .option("columns", "conv_id,body").load())
    assert [r["body"] for r in proj.collect()] == ["old-text"]


def test_bounded_catchup_across_rename_resolves_by_field_id(spark, tmp_path):
    """A consumer resuming BEHIND a rename must deliver the pre-rename
    backlog with REAL values under the new name, never silent nulls:
    with maxCommitsPerBatch=1 the catch-up batch ENDS at a pre-rename
    pointer while the re-inferred declared schema carries the new name —
    the merged-pointer guard lets it through and per-file field-id
    resolution maps the old physical column. (The old end-pointer-only
    guard false-positived here, wedging a pure catch-up; a LIVE stream
    with a stale declared schema still fails fast — covered above.)"""
    register_icelite_source(spark)
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "v1", None)]),
                  batch_key="b1", mode="mor")
    drained = _drain(spark, str(tmp_path / "t"), str(tmp_path / "ck"))
    assert len(drained) == 1
    # backlog commit 2 under the OLD name, then rename, then commit 4
    apply_changes(t, _batch(spark, [(2, "I", "c2", 0, "user", "v2", None)]),
                  batch_key="b2", mode="mor")
    t.rename_column("text", "body")
    late = _batch(spark, [(3, "I", "c3", 0, "user", "v3", None)]) \
        .withColumnRenamed("text", "body")
    apply_changes(t, late, batch_key="b3", mode="mor")

    rows = []
    for _ in range(6):
        reader = (spark.readStream.format("icelite")
                  .option("path", str(tmp_path / "t"))
                  .option("maxCommitsPerBatch", "1"))
        q = (reader.load().writeStream
             .foreachBatch(lambda df, _eid: rows.extend(df.collect()))
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        if {r["conv_id"] for r in rows} >= {"c2", "c3"}:
            break
    got = {r["conv_id"]: r["body"] for r in rows}
    # the pre-rename backlog row carries its REAL value under body
    assert got == {"c2": "v2", "c3": "v3"}


def test_since_timestamp_resolves_via_commit_clock(spark, tmp_path):
    """sinceTimestamp (Kafka startingOffsetsByTimestamp analog): the
    consumer starts AFTER the latest snapshot committed at or before the
    given wall-clock instant — batch and stream agree with the seq-based
    read at the resolved boundary; a pre-retention timestamp fails loud;
    passing both selectors is rejected."""
    import time as _time

    register_icelite_source(spark)
    tpath = str(tmp_path / "t")
    t = create_transcript_table(spark, tpath, n_buckets=2)
    apply_changes(t, _batch(spark, [(1, "I", "c0", 0, "u", "a", None)]),
                  batch_key="b1", mode="mor")
    _time.sleep(0.3)
    t_mid = _time.time()
    _time.sleep(0.3)
    apply_changes(t, _batch(spark, [(2, "I", "c1", 0, "u", "b", None)]),
                  batch_key="b2", mode="mor")
    apply_changes(t, _batch(spark, [(3, "I", "c2", 0, "u", "c", None)]),
                  batch_key="b3", mode="mor")

    base = spark.read.format("icelite").option("path", tpath)
    got = base.option("sinceTimestamp", str(t_mid)).load()
    assert {r["conv_id"] for r in got.collect()} == {"c1", "c2"}
    # untilTimestamp bounds the other end of the batch range
    bounded = (
        base.option("sinceTimestamp", "0")
        .option("untilTimestamp", str(t_mid)).load()
    )
    assert {r["conv_id"] for r in bounded.collect()} == {"c0"}

    # the STREAM resolves the same start and resumes exactly-once
    rows = []
    q = (
        spark.readStream.format("icelite").option("path", tpath)
        .option("sinceTimestamp", str(t_mid)).load()
        .writeStream.foreachBatch(lambda df, _e: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert {r["conv_id"] for r in rows} == {"c1", "c2"}

    # once expiry removes the early history, a timestamp older than the
    # oldest retained snapshot cannot prove completeness — fail loud
    t.expire_snapshots(keep_last=1)
    with pytest.raises(Exception, match="retention window"):
        base.option("sinceTimestamp", "1.0").load().collect()
    with pytest.raises(Exception, match="not both"):
        (
            base.option("sinceTimestamp", str(t_mid))
            .option("sinceSeq", "0").load().collect()
        )
