"""The native exactly-once streaming SINK: ``writeStream.format("icelite")``.

Completes the source/sink pair — a table→table CDC replication chain
(``readStream.format("icelite") → writeStream.format("icelite")``) with
no foreachBatch and no shuffle. Reference analog: the load half of the
reference pipeline (/root/reference/src/bucket/bucket.rs:93-206 batched
insert + flush), here an ACID merge-on-read lake commit with the same
applied-batch ledger idempotence as ``apply_changes``.

Covers: the bit-exact Python XXH64 bucket hash, replication equality
(incl. tombstones), checkpoint-restart exactly-once, cross-task winner
resolution (one winner per key per commit), and the fail-loud schema
contract.
"""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rust_spark.changelog import CHANGELOG_SCHEMA
from etl_rust_spark.lake.format import IceliteTable
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


def _replicate(spark, src, dst, ck, timeout=120):
    """One AvailableNow pass of the A→B native replication chain."""
    q = (
        spark.readStream.format("icelite")
        .option("path", src)
        .load()
        .drop("_commit_seq")
        .writeStream.format("icelite")
        .option("path", dst)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)


def _assert_states_equal(ta, tb):
    a, b = ta.read(), tb.read()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def _assert_one_winner_per_commit(tb):
    dups = (
        tb.read_changes(0)
        .groupBy("conv_id", "turn_idx", "_commit_seq")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dups == 0


def test_python_xxh64_matches_spark(spark):
    """The sink's bucket assignment must be bit-identical to the JVM
    layout hash or pruning corrupts silently."""
    from etl_rust_spark.functions.xxh64 import xxh64_bytes, xxh64_ints, xxh64_longs

    def signed(h):
        h = int(h)
        return h - (1 << 64) if h >= 1 << 63 else h

    rng = np.random.default_rng(3)
    longs = np.concatenate(
        [
            rng.integers(-(2**63), 2**63 - 1, 100, dtype=np.int64),
            np.array([0, 1, -1, 2**63 - 1, -(2**63), 42], dtype=np.int64),
        ]
    )
    df = spark.createDataFrame(
        [(int(v),) for v in longs], T.StructType([T.StructField("v", T.LongType())])
    )
    assert [r[0] for r in df.select(F.xxhash64("v")).collect()] == [
        signed(h) for h in xxh64_longs(longs)
    ]

    ints = np.array([0, 1, -1, 2**31 - 1, -(2**31), 7, -12345], dtype=np.int32)
    df = spark.createDataFrame(
        [(int(v),) for v in ints], T.StructType([T.StructField("v", T.IntegerType())])
    )
    assert [r[0] for r in df.select(F.xxhash64("v")).collect()] == [
        signed(h) for h in xxh64_ints(ints)
    ]

    strs = ["", "a", "conv-000123", "x" * 31, "y" * 32, "z" * 100, "héllo-wörld", "日本語"]
    df = spark.createDataFrame(
        [(s,) for s in strs], T.StructType([T.StructField("v", T.StringType())])
    )
    assert [r[0] for r in df.select(F.xxhash64("v")).collect()] == [
        signed(xxh64_bytes(s.encode("utf-8"))) for s in strs
    ]


def test_sink_replicates_table_exactly(spark, tmp_path):
    """A → B through the native chain: equal final state (incl.
    tombstones), one winner per key per commit, stream-sink lineage."""
    register_icelite_source(spark)
    A, B, ck = str(tmp_path / "A"), str(tmp_path / "B"), str(tmp_path / "ck")
    ta = create_transcript_table(spark, A, n_buckets=4)
    apply_changes(ta, _batch(spark, [
        (1, "I", "c1", 0, "user", "a", None),
        (2, "I", "c2", 0, "user", "b", None),
        (3, "I", "c3", 0, "user", "c", None),
    ]), batch_key="b0", mode="mor")
    apply_changes(ta, _batch(spark, [
        (4, "U", "c1", 0, "user", "a2", None),
        (5, "D", "c2", 0, "user", "", None),
    ]), batch_key="b1", mode="mor")
    tb = create_transcript_table(spark, B, n_buckets=4)

    _replicate(spark, A, B, ck)
    tb = IceliteTable(spark, B)
    _assert_states_equal(ta, tb)
    # the tombstone arrived as a tombstone, not a dropped row
    assert tb.read().filter("__deleted").count() == 1
    _assert_one_winner_per_commit(tb)
    recs = tb.lineage().filter("source = 'stream-sink'").collect()
    assert recs and sum(r["n_deletes"] for r in recs) == 1


def test_sink_exactly_once_across_restarts(spark, tmp_path):
    """Same checkpoint, three passes: replays commit nothing, new source
    commits flow through, ledger holds exactly one entry per batch."""
    register_icelite_source(spark)
    A, B, ck = str(tmp_path / "A"), str(tmp_path / "B"), str(tmp_path / "ck")
    ta = create_transcript_table(spark, A, n_buckets=4)
    apply_changes(ta, _batch(spark, [
        (1, "I", "c1", 0, "user", "a", None),
    ]), batch_key="b0", mode="mor")
    tb = create_transcript_table(spark, B, n_buckets=4)

    _replicate(spark, A, B, ck)
    seq_after_first = IceliteTable(spark, B).current_seq()
    # replay with nothing new: no state change, no duplicate application
    _replicate(spark, A, B, ck)
    tb = IceliteTable(spark, B)
    _assert_states_equal(ta, tb)

    apply_changes(ta, _batch(spark, [
        (2, "U", "c1", 0, "user", "a2", None),
        (3, "I", "c2", 0, "user", "b", None),
    ]), batch_key="b1", mode="mor")
    # AvailableNow on the python source is single-batch per run — drain
    # twice so a recovered in-flight range cannot mask the new commit
    _replicate(spark, A, B, ck)
    _replicate(spark, A, B, ck)
    tb = IceliteTable(spark, B)
    _assert_states_equal(ta, tb)
    _assert_one_winner_per_commit(tb)
    # every sink batch entered the ledger exactly once
    keys = [k for k in tb.applied_batches() if k.startswith("dsw-")]
    assert len(keys) == len(set(keys))
    assert tb.current_seq() > seq_after_first


def test_sink_resolves_cross_task_collisions(spark, tmp_path):
    """The same key updated in MULTIPLE upstream partitions of one
    micro-batch: the commit must land one max-seq winner per key (the
    feed/preimage invariant), resolved at commit time from the thin
    key+seq projection."""
    register_icelite_source(spark)
    B, ck = str(tmp_path / "B"), str(tmp_path / "ck")
    src = str(tmp_path / "src")
    tb = create_transcript_table(spark, B, n_buckets=4)
    schema = T.StructType.fromJson(tb.pointer()["schema"])

    # two parquet files, BOTH containing key (c1, 0) — the file stream
    # reads them as separate partitions, so task-local dedup cannot see
    # the collision
    rows1 = [("c1", 0, "user", "v1", "", None, 10, False),
             ("c2", 0, "user", "w1", "", None, 11, False)]
    rows2 = [("c1", 0, "user", "v2", "", None, 20, False),
             ("c3", 0, "user", "x1", "", None, 12, False)]
    for i, rows in enumerate((rows1, rows2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"f{i}"))

    q = (
        spark.readStream.schema(schema)
        .parquet(src + "/*")
        .writeStream.format("icelite")
        .option("path", B)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    tb = IceliteTable(spark, B)
    _assert_one_winner_per_commit(tb)
    state = {(r["conv_id"], r["turn_idx"]): (r["text"], r["__lsn"])
             for r in tb.read().collect()}
    assert state[("c1", 0)] == ("v2", 20)  # max-seq winner survived
    assert state[("c2", 0)] == ("w1", 11) and state[("c3", 0)] == ("x1", 12)
    # the losing row is gone from the FEED too, not just the state
    feed = tb.read_changes(0).filter("conv_id = 'c1'").collect()
    assert len(feed) == 1 and feed[0]["text"] == "v2"


def test_sink_rejects_wrong_schema_and_overwrite(spark, tmp_path):
    from etl_rust_spark.sources.icelite_sink import IceliteStreamWriter

    B = str(tmp_path / "B")
    tb = create_transcript_table(spark, B, n_buckets=4)
    schema = T.StructType.fromJson(tb.pointer()["schema"])
    opts = {"path": B, "checkpointlocation": str(tmp_path / "ck")}

    missing = T.StructType(schema.fields[:-1])
    with pytest.raises(ValueError, match="match the table schema"):
        IceliteStreamWriter(opts, missing)

    extra = T.StructType(
        list(schema.fields) + [T.StructField("surprise", T.LongType())]
    )
    with pytest.raises(ValueError, match="match the table schema"):
        IceliteStreamWriter(opts, extra)

    wrong_type = T.StructType(
        [
            f if f.name != "__lsn" else T.StructField("__lsn", T.IntegerType())
            for f in schema.fields
        ]
    )
    with pytest.raises(ValueError, match="types must match"):
        IceliteStreamWriter(opts, wrong_type)

    with pytest.raises(ValueError, match="append-only"):
        IceliteStreamWriter(opts, schema, overwrite=True)

    # a table without seq_col cannot take merge-on-read appends
    nk = str(tmp_path / "nk")
    IceliteTable.create(
        spark, nk,
        T.StructType([T.StructField("conv_id", T.StringType()),
                      T.StructField("turn_idx", T.IntegerType())]),
        key_cols=("conv_id", "turn_idx"), bucket_key="conv_id", n_buckets=2,
    )
    with pytest.raises(ValueError, match="seq_col"):
        IceliteStreamWriter(
            {"path": nk, "checkpointlocation": str(tmp_path / "ck2")},
            T.StructType([T.StructField("conv_id", T.StringType()),
                          T.StructField("turn_idx", T.IntegerType())]),
        )


def test_sink_task_retry_debris_is_not_committed(spark, tmp_path):
    """Files in staging that no successful task reported (crashed or
    speculative attempts) must never enter a commit — and must be swept
    by the next commit."""
    register_icelite_source(spark)
    A, B, ck = str(tmp_path / "A"), str(tmp_path / "B"), str(tmp_path / "ck")
    ta = create_transcript_table(spark, A, n_buckets=4)
    apply_changes(ta, _batch(spark, [
        (1, "I", "c1", 0, "user", "a", None),
    ]), batch_key="b0", mode="mor")
    tb = create_transcript_table(spark, B, n_buckets=4)

    # plant debris: a valid-looking parquet in the staging dir the sink
    # will use (sinkId fixed so the path is predictable)
    staging = os.path.join(B, "_dsw_staging", "t1")
    os.makedirs(staging, exist_ok=True)
    schema = T.StructType.fromJson(tb.pointer()["schema"])
    spark.createDataFrame(
        [("zz", 9, "user", "GHOST", "", None, 99, False)], schema
    ).toPandas().to_parquet(os.path.join(staging, "part-debris-b00001.parquet"))

    q = (
        spark.readStream.format("icelite").option("path", A).load()
        .drop("_commit_seq")
        .writeStream.format("icelite").option("path", B)
        .option("sinkId", "t1")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    tb = IceliteTable(spark, B)
    assert tb.read().filter("conv_id = 'zz'").count() == 0
    _assert_states_equal(ta, tb)
    assert os.listdir(staging) == []  # debris swept at commit


def test_two_concurrent_sinks_rebase_commits(spark, tmp_path):
    """Two sink queries (distinct sinkIds) land batches into ONE table:
    append-only commits always commute, so racing commits rebase through
    the optimistic loop — no lost batch, disjoint keys all present,
    contiguous lineage."""
    register_icelite_source(spark)
    A1, A2, B = str(tmp_path / "A1"), str(tmp_path / "A2"), str(tmp_path / "B")
    t1 = create_transcript_table(spark, A1, n_buckets=4)
    t2 = create_transcript_table(spark, A2, n_buckets=4)
    apply_changes(t1, _batch(spark, [
        (1, "I", "x1", 0, "user", "from-A1", None),
        (2, "I", "x2", 0, "user", "from-A1", None),
    ]), batch_key="a1", mode="mor")
    apply_changes(t2, _batch(spark, [
        (3, "I", "y1", 0, "user", "from-A2", None),
        (4, "I", "y2", 0, "user", "from-A2", None),
    ]), batch_key="a2", mode="mor")
    tb = create_transcript_table(spark, B, n_buckets=4)

    qs = []
    for src, sid in ((A1, "s1"), (A2, "s2")):
        qs.append(
            spark.readStream.format("icelite").option("path", src).load()
            .drop("_commit_seq")
            .writeStream.format("icelite").option("path", B)
            .option("sinkId", sid)
            .option("checkpointLocation", str(tmp_path / f"ck-{sid}"))
            .trigger(availableNow=True)
            .start()
        )
    for q in qs:
        q.awaitTermination(120)

    tb = IceliteTable(spark, B)
    got = {(r["conv_id"], r["text"]) for r in tb.read().collect()}
    assert got == {("x1", "from-A1"), ("x2", "from-A1"),
                   ("y1", "from-A2"), ("y2", "from-A2")}
    # both sink batches in the ledger, lineage contiguous
    keys = tb.applied_batches()
    assert sum(1 for k in keys if k.startswith("s1-")) == 1
    assert sum(1 for k in keys if k.startswith("s2-")) == 1
    seqs = [r["commit_seq"] for r in tb.lineage().orderBy("commit_seq").collect()]
    assert seqs == list(range(1, tb.current_seq() + 1))



def test_sink_survives_target_compaction_mid_stream(spark, tmp_path):
    """A maintenance compactor folding the TARGET between sink
    micro-batches must not break the replication chain: compaction
    preserves schema and bucket layout (the sink's mid-stream fail-fast
    checks), sink commits are append-only so both sides commute (the
    same-seq race itself is covered at the commit level by
    test_concurrency.py; the sink's commit runner is a separate process,
    so this test interleaves). After more batches and a second fold, the
    target stays state-equal with one winner per (key, commit), and its
    live file count is bounded by the fold instead of growing per-batch."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ta = create_transcript_table(spark, src, n_buckets=4)
    tb = create_transcript_table(spark, dst, n_buckets=4)
    register_icelite_source(spark)
    ck = str(tmp_path / "ck")

    def feed(i):
        rows = [
            (100 * i + t, "I" if i == 0 else "U", f"c{t % 3}", t, "user", f"v{i}.{t}")
            for t in range(6)
        ]
        apply_changes(ta, _batch(spark, [r + (None,) for r in rows]),
                      batch_key=f"a{i}", mode="mor")

    feed(0); feed(1)
    _replicate(spark, src, dst, ck)
    assert tb.current_seq() > 0
    tb.compact(min_files_per_bucket=0)  # fold everything landed so far

    feed(2); feed(3)
    _replicate(spark, src, dst, ck)  # sink resumes onto the compacted target
    _assert_states_equal(ta, tb)
    _assert_one_winner_per_commit(tb)

    files_before_fold = len(tb._files(tb.pointer()))
    tb.compact(min_files_per_bucket=0)
    assert len(tb._files(tb.pointer())) <= files_before_fold
    _assert_states_equal(ta, tb)
    # exactly-once held through both folds: contiguous lineage, no replays
    seqs = [r["commit_seq"] for r in tb.lineage().orderBy("commit_seq").collect()]
    assert seqs == list(range(1, tb.current_seq() + 1))
