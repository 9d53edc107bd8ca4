"""ChangeFeedTransform — the generic materialized flat-map pipeline:
target ≡ transform(source live rows) at quiescence, under fan-out,
group shrink, deletes, bounded catch-up, and restart.

The test derivation is document → word-chunks (1→N, N varies with the
text), the shape where group REPLACEMENT matters: an update that
shortens a document must delete the excess chunk rows, not leave them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.streaming.transform import ChangeFeedTransform

SRC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("lsn", T.LongType()),
])
TGT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("chunk_idx", T.IntegerType()),
    T.StructField("chunk", T.StringType()),
    T.StructField("lsn", T.LongType()),
])


def _mk_source(spark, path):
    return IceliteTable.create(
        spark, path, SRC_SCHEMA, key_cols=["doc_id"], bucket_key="doc_id",
        n_buckets=2, order_cols=["doc_id"], seq_col="lsn",
    )


def _mk_target(spark, path):
    return IceliteTable.create(
        spark, path, TGT_SCHEMA, key_cols=["doc_id", "chunk_idx"],
        bucket_key="doc_id", n_buckets=2,
        order_cols=["doc_id", "chunk_idx"], seq_col="lsn",
    )


def _chunks(df):
    """One chunk per word — N follows the text length."""
    return df.select(
        "doc_id", "lsn",
        F.posexplode(F.split("text", " ")).alias("chunk_idx", "chunk"),
    )


def _merge(spark, t, rows, key, delete=False):
    df = spark.createDataFrame(rows, SRC_SCHEMA).withColumn(
        "op", F.lit("U")
    )
    if delete:
        df = df.withColumn("__deleted", F.lit(True))
    t.merge(df, batch_key=key, seq_col="lsn", mode="mor")


def _live(table):
    df = table.read()
    if "__deleted" in df.columns:
        df = df.filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
    return df


def _expected(spark, source):
    return (
        _chunks(_live(source).select("doc_id", "text", "lsn"))
        .select("doc_id", "chunk_idx", "chunk", "lsn")
        .toPandas().sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )


def _state(target):
    return (
        _live(target).select("doc_id", "chunk_idx", "chunk", "lsn")
        .toPandas().sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )


def _pipe(spark, tmp_path, **kw):
    return ChangeFeedTransform(
        spark=spark, source_path=str(tmp_path / "src"),
        table_path=str(tmp_path / "tgt"),
        checkpoint_dir=str(tmp_path / "ck"),
        transform=_chunks, **kw,
    )


def test_transform_materializes_fanout_shrink_and_delete(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    _mk_target(spark, str(tmp_path / "tgt"))
    _merge(spark, src, [("d1", "alpha beta gamma", 1),
                        ("d2", "one two", 1)], "b1")
    pipe = _pipe(spark, tmp_path)
    pipe.run_available()
    tgt = IceliteTable.load(spark, str(tmp_path / "tgt"))
    assert _state(tgt).equals(_expected(spark, src))
    assert len(_state(tgt)) == 5

    # shrink: d1 now derives 1 chunk — the 2 excess rows must tombstone
    _merge(spark, src, [("d1", "solo", 2)], "b2")
    pipe.run_available()
    got = _state(tgt)
    assert got.equals(_expected(spark, src))
    assert list(got[got.doc_id == "d1"]["chunk"]) == ["solo"]

    # source delete: the whole derived group goes
    _merge(spark, src, [("d2", None, 3)], "b3", delete=True)
    pipe.run_available()
    got = _state(tgt)
    assert got.equals(_expected(spark, src))
    assert set(got.doc_id) == {"d1"}

    # nothing new: metadata no-op on the same checkpoint
    seq = tgt.current_seq()
    pipe.run_available()
    assert tgt.current_seq() == seq


def test_transform_bounded_catchup_equals_unbounded(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    _mk_target(spark, str(tmp_path / "tgt"))
    # several commits, incl. out-of-order (late) versions of one key
    _merge(spark, src, [("d1", "a b c", 5)], "b1")
    _merge(spark, src, [("d1", "stale version", 2),
                        ("d2", "x y", 7)], "b2")  # d1 loses by lsn
    _merge(spark, src, [("d3", "p q r s", 9)], "b3")
    pipe = _pipe(spark, tmp_path, max_commits_per_batch=1)
    pipe.run_available()
    tgt = IceliteTable.load(spark, str(tmp_path / "tgt"))
    got = _state(tgt)
    assert got.equals(_expected(spark, src))
    # the late d1 delivery lost: its chunks are the lsn=5 derivation
    assert set(got[got.doc_id == "d1"]["chunk"]) == {"a", "b", "c"}


def test_transform_validations_fail_fast(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    _merge(spark, src, [("d1", "a", 1)], "b1")

    # target missing the source key in its key_cols
    bad1 = IceliteTable.create(
        spark, str(tmp_path / "bad1"), TGT_SCHEMA, key_cols=["chunk_idx"],
        bucket_key="chunk_idx", n_buckets=2, order_cols=["chunk_idx"],
        seq_col="lsn",
    )
    p = ChangeFeedTransform(
        spark=spark, source_path=str(tmp_path / "src"),
        table_path=str(tmp_path / "bad1"),
        checkpoint_dir=str(tmp_path / "ck1"), transform=_chunks,
    )
    with pytest.raises(ValueError, match="source keys"):
        p.start()

    # target bucketed off a non-source-key column
    bad2 = IceliteTable.create(
        spark, str(tmp_path / "bad2"), TGT_SCHEMA,
        key_cols=["doc_id", "chunk_idx"], bucket_key="chunk_idx",
        n_buckets=2, order_cols=["doc_id", "chunk_idx"], seq_col="lsn",
    )
    p2 = ChangeFeedTransform(
        spark=spark, source_path=str(tmp_path / "src"),
        table_path=str(tmp_path / "bad2"),
        checkpoint_dir=str(tmp_path / "ck2"), transform=_chunks,
    )
    with pytest.raises(ValueError, match="bucket_key"):
        p2.start()

    # transform output missing a target column
    tgt = _mk_target(spark, str(tmp_path / "tgt"))
    p3 = ChangeFeedTransform(
        spark=spark, source_path=str(tmp_path / "src"),
        table_path=str(tmp_path / "tgt"),
        checkpoint_dir=str(tmp_path / "ck3"),
        transform=lambda df: df.select("doc_id", "lsn"),
    )
    with pytest.raises(Exception, match="missing column"):
        p3.run_available()


def test_sigkill_mid_transform_then_restart_is_exactly_once(spark, tmp_path):
    """OS-level crash recovery through the deployable CLI: a real
    `feed-transform` process is SIGKILLed while derived commits land,
    then the IDENTICAL command reruns on the same checkpoint. The replay
    must converge to target == transform(source live rows) with unique
    batch keys and one run id across the restart (the replayed in-flight
    epoch is a ledger no-op)."""
    import subprocess
    import sys
    import time as _time

    src = _mk_source(spark, str(tmp_path / "src"))
    _mk_target(spark, str(tmp_path / "tgt"))
    for i in range(8):
        _merge(spark, src,
               [(f"d{i}-{j}", " ".join(f"w{j}x{k}" for k in range(j + 1)),
                 i * 100 + j) for j in range(20)],
               f"b{i}")

    repo = str(__import__("pathlib").Path(__file__).resolve().parents[1])
    cmd = [
        sys.executable, "-m", "etl_rust_spark", "feed-transform",
        "--source", str(tmp_path / "src"), "--table", str(tmp_path / "tgt"),
        "--checkpoint", str(tmp_path / "ck"),
        "--expr", "doc_id", "--expr", "lsn",
        "--expr", "posexplode(split(text, ' ')) AS (chunk_idx, chunk)",
        "--max-commits-per-batch", "1",
    ]
    tgt = IceliteTable.load(spark, str(tmp_path / "tgt"))
    proc = subprocess.Popen(
        cmd, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE
    )
    deadline = _time.monotonic() + 300
    while _time.monotonic() < deadline:
        try:
            if tgt.current_seq() >= 2:
                break
        except Exception:
            pass
        if proc.poll() is not None:
            out, err = proc.communicate()
            raise AssertionError(
                f"transform finished before the kill: {err.decode()[-800:]}"
            )
        _time.sleep(0.05)
    proc.kill()
    proc.communicate(timeout=120)
    assert proc.returncode != 0
    killed_seq = tgt.current_seq()

    rerun = subprocess.run(cmd, cwd=repo, capture_output=True, timeout=600)
    assert rerun.returncode == 0, rerun.stderr.decode()[-1500:]
    assert tgt.current_seq() > killed_seq

    got = _state(tgt)
    assert got.equals(_expected(spark, src))
    keys = [r["batch_key"] for r in tgt.lineage().select("batch_key").collect()
            if r["batch_key"] is not None]
    assert len(keys) == len(set(keys))
    assert len({k.rsplit(":", 2)[1] for k in keys}) == 1  # one run id


def test_transform_property_random_workloads(spark, tmp_path):
    """Property sweep (seeded, deterministic): random insert/update/
    delete workloads — including shrinking texts and late lower-LSN
    deliveries — across random batch boundaries and random feed
    segmentation must always leave target == transform(source live
    rows). The invariant, not the examples, is the contract."""
    import random

    for case in range(4):
        rng = random.Random(1000 + case)
        src = _mk_source(spark, str(tmp_path / f"src{case}"))
        _mk_target(spark, str(tmp_path / f"tgt{case}"))
        docs = [f"d{i}" for i in range(6)]
        lsns = list(range(1, 25))
        rng.shuffle(lsns)  # late deliveries: commit order != lsn order
        i = 0
        batch_no = 0
        while i < len(lsns):
            take = rng.randint(1, 5)
            rows, dels = [], []
            for lsn in lsns[i:i + take]:
                d = rng.choice(docs)
                if rng.random() < 0.2:
                    dels.append((d, None, lsn))
                else:
                    n_words = rng.randint(1, 6)
                    rows.append(
                        (d, " ".join(f"w{lsn}x{k}" for k in range(n_words)),
                         lsn))
            if rows:
                _merge(spark, src, rows, f"c{case}b{batch_no}")
                batch_no += 1
            if dels:
                _merge(spark, src, dels, f"c{case}b{batch_no}", delete=True)
                batch_no += 1
            i += take
        pipe = ChangeFeedTransform(
            spark=spark, source_path=str(tmp_path / f"src{case}"),
            table_path=str(tmp_path / f"tgt{case}"),
            checkpoint_dir=str(tmp_path / f"ck{case}"), transform=_chunks,
            max_commits_per_batch=rng.choice([1, 2, None]),
            name=f"prop{case}",
        )
        pipe.run_available()
        tgt = IceliteTable.load(spark, str(tmp_path / f"tgt{case}"))
        got, want = _state(tgt), _expected(spark, src)
        assert got.equals(want), (
            f"case {case}: target != transform(live)\n{got}\n{want}"
        )
