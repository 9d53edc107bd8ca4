"""ChangeFeedScd2 — icelite change-feed tail → immutable version-row
appends → SCD2 history derived on read. Proofs: history equals a
full-feed recompute (including delete→reinsert chains), as_of(seq)
differentially equals Icelite time travel at EVERY source commit,
restart on the same checkpoint is exactly-once and incremental,
segmentation (k=1 vs unbounded) cannot change the history, and
mis-shaped sources/targets fail fast."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.operators.apply import apply_changes, create_transcript_table
from etl_rust_spark.streaming.scd2 import ChangeFeedScd2

CHANGE_DDL = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)
TS = dt.datetime(2025, 1, 1)

# (lsn, op, conv, turn, text) per source commit: inserts, an update, a
# delete, a re-insert of the deleted key, AND late out-of-order losers —
# an update (lsn 15 after 20 applied) and a delete (lsn 18 after 23)
# that arrive in later commits but lose by LSN: they ride the feed as
# batch winners yet must open/close NO interval (the merge ignored them)
COMMITS = [
    [(10, "I", "c0", 0, "a0"), (11, "I", "c0", 1, "b0"),
     (12, "I", "c1", 0, "x0")],
    [(20, "U", "c0", 0, "a1"), (21, "I", "c2", 0, "y0")],
    [(15, "U", "c0", 0, "late-loser"), (22, "D", "c1", 0, None),
     (23, "U", "c0", 1, "b1")],
    [(30, "I", "c1", 0, "x1"), (18, "D", "c0", 1, None),
     (24, "U", "c2", 0, "y1")],
]


def _source(spark, path, commits=COMMITS):
    t = create_transcript_table(spark, path, n_buckets=4)
    for i, rows in enumerate(commits):
        df = spark.createDataFrame(
            [(lsn, op, c, k, "user", txt, "", TS) for lsn, op, c, k, txt in rows],
            CHANGE_DDL,
        )
        apply_changes(t, df, batch_key=f"src{i}", mode="mor")
    return t


def _pipe(spark, tmp_path, k=1, name="scd2"):
    return ChangeFeedScd2(
        spark=spark, source_path=str(tmp_path / "src"),
        table_path=str(tmp_path / "tgt"), checkpoint_dir=str(tmp_path / "ck"),
        max_commits_per_batch=k, name=name,
    )


def _history(spark, tmp_path):
    return {
        (r["conv_id"], r["turn_idx"], r["valid_from_seq"], r["valid_to_seq"],
         r["is_current"], r["text"])
        for r in ChangeFeedScd2.read_history(
            spark, str(tmp_path / "tgt")).collect()
    }


def _recompute(src):
    """Independent history oracle straight from the batch change feed:
    per-key, in commit order, a delivery is EFFECTIVE only when its
    source LSN beats the running max (the merge's cross-batch guard);
    lead over effective deliveries assigns intervals, effective
    tombstones close them."""
    rows = src.read_changes(0).select(
        "conv_id", "turn_idx", "_commit_seq", "__lsn", "__deleted", "text"
    ).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault((r["conv_id"], r["turn_idx"]), []).append(r)
    out = set()
    for (c, k), delivered in by_key.items():
        delivered.sort(key=lambda r: r["_commit_seq"])
        versions, prev_max = [], None
        for r in delivered:
            if prev_max is None or r["__lsn"] > prev_max:
                versions.append(r)
                prev_max = r["__lsn"]
        for i, r in enumerate(versions):
            if r["__deleted"]:
                continue
            nxt = (versions[i + 1]["_commit_seq"]
                   if i + 1 < len(versions) else None)
            out.add((c, k, r["_commit_seq"], nxt, nxt is None, r["text"]))
    return out


def test_history_matches_feed_recompute(spark, tmp_path):
    src = _source(spark, str(tmp_path / "src"))
    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"), n_buckets=4)
    _pipe(spark, tmp_path, k=1).run_available()
    assert _history(spark, tmp_path) == _recompute(src)
    # bounded catch-up really segmented: 4 source commits -> >=4 target
    tgt = IceliteTable.load(spark, str(tmp_path / "tgt"))
    assert tgt.current_seq() >= 4


def test_as_of_matches_time_travel_at_every_commit(spark, tmp_path):
    src = _source(spark, str(tmp_path / "src"))
    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"), n_buckets=4)
    _pipe(spark, tmp_path, k=None).run_available()
    cols = ["conv_id", "turn_idx", "text"]
    for s in range(1, src.current_seq() + 1):
        got = {
            tuple(r) for r in ChangeFeedScd2.as_of(
                spark, str(tmp_path / "tgt"), s).select(*cols).collect()
        }
        want = {
            tuple(r)
            for r in src.read(seq=s)
            .filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
            .select(*cols).collect()
        }
        assert got == want, f"as_of({s}) != time-travel read(seq={s})"


def test_delete_then_reinsert_intervals(spark, tmp_path):
    _source(spark, str(tmp_path / "src"))
    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"), n_buckets=4)
    _pipe(spark, tmp_path).run_available()
    c1 = sorted(
        (r["valid_from_seq"], r["valid_to_seq"], r["is_current"])
        for r in ChangeFeedScd2.read_history(spark, str(tmp_path / "tgt"))
        .filter((F.col("conv_id") == "c1") & (F.col("turn_idx") == 0))
        .collect()
    )
    # insert@1 closed by the delete@3; the D version itself emits no
    # interval; re-insert@4 is the sole current row
    assert c1 == [(1, 3, False), (4, None, True)]
    # the LATE LOSING delete (lsn 18 vs applied 23) closed nothing:
    # (c0, 1) still has an open current interval from commit 3
    c0 = sorted(
        (r["valid_from_seq"], r["valid_to_seq"], r["is_current"], r["text"])
        for r in ChangeFeedScd2.read_history(spark, str(tmp_path / "tgt"))
        .filter((F.col("conv_id") == "c0") & (F.col("turn_idx") == 1))
        .collect()
    )
    assert c0 == [(1, 3, False, "b0"), (3, None, True, "b1")]


def test_restart_is_exactly_once_and_incremental(spark, tmp_path):
    src = _source(spark, str(tmp_path / "src"))
    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"), n_buckets=4)
    _pipe(spark, tmp_path).run_available()
    assert _history(spark, tmp_path) == _recompute(src)

    tgt = IceliteTable.load(spark, str(tmp_path / "tgt"))
    seq = tgt.current_seq()
    _pipe(spark, tmp_path).run_available()  # nothing new: no commit
    assert tgt.current_seq() == seq

    late = spark.createDataFrame(
        [(100, "U", "c2", 0, "user", "y2", "", TS)], CHANGE_DDL)
    apply_changes(src, late, batch_key="late", mode="mor")
    _pipe(spark, tmp_path).run_available()
    assert _history(spark, tmp_path) == _recompute(src)
    # the same version key was never written twice (immutable rows)
    hist = ChangeFeedScd2.read_history(spark, str(tmp_path / "tgt"))
    assert hist.count() == hist.select(
        "conv_id", "turn_idx", "valid_from_seq").distinct().count()


def test_segmentation_invariance(spark, tmp_path):
    src_path = str(tmp_path / "src")
    _source(spark, src_path)
    states = []
    for tag, k in (("one", 1), ("all", None)):
        ChangeFeedScd2.create_target(
            spark, str(tmp_path / f"tgt_{tag}"), src_path, n_buckets=4)
        ChangeFeedScd2(
            spark=spark, source_path=src_path,
            table_path=str(tmp_path / f"tgt_{tag}"),
            checkpoint_dir=str(tmp_path / f"ck_{tag}"),
            max_commits_per_batch=k, name=f"scd2_{tag}",
        ).run_available()
        states.append({
            tuple(r) for r in ChangeFeedScd2.read_history(
                spark, str(tmp_path / f"tgt_{tag}"))
            .select("conv_id", "turn_idx", "valid_from_seq",
                    "valid_to_seq", "is_current", "text").collect()
        })
    assert states[0] == states[1]


def test_validation_fails_fast(spark, tmp_path):
    # source without seq_col
    IceliteTable.create(
        spark, str(tmp_path / "noseq"),
        T.StructType([T.StructField("k", T.StringType()),
                      T.StructField("v", T.LongType())]),
        key_cols=("k",), bucket_key="k", n_buckets=2,
    )
    with pytest.raises(ValueError, match="seq_col"):
        ChangeFeedScd2.create_target(
            spark, str(tmp_path / "t1"), str(tmp_path / "noseq"))
    # additive source: versions undefined over folds
    IceliteTable.create(
        spark, str(tmp_path / "agg"),
        T.StructType([T.StructField("k", T.StringType()),
                      T.StructField("n", T.LongType()),
                      T.StructField("s", T.LongType())]),
        key_cols=("k",), bucket_key="k", n_buckets=2,
        seq_col="s", agg_cols={"n": "sum"},
    )
    with pytest.raises(ValueError, match="additive"):
        ChangeFeedScd2.create_target(
            spark, str(tmp_path / "t2"), str(tmp_path / "agg"))
    # starting against a non-SCD2 target
    _source(spark, str(tmp_path / "src"), commits=COMMITS[:1])
    bad = ChangeFeedScd2(
        spark=spark, source_path=str(tmp_path / "src"),
        table_path=str(tmp_path / "src"),  # the source is not a version log
        checkpoint_dir=str(tmp_path / "ck"),
    )
    with pytest.raises(Exception, match="not an SCD2 version log"):
        bad.run_available()
    with pytest.raises(ValueError, match="not an SCD2 version log"):
        ChangeFeedScd2.read_history(spark, str(tmp_path / "src"))


def test_key_pruned_history_read(spark, tmp_path):
    """where= on read_history is the point-lookup path: same rows as
    filtering the full history, strictly fewer files read (bucket +
    key-range stats pruning), and non-key predicates are refused."""
    _source(spark, str(tmp_path / "src"))
    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"), n_buckets=8)
    _pipe(spark, tmp_path).run_available()
    full = ChangeFeedScd2.read_history(spark, str(tmp_path / "tgt"))
    pruned = ChangeFeedScd2.read_history(
        spark, str(tmp_path / "tgt"), where=[("conv_id", "=", "c1")])
    want = {
        tuple(r) for r in full.filter(F.col("conv_id") == "c1")
        .select("valid_from_seq", "valid_to_seq", "is_current", "text")
        .collect()
    }
    got = {
        tuple(r) for r in pruned
        .select("valid_from_seq", "valid_to_seq", "is_current", "text")
        .collect()
    }
    assert got == want and got
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    asof = ChangeFeedScd2.as_of(
        spark, str(tmp_path / "tgt"), 4, where=[("conv_id", "=", "c1")])
    assert {r["text"] for r in asof.collect()} == {"x1"}
    with pytest.raises(ValueError, match="only key columns"):
        ChangeFeedScd2.read_history(
            spark, str(tmp_path / "tgt"), where=[("text", "=", "a0")])


def test_history_survives_target_compaction(spark, tmp_path):
    """compact() on the version log folds delta files without collapsing
    versions (every row is key-distinct) — history identical after."""
    _source(spark, str(tmp_path / "src"))
    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"), n_buckets=4)
    _pipe(spark, tmp_path).run_available()
    before = _history(spark, tmp_path)
    tgt = IceliteTable.load(spark, str(tmp_path / "tgt"))
    tgt.compact()
    assert _history(spark, tmp_path) == before
    # and the pipeline keeps appending after the fold
    late = spark.createDataFrame(
        [(99, "U", "c0", 0, "user", "a2", "", TS)], CHANGE_DDL)
    apply_changes(IceliteTable.load(spark, str(tmp_path / "src")), late,
                  batch_key="post-compact", mode="mor")
    _pipe(spark, tmp_path).run_available()
    assert ("c0", 0, 5, None, True, "a2") in _history(spark, tmp_path)


def test_sharded_scd2_consumers_partition_the_history(spark, tmp_path):
    """Two shard consumers (0/2, 1/2) maintain disjoint key slices whose
    union equals the unsharded history — the horizontal fan-out story."""
    src_path = str(tmp_path / "src")
    _source(spark, src_path)
    parts = []
    for i in range(2):
        ChangeFeedScd2.create_target(
            spark, str(tmp_path / f"tgt{i}"), src_path, n_buckets=4)
        ChangeFeedScd2(
            spark=spark, source_path=src_path,
            table_path=str(tmp_path / f"tgt{i}"),
            checkpoint_dir=str(tmp_path / f"ck{i}"),
            shard=f"{i}/2", name=f"scd2_s{i}",
        ).run_available()
        parts.append({
            tuple(r) for r in ChangeFeedScd2.read_history(
                spark, str(tmp_path / f"tgt{i}"))
            .select("conv_id", "turn_idx", "valid_from_seq",
                    "valid_to_seq", "is_current", "text").collect()
        })
    assert parts[0] & parts[1] == set()  # disjoint key slices
    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "tgt"), src_path, n_buckets=4)
    _pipe(spark, tmp_path).run_available()
    assert parts[0] | parts[1] == _history(spark, tmp_path)


def test_source_schema_evolution_flows_into_history(spark, tmp_path):
    """A column the source gains mid-lifetime evolves the version log on
    the next pipeline run: old versions read NULL, new versions carry it."""
    src = _source(spark, str(tmp_path / "src"))
    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"), n_buckets=4)
    _pipe(spark, tmp_path).run_available()

    evolved_ddl = CHANGE_DDL + ", meta string"
    late = spark.createDataFrame(
        [(50, "U", "c0", 0, "user", "a2", "", TS, "m1")], evolved_ddl)
    apply_changes(src, late, batch_key="evolve", mode="mor")
    # fresh pipeline instance, SAME checkpoint: start() re-infers the
    # evolved stream schema; the merge evolves the version log
    _pipe(spark, tmp_path).run_available()
    hist = ChangeFeedScd2.read_history(spark, str(tmp_path / "tgt"))
    assert "meta" in hist.columns
    rows = {(r["valid_from_seq"], r["text"], r["meta"])
            for r in hist.filter(
                (F.col("conv_id") == "c0") & (F.col("turn_idx") == 0)
            ).collect()}
    assert (5, "a2", "m1") in rows          # new version carries the column
    assert (1, "a0", None) in rows          # pre-evolution version reads NULL
    assert (2, "a1", None) in rows


def test_temporal_join_enriches_at_event_time(spark, tmp_path):
    """Facts join the dimension version valid AT THEIR OWN seq: before
    the first version -> NULL, inside a deleted gap -> NULL, otherwise
    the contemporaneous payload — never today's state."""
    _source(spark, str(tmp_path / "src"))
    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"), n_buckets=4)
    _pipe(spark, tmp_path).run_available()
    facts = spark.createDataFrame(
        [("c1", 0, 0), ("c1", 0, 1), ("c1", 0, 3), ("c1", 0, 4),
         ("c0", 0, 1), ("c0", 0, 2), ("nope", 9, 4)],
        "conv_id string, turn_idx int, at long",
    )
    got = {
        (r["conv_id"], r["turn_idx"], r["at"]): r["text_asof"]
        for r in ChangeFeedScd2.temporal_join(
            spark, str(tmp_path / "tgt"), facts, seq_col="at").collect()
    }
    assert got == {
        ("c1", 0, 0): None,       # before the first version
        ("c1", 0, 1): "x0",
        ("c1", 0, 3): None,       # deleted gap [3, 4)
        ("c1", 0, 4): "x1",       # re-insert
        ("c0", 0, 1): "a0",
        ("c0", 0, 2): "a1",       # contemporaneous, despite later history
        ("nope", 9, 4): None,     # unknown key
    }
    # the fact count never fans out (disjoint intervals: <=1 match/row)
    assert ChangeFeedScd2.temporal_join(
        spark, str(tmp_path / "tgt"), facts, seq_col="at").count() == 7


def test_temporal_join_at_prior_seq_matches_preimage_feed(spark, tmp_path):
    """Differential: joining the change feed at _commit_seq - 1 must
    reproduce read_changes_with_preimage's _before images — two
    independent implementations of 'the state before this commit'."""
    src = _source(spark, str(tmp_path / "src"))
    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"), n_buckets=4)
    _pipe(spark, tmp_path).run_available()
    feed = src.read_changes(0).select(
        "conv_id", "turn_idx", "_commit_seq",
        (F.col("_commit_seq") - 1).alias("prior"),
    )
    got = {
        (r["conv_id"], r["turn_idx"], r["_commit_seq"]): r["text_asof"]
        for r in ChangeFeedScd2.temporal_join(
            spark, str(tmp_path / "tgt"), feed, seq_col="prior").collect()
    }
    want = {}
    for r in src.read_changes_with_preimage(0).collect():
        b = r["_before"]
        text = None if b is None or b["__deleted"] else b["text"]
        want[(r["conv_id"], r["turn_idx"], r["_commit_seq"])] = text
    assert got == want and len(got) >= 8


def test_source_rollback_fails_the_pipeline_loud(spark, tmp_path):
    """A rollback commit in the consumed range must fail the pipeline
    with the re-sync instruction (un-delivery is inexpressible in a
    change feed — same contract as read_changes), never silently skip."""
    src = _source(spark, str(tmp_path / "src"))
    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"), n_buckets=4)
    _pipe(spark, tmp_path).run_available()
    src.rollback(2)
    with pytest.raises(Exception, match="rollback"):
        _pipe(spark, tmp_path).run_available()


def _slow_source(spark, path):
    """Source whose commits land in DISTINCT wall-clock seconds, so the
    lineage clock separates versions (committed_at is second-granular)."""
    import time as _time

    t = create_transcript_table(spark, path, n_buckets=4)
    for i, rows in enumerate([
        [(10, "I", "c0", 0, "a0")],
        [(20, "U", "c0", 0, "a1")],
        [(30, "D", "c0", 0, None)],
    ]):
        df = spark.createDataFrame(
            [(lsn, op, c, k, "user", txt, "", TS)
             for lsn, op, c, k, txt in rows], CHANGE_DDL)
        apply_changes(t, df, batch_key=f"s{i}", mode="mor")
        _time.sleep(1.1)
    return t


def test_history_with_times_stamps_match_lineage(spark, tmp_path):
    src = _slow_source(spark, str(tmp_path / "src"))
    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"), n_buckets=4)
    _pipe(spark, tmp_path).run_available()
    lin = {r["commit_seq"]: r["committed_at"]
           for r in src.lineage().select("commit_seq", "committed_at")
           .collect()}
    rows = ChangeFeedScd2.read_history_with_times(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src")).collect()
    assert rows
    for r in rows:
        assert r["valid_from_ts"] is not None
        assert r["valid_from_ts"].strftime("%Y-%m-%dT%H:%M:%SZ") == \
            lin[r["valid_from_seq"]]
        if r["valid_to_seq"] is None:
            assert r["valid_to_ts"] is None
        else:
            assert r["valid_to_ts"].strftime("%Y-%m-%dT%H:%M:%SZ") == \
                lin[r["valid_to_seq"]]


def test_temporal_join_by_time_matches_seq_join(spark, tmp_path):
    """With commits in distinct seconds, joining facts at a commit's
    wall-clock must equal joining at its seq — the two clocks agree."""
    src = _slow_source(spark, str(tmp_path / "src"))
    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"), n_buckets=4)
    _pipe(spark, tmp_path).run_available()
    lin = {r["commit_seq"]: r["ts"]
           for r in src.lineage().select(
               "commit_seq",
               F.col("committed_at").cast("timestamp").alias("ts")).collect()}
    facts = spark.createDataFrame(
        [("c0", 0, s, lin[s]) for s in (1, 2, 3)],
        "conv_id string, turn_idx int, at long, ts timestamp",
    )
    by_seq = {
        r["at"]: r["text_asof"]
        for r in ChangeFeedScd2.temporal_join(
            spark, str(tmp_path / "tgt"), facts, seq_col="at").collect()
    }
    by_time = {
        r["at"]: r["text_asof"]
        for r in ChangeFeedScd2.temporal_join_by_time(
            spark, str(tmp_path / "tgt"), str(tmp_path / "src"),
            facts, ts_col="ts").collect()
    }
    assert by_seq == by_time == {1: "a0", 2: "a1", 3: None}


def test_same_second_versions_resolve_to_latest(spark, tmp_path):
    """The normal fixture commits all land within ~a second: by-time
    lookups at that instant must return the LATEST version valid then,
    with exactly one match per fact (empty intervals never join)."""
    src = _source(spark, str(tmp_path / "src"))
    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"), n_buckets=4)
    _pipe(spark, tmp_path).run_available()
    last_ts = max(
        r["ts"] for r in src.lineage().select(
            F.col("committed_at").cast("timestamp").alias("ts")).collect()
    )
    facts = spark.createDataFrame(
        [("c0", 0, last_ts), ("c0", 1, last_ts), ("c1", 0, last_ts),
         ("c2", 0, last_ts)],
        "conv_id string, turn_idx int, ts timestamp",
    )
    out = ChangeFeedScd2.temporal_join_by_time(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"),
        facts, ts_col="ts")
    assert out.count() == 4  # one row per fact, never a fan-out
    got = {(r["conv_id"], r["turn_idx"]): r["text_asof"]
           for r in out.collect()}
    # equals the final as-of state (everything shares the clock second)
    want = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in ChangeFeedScd2.as_of(
                spark, str(tmp_path / "tgt"), src.current_seq())
            .select("conv_id", "turn_idx", "text").collect()}
    for k, v in got.items():
        assert v == want.get(k), (k, v, want.get(k))
