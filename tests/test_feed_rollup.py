"""ChangeFeedRollup — the deployable table→table additive rollup: icelite
change-feed tail → per-batch partial aggregates → agg_cols target. Proofs:
multi-batch (bounded catch-up) equals a full-feed recompute, restart on
the same checkpoint stays exactly-once, spec/fold mismatches fail fast,
and segmentation (k=1 vs unbounded) cannot change the result."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.operators.apply import apply_changes, create_transcript_table
from etl_rust_spark.streaming.driver import ChangeFeedRollup, PipelineError

CHANGE_DDL = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)
TS = dt.datetime(2025, 1, 1)

AGGS = {"n_changes": "count", "max_turn": "max:turn_idx", "first_lsn": "min:__lsn"}


def _source(spark, path, n_commits=4):
    t = create_transcript_table(spark, path, n_buckets=4)
    lsn = 0
    for c in range(n_commits):
        rows = [
            (lsn + i, "I", f"conv-{(lsn + i) % 3}", (lsn + i) % 7, "user",
             f"t{lsn + i}", "", TS)
            for i in range(5)
        ]
        apply_changes(t, spark.createDataFrame(rows, CHANGE_DDL),
                      batch_key=f"src{c}", mode="mor")
        lsn += 5
    return t


def _recompute(src, keys=("conv_id",)):
    feed = src.read_changes(0)
    got = (
        feed.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.max("turn_idx").alias("max_turn"),
            F.min("__lsn").alias("first_lsn"),
            F.max("__lsn").alias("__lsn"),
        )
    )
    return {
        r["conv_id"]: (r["n_changes"], r["max_turn"], r["first_lsn"], r["__lsn"])
        for r in got.collect()
    }


def _state(table):
    return {
        r["conv_id"]: (r["n_changes"], r["max_turn"], r["first_lsn"], r["__lsn"])
        for r in table.read().collect()
    }


def test_bounded_catchup_equals_recompute(spark, tmp_path):
    src = _source(spark, str(tmp_path / "src"), n_commits=4)
    tgt = ChangeFeedRollup.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"),
        key_cols=("conv_id",), aggs=AGGS, n_buckets=4,
    )
    assert tgt.pointer()["agg_cols"] == {
        "n_changes": "sum", "max_turn": "max", "first_lsn": "min",
    }
    roll = ChangeFeedRollup(
        spark=spark, source_path=str(tmp_path / "src"),
        table_path=str(tmp_path / "tgt"), checkpoint_dir=str(tmp_path / "ck"),
        key_cols=("conv_id",), aggs=AGGS, max_commits_per_batch=1,
    )
    roll.run_available()
    assert _state(tgt) == _recompute(src)
    # 4 source commits drained one per batch -> >= 4 target commits
    assert tgt.current_seq() >= 4


def test_restart_is_exactly_once_and_incremental(spark, tmp_path):
    src = _source(spark, str(tmp_path / "src"), n_commits=2)
    ChangeFeedRollup.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"),
        key_cols=("conv_id",), aggs=AGGS, n_buckets=4,
    )
    mk = lambda: ChangeFeedRollup(  # noqa: E731
        spark=spark, source_path=str(tmp_path / "src"),
        table_path=str(tmp_path / "tgt"), checkpoint_dir=str(tmp_path / "ck"),
        key_cols=("conv_id",), aggs=AGGS,
    )
    mk().run_available()
    tgt = IceliteTable.load(spark, str(tmp_path / "tgt"))
    assert _state(tgt) == _recompute(src)

    # nothing new: a re-run must not commit (and must not double-count)
    seq = tgt.current_seq()
    mk().run_available()
    assert tgt.current_seq() == seq

    # new source commits: the SAME checkpoint picks up only the delta
    apply_changes(
        src,
        spark.createDataFrame([(100, "I", "conv-0", 6, "user", "new", "", TS)],
                              CHANGE_DDL),
        batch_key="late", mode="mor",
    )
    mk().run_available()
    assert _state(tgt) == _recompute(src)


def test_spec_fold_mismatch_fails_fast(spark, tmp_path):
    _source(spark, str(tmp_path / "src"), n_commits=1)
    ChangeFeedRollup.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"),
        key_cols=("conv_id",), aggs=AGGS, n_buckets=2,
    )
    bad = ChangeFeedRollup(
        spark=spark, source_path=str(tmp_path / "src"),
        table_path=str(tmp_path / "tgt"), checkpoint_dir=str(tmp_path / "ck"),
        key_cols=("conv_id",),
        aggs={"max_turn": "min:turn_idx"},  # target folds max, spec writes min
    )
    with pytest.raises(Exception, match="folds with"):
        bad.run_available()


def test_segmentation_invariance_through_streaming_path(spark, tmp_path):
    src_path = str(tmp_path / "src")
    _source(spark, src_path, n_commits=3)
    states = []
    for tag, k in (("one", 1), ("all", None)):
        ChangeFeedRollup.create_target(
            spark, str(tmp_path / f"tgt_{tag}"), src_path,
            key_cols=("conv_id",), aggs=AGGS, n_buckets=2,
        )
        ChangeFeedRollup(
            spark=spark, source_path=src_path,
            table_path=str(tmp_path / f"tgt_{tag}"),
            checkpoint_dir=str(tmp_path / f"ck_{tag}"),
            key_cols=("conv_id",), aggs=AGGS, max_commits_per_batch=k,
        ).run_available()
        states.append(_state(IceliteTable.load(spark, str(tmp_path / f"tgt_{tag}"))))
    assert states[0] == states[1]


def test_create_target_validation(spark, tmp_path):
    _source(spark, str(tmp_path / "src"), n_commits=1)
    with pytest.raises(ValueError, match="not in source"):
        ChangeFeedRollup.create_target(
            spark, str(tmp_path / "t1"), str(tmp_path / "src"),
            aggs={"x": "sum:nope"},
        )
    with pytest.raises(ValueError, match="unknown agg spec"):
        ChangeFeedRollup.create_target(
            spark, str(tmp_path / "t2"), str(tmp_path / "src"),
            aggs={"x": "avg:turn_idx"},
        )
    with pytest.raises(ValueError, match="key column"):
        ChangeFeedRollup.create_target(
            spark, str(tmp_path / "t3"), str(tmp_path / "src"),
            key_cols=("nope",),
        )

def test_relocated_checkpoint_fails_fast_not_double_counts(spark, tmp_path):
    """The additive footgun, now enforced: a FRESH checkpoint pointed at
    an already-populated target replays the feed under fresh batch keys
    and would double-count — start() must refuse before the first
    micro-batch. allow_reprocess=True restores the raw behavior (for a
    target rolled back to a pre-rollup seq), and the SAME checkpoint
    keeps resuming cleanly."""
    src = _source(spark, str(tmp_path / "src"), n_commits=2)
    ChangeFeedRollup.create_target(
        spark, str(tmp_path / "tgt"), str(tmp_path / "src"),
        key_cols=("conv_id",), aggs=AGGS, n_buckets=2,
    )
    mk = lambda ck, **kw: ChangeFeedRollup(  # noqa: E731
        spark=spark, source_path=str(tmp_path / "src"),
        table_path=str(tmp_path / "tgt"), checkpoint_dir=str(tmp_path / ck),
        key_cols=("conv_id",), aggs=AGGS, **kw,
    )
    mk("ck1").run_available()
    tgt = IceliteTable.load(spark, str(tmp_path / "tgt"))
    want = _recompute(src)
    assert _state(tgt) == want

    # relocated checkpoint: fail fast, target untouched
    seq = tgt.current_seq()
    with pytest.raises(PipelineError, match="DOUBLE-COUNT"):
        mk("ck2").run_available()
    assert tgt.current_seq() == seq
    assert _state(tgt) == want

    # same checkpoint still resumes (guard skips established offsets)
    mk("ck1").run_available()
    assert tgt.current_seq() == seq

    # explicit override reproduces the documented raw behavior
    mk("ck3", allow_reprocess=True).run_available()
    doubled = _state(IceliteTable.load(spark, str(tmp_path / "tgt")))
    assert {k: v[0] for k, v in doubled.items()} == {
        k: 2 * v[0] for k, v in want.items()
    }
