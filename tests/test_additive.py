"""Additive (agg_cols) tables — SummingMergeTree-style accumulate-on-read
(round 5): merges append per-key PARTIAL rows in O(delta) and every read/
compaction folds the partials with the column's declared combine fn
(sum/min/max), while non-agg payload stays last-writer-wins by seq. This
is what makes a continuously-maintained downstream rollup O(delta) per
micro-batch — exact under ANY micro-batch segmentation of the change feed
(the reference's sink has no aggregate surface at all; its per-batch
insert path is src/etl/processor.rs — this extends it the way ClickHouse
extends MergeTree with SummingMergeTree)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rust_spark.lake.format import ConcurrentCommitError, IceliteTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_changes", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("first_lsn", T.LongType()),
        T.StructField("last_state", T.StringType()),
        T.StructField("__lsn", T.LongType()),
    ]
)

AGG = {"n_changes": "sum", "value_sum": "sum", "first_lsn": "min"}


def _make(spark, path, agg=None, **kw):
    return IceliteTable.create(
        spark, path, SCHEMA,
        key_cols=["conv_id"], bucket_key="conv_id", n_buckets=4,
        order_cols=["conv_id"], seq_col="__lsn",
        agg_cols=AGG if agg is None else agg, **kw,
    )


CHANGE_SCHEMA = T.StructType(
    list(SCHEMA.fields) + [T.StructField("op", T.StringType())]
)


def _partials(spark, rows):
    # (conv_id, n_changes, value_sum, first_lsn, last_state, __lsn)
    return spark.createDataFrame([(*r, "U") for r in rows], CHANGE_SCHEMA)


def _state(table):
    return {
        r["conv_id"]: (
            r["n_changes"], round(r["value_sum"], 6), r["first_lsn"],
            r["last_state"], r["__lsn"],
        )
        for r in table.read().collect()
    }


def test_multibatch_accumulation_equals_oneshot(spark, tmp_path):
    """The core contract: K batches of partials fold to the same state as
    one batch of their totals — segmentation invariance."""
    t = _make(spark, str(tmp_path / "t"))
    batches = [
        [("a", 3, 1.5, 10, "s1", 12), ("b", 1, 2.0, 11, "s2", 11)],
        [("a", 2, 0.25, 9, "s3", 20), ("c", 5, -1.0, 15, "s4", 15)],
        [("a", 1, 4.0, 30, "s5", 30), ("b", 4, 0.5, 5, "s6", 8)],
    ]
    for i, rows in enumerate(batches):
        t.merge(_partials(spark, rows), batch_key=f"b{i}",
                seq_col="__lsn", mode="mor")
    got = _state(t)
    # sums accumulate; first_lsn is the min; last_state / __lsn follow the
    # max-seq writer
    assert got == {
        "a": (6, 5.75, 9, "s5", 30),
        "b": (5, 2.5, 5, "s2", 11),
        "c": (5, -1.0, 15, "s4", 15),
    }

    # one-shot twin: same rows in ONE batch → identical folded state
    t2 = _make(spark, str(tmp_path / "t2"))
    t2.merge(_partials(spark, [r for rows in batches for r in rows]),
             batch_key="all", seq_col="__lsn", mode="mor")
    assert _state(t2) == got


def test_idempotent_redelivery_never_double_counts(spark, tmp_path):
    """Exactly-once is what makes additive tables safe under retries: a
    replayed batch_key is a ledger no-op, so partials can't double."""
    t = _make(spark, str(tmp_path / "t"))
    rows = [("a", 2, 1.0, 1, "x", 1)]
    assert t.merge(_partials(spark, rows), batch_key="b0",
                   seq_col="__lsn", mode="mor") is not None
    assert t.merge(_partials(spark, rows), batch_key="b0",
                   seq_col="__lsn", mode="mor") is None
    assert _state(t)["a"][0] == 2


def test_compaction_folds_and_later_deltas_keep_accumulating(spark, tmp_path):
    t = _make(spark, str(tmp_path / "t"))
    for i in range(4):
        t.merge(_partials(spark, [("a", 1, 1.0, 100 - i, "s", i + 1)]),
                batch_key=f"b{i}", seq_col="__lsn", mode="mor")
    before = _state(t)
    assert before["a"] == (4, 4.0, 97, "s", 4)
    n_files_before = len(t._files(t.pointer()))
    t.compact()
    assert _state(t) == before
    assert len(t._files(t.pointer())) < n_files_before
    # the folded base row is itself a partial: new deltas add onto it
    t.merge(_partials(spark, [("a", 10, 0.5, 50, "z", 99)]),
            batch_key="b5", seq_col="__lsn", mode="mor")
    assert _state(t)["a"] == (14, 4.5, 50, "z", 99)


def test_partial_batch_with_repeated_key_folds(spark, tmp_path):
    """Unlike LWW tables, a batch may carry SEVERAL partials of one key —
    even in the very first commit (its files must be delta-marked)."""
    t = _make(spark, str(tmp_path / "t"))
    t.merge(
        _partials(spark, [("a", 1, 1.0, 5, "p", 1), ("a", 2, 2.0, 3, "q", 2)]),
        batch_key="b0", seq_col="__lsn", mode="mor",
    )
    assert _state(t)["a"] == (3, 3.0, 3, "q", 2)


def test_read_keys_point_lookup_folds(spark, tmp_path):
    t = _make(spark, str(tmp_path / "t"))
    t.merge(_partials(spark, [("a", 1, 1.0, 1, "x", 1), ("b", 7, 0.0, 2, "y", 2)]),
            batch_key="b0", seq_col="__lsn", mode="mor")
    t.merge(_partials(spark, [("a", 2, 0.5, 9, "z", 5)]),
            batch_key="b1", seq_col="__lsn", mode="mor")
    got = t.read_keys(["a"]).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_changes"], r["value_sum"], r["first_lsn"], r["last_state"]) == (
        3, 1.5, 1, "z",
    )


def test_where_key_pruning_is_fold_exact(spark, tmp_path):
    t = _make(spark, str(tmp_path / "t"))
    t.merge(_partials(spark, [("a", 1, 1.0, 1, "x", 1), ("b", 7, 0.0, 2, "y", 2)]),
            batch_key="b0", seq_col="__lsn", mode="mor")
    t.merge(_partials(spark, [("a", 4, 1.0, 1, "w", 3)]),
            batch_key="b1", seq_col="__lsn", mode="mor")
    rows = t.read(where=[("conv_id", "=", "a")]).collect()
    assert len(rows) == 1 and rows[0]["n_changes"] == 5


def test_time_travel_folds_at_each_snapshot(spark, tmp_path):
    t = _make(spark, str(tmp_path / "t"))
    t.merge(_partials(spark, [("a", 1, 1.0, 1, "x", 1)]),
            batch_key="b0", seq_col="__lsn", mode="mor")
    t.merge(_partials(spark, [("a", 2, 1.0, 1, "y", 2)]),
            batch_key="b1", seq_col="__lsn", mode="mor")
    assert t.read(seq=1).collect()[0]["n_changes"] == 1
    assert t.read(seq=2).collect()[0]["n_changes"] == 3


def test_guards_cow_deletes_preimage_drop(spark, tmp_path):
    t = _make(spark, str(tmp_path / "t"))
    rows = _partials(spark, [("a", 1, 1.0, 1, "x", 1)])
    with pytest.raises(ValueError, match="merge-on-read only"):
        t.merge(rows, batch_key="b0", seq_col="__lsn", mode="cow")
    with pytest.raises(ValueError, match="accumulate-only"):
        t.merge(rows.withColumn("__deleted", F.lit(False)),
                batch_key="b0", seq_col="__lsn", mode="mor")
    with pytest.raises(ValueError, match="accumulate-only"):
        t.merge(rows.withColumn("op", F.lit("D")),
                batch_key="b0", seq_col="__lsn", mode="mor")
    t.merge(rows, batch_key="b0", seq_col="__lsn", mode="mor")
    with pytest.raises(ValueError, match="undefined for additive"):
        t.read_changes_with_preimage(0)
    with pytest.raises(ValueError, match="additive"):
        t.drop_column("n_changes")


def test_create_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="requires a seq_col"):
        IceliteTable.create(
            spark, str(tmp_path / "a"), SCHEMA, key_cols=["conv_id"],
            bucket_key="conv_id", agg_cols=AGG,
        )
    with pytest.raises(ValueError, match="supported fns"):
        _make(spark, str(tmp_path / "b"), agg={"n_changes": "avg"})
    with pytest.raises(ValueError, match="not in schema"):
        _make(spark, str(tmp_path / "c"), agg={"nope": "sum"})
    with pytest.raises(ValueError, match="identity columns"):
        _make(spark, str(tmp_path / "d"), agg={"conv_id": "sum"})
    with pytest.raises(ValueError, match="must be long, double or decimal"):
        IceliteTable.create(
            spark, str(tmp_path / "e"),
            T.StructType([
                T.StructField("k", T.StringType()),
                T.StructField("n", T.IntegerType()),
                T.StructField("__lsn", T.LongType()),
            ]),
            key_cols=["k"], bucket_key="k", seq_col="__lsn",
            agg_cols={"n": "sum"},
        )


def test_rename_preserves_fold(spark, tmp_path):
    """A metadata-only rename carries the column's combine fn to the new
    name; pre-rename partials keep folding with post-rename ones (field-id
    resolution aliases the old files)."""
    t = _make(spark, str(tmp_path / "t"))
    t.merge(_partials(spark, [("a", 1, 1.0, 1, "x", 1)]),
            batch_key="b0", seq_col="__lsn", mode="mor")
    t.rename_column("n_changes", "n_total")
    assert t.pointer()["agg_cols"]["n_total"] == "sum"
    assert "n_changes" not in t.pointer()["agg_cols"]
    add = _partials(spark, [("a", 2, 1.0, 1, "y", 2)]).withColumnRenamed(
        "n_changes", "n_total"
    )
    t.merge(add, batch_key="b1", seq_col="__lsn", mode="mor")
    row = t.read().collect()[0]
    assert row["n_total"] == 3 and row["last_state"] == "y"


def test_native_sink_refuses_additive_target(spark, tmp_path):
    """The writeStream sink collapses one winner per key per commit —
    correct for LWW tables, lossy for partials — so it fails fast."""
    from etl_rust_spark.sources.icelite_sink import IceliteStreamWriter

    _make(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="additive"):
        IceliteStreamWriter({"path": str(tmp_path / "t")}, SCHEMA)


def test_changelog_replay_through_feed_composes(spark, tmp_path):
    """read_changes on an additive table yields the raw partials; a
    downstream accumulator that merges each feed batch into its own
    additive table converges to the SAME folded state (the cdc_chain
    hop-2 pattern, now exact under any batch segmentation)."""
    src = _make(spark, str(tmp_path / "src"))
    for i in range(3):
        src.merge(
            _partials(spark, [("a", i + 1, 1.0, i, f"s{i}", i),
                              ("b", 1, 0.5, 50 - i, "t", 100 + i)]),
            batch_key=f"b{i}", seq_col="__lsn", mode="mor",
        )
    dst = _make(spark, str(tmp_path / "dst"))
    # deliver one source commit per downstream batch
    for s in range(1, src.current_seq() + 1):
        feed = src.read_changes(s - 1, s).select(*[f.name for f in SCHEMA.fields])
        dst.merge(feed.withColumn("op", F.lit("U")), batch_key=f"d{s}",
                  seq_col="__lsn", mode="mor")
    assert _state(dst) == _state(src)
