"""Z-order compaction: morton-interleaved file clustering so that
min/max file stats prune on EVERY z-ordered column — a linear sort gives
tight ranges only on its leading column; at 100 TB a range query on the
second dimension otherwise touches every file. Public technique (Morton
codes; Iceberg/Delta OPTIMIZE ZORDER)."""

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
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ]
)


def _table_with_grid(spark, path):
    """4096 rows on a 64x64 (x, y) grid, single bucket so bucket pruning
    cannot help — any file skipping must come from z-order stats."""
    t = IceliteTable.create(
        spark, path, SCHEMA,
        key_cols=["conv_id", "turn_idx"], bucket_key="conv_id",
        n_buckets=1, order_cols=["conv_id", "turn_idx"], seq_col="lsn",
    )
    rows = [
        (f"c{i}", j, i * 64 + j + 1, float(i), float(j))
        for i in range(64)
        for j in range(64)
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "lsn", "x", "y"])
    ch = spark.createDataFrame(pdf, schema=SCHEMA).withColumn("op", F.lit("U"))
    t.merge(ch, batch_key="b0", seq_col="lsn")
    return t


def _files_read(df):
    return len(set(df.inputFiles()))


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    t = _table_with_grid(spark, str(tmp_path / "t"))
    t.compact(zorder=["x", "y"], files_per_bucket=16)
    n_files = len(t.snapshot()["files"])
    assert n_files >= 8  # multiple z-range files in the single bucket

    full = t.read()
    for col in ("x", "y"):
        pruned = t.read(where=[(col, "between", (0.0, 15.0))])
        # correct AND file-skipping on this dimension
        assert pruned.count() == full.filter(
            (F.col(col) >= 0.0) & (F.col(col) <= 15.0)
        ).count() == 64 * 16
        assert _files_read(pruned) < n_files, f"no pruning on {col}"
        assert _files_read(pruned) <= (n_files + 1) // 2, (
            f"z-order should skip at least half the files for a quarter-"
            f"range query on {col}: {_files_read(pruned)}/{n_files}"
        )


def test_linear_sort_cannot_prune_second_column(spark, tmp_path):
    """The control: ordered by x alone, a y-range query touches ~every
    file — the gap z-ordering exists to close."""
    t = _table_with_grid(spark, str(tmp_path / "t"))
    t.compact(zorder=["x"], files_per_bucket=16)  # 1-D "z" == linear by x
    n_files = len(t.snapshot()["files"])
    by_x = t.read(where=[("x", "between", (0.0, 15.0))])
    assert _files_read(by_x) <= (n_files + 3) // 4  # leading column prunes hard
    by_y = t.read(where=[("y", "between", (0.0, 15.0))])
    assert _files_read(by_y) == n_files  # trailing column cannot prune


def test_zorder_rejects_string_columns_and_preserves_rows(spark, tmp_path):
    t = _table_with_grid(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="numeric/temporal"):
        t.compact(zorder=["conv_id"])
    before = {(r["conv_id"], r["turn_idx"]) for r in t.read().collect()}
    t.compact(zorder=["x", "y"], files_per_bucket=8)
    after = {(r["conv_id"], r["turn_idx"]) for r in t.read().collect()}
    assert before == after
    # point lookups through the bucket path still work on the new layout
    assert t.read_keys(["c3"]).count() == 64


def test_zorder_persists_across_plain_compactions(spark, tmp_path):
    """Once OPTIMIZE-style z-ordering ran, routine maintenance compaction
    must keep the clustered layout (or the nightly job silently destroys
    what the expensive run paid for); zorder=[] explicitly clears it."""
    t = _table_with_grid(spark, str(tmp_path / "t"))
    t.compact(zorder=["x", "y"], files_per_bucket=16)
    # more data arrives, then a PLAIN maintenance compaction
    rows = [(f"d{i}", 0, 10_000 + i, float(i % 64), float((i * 7) % 64))
            for i in range(256)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "lsn", "x", "y"])
    t.merge(spark.createDataFrame(pdf, schema=SCHEMA).withColumn("op", F.lit("U")),
            batch_key="b1", seq_col="lsn")
    t.compact()  # no args: inherits the persisted z-order
    n_files = len(t.snapshot()["files"])
    assert n_files >= 8
    for col in ("x", "y"):
        pruned = t.read(where=[(col, "between", (0.0, 15.0))])
        assert _files_read(pruned) <= (n_files + 1) // 2, f"lost clustering on {col}"
    # explicit clear: back to one file per bucket, pointer forgets
    t.compact(zorder=[])
    assert t.pointer().get("zorder") is None
    assert len(t.snapshot()["files"]) == 1  # single bucket


def test_zorder_follows_rename_and_drop(spark, tmp_path):
    t = _table_with_grid(spark, str(tmp_path / "t"))
    t.compact(zorder=["x", "y"], files_per_bucket=8)
    t.rename_column("x", "x2")
    assert t.pointer()["zorder"] == ["x2", "y"]
    t.compact()  # re-clusters under the renamed column without error
    pruned = t.read(where=[("x2", "between", (0.0, 15.0))])
    assert _files_read(pruned) < len(t.snapshot()["files"])
    t.drop_column("y")
    assert t.pointer()["zorder"] == ["x2"]
