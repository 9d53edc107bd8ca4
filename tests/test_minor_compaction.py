"""compact_deltas — MINOR compaction (LSM-style): fold each hot bucket's
DELTA files into one fresh delta, never reading or rewriting base files.

The property under test: write amplification is bounded by delta bytes
(base paths survive verbatim), while every read surface — LWW winners,
tombstones, additive folds, the change feed — is unchanged. Reference
analog: none (the reference sinks to Postgres and has no file layout,
example/src/main.rs:305-622)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

TS = None
CHANGE_SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _files_by_kind(table):
    base, delta = [], []
    for e in table._files(table.pointer()):
        (delta if e.get("kind", "base") == "delta" else base).append(e)
    return base, delta


def test_minor_compaction_folds_deltas_base_untouched(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    # a broad base batch, folded to pure base files
    apply_changes(
        table,
        _batch(spark, [
            (t, "I", f"c{t % 8}", t // 8, "user", f"base {t}", "", TS)
            for t in range(64)
        ]),
        batch_key="b0", mode="mor",
    )
    table.compact()
    base_before, _ = _files_by_kind(table)
    assert base_before and not _files_by_kind(table)[1]

    # a trickle of delta commits: updates + one delete on the same keys
    for i in range(5):
        apply_changes(
            table,
            _batch(spark, [
                (1000 + i * 10 + k, "U", f"c{k}", 0, "user",
                 f"upd {i}.{k}", "", TS)
                for k in range(4)
            ]),
            batch_key=f"d{i}", mode="mor",
        )
    apply_changes(
        table,
        _batch(spark, [(9000, "D", "c0", 1, None, None, None, TS)]),
        batch_key="del", mode="mor",
    )
    before = table.read().toPandas()
    _, deltas_before = _files_by_kind(table)
    phys_rows_before = sum(e["rows"] for e in deltas_before)
    assert len(deltas_before) >= 6

    snap = table.compact_deltas(min_delta_files_per_bucket=1)
    base_after, deltas_after = _files_by_kind(table)
    # base files survive verbatim — never read, never rewritten
    assert sorted(e["path"] for e in base_after) == sorted(
        e["path"] for e in base_before
    )
    # hot buckets fold to one delta file each
    per_bucket: dict = {}
    for e in deltas_after:
        per_bucket[e["bucket"]] = per_bucket.get(e["bucket"], 0) + 1
    assert per_bucket and all(n == 1 for n in per_bucket.values())
    # folded winners are strictly fewer physical rows (the fold dropped
    # superseded delta versions)
    assert sum(e["rows"] for e in deltas_after) < phys_rows_before
    # reads identical: winners, payloads, and the tombstone flag
    after = table.read().toPandas()
    key = ["conv_id", "turn_idx"]
    cols = sorted(before.columns)
    assert (
        before.sort_values(key).reset_index(drop=True)[cols]
        .equals(after.sort_values(key).reset_index(drop=True)[cols])
    )
    flag = table.read().filter(
        (F.col("conv_id") == "c0") & (F.col("turn_idx") == 1)
    ).collect()
    assert len(flag) == 1 and flag[0]["__deleted"] is True
    # lineage records the minor pass; rows_written == folded winners
    rec = [r for r in table.lineage().collect() if r["commit_seq"] == snap["seq"]]
    assert rec and rec[0]["files_removed"] == len(deltas_before)

    # a second pass at a higher threshold is a no-op
    seq = table.current_seq()
    table.compact_deltas(min_delta_files_per_bucket=4)
    assert table.current_seq() == seq


def test_minor_compaction_change_feed_unaffected(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    for i in range(4):
        apply_changes(
            table,
            _batch(spark, [
                (i * 10 + k, "I", f"c{k}", i, "user", f"t{i}.{k}", "", TS)
                for k in range(3)
            ]),
            batch_key=f"b{i}", mode="mor",
        )
    feed_before = (
        table.read_changes(0)
        .orderBy("conv_id", "turn_idx", "__lsn").toPandas()
    )
    table.compact_deltas(min_delta_files_per_bucket=1)
    feed_after = (
        table.read_changes(0)
        .orderBy("conv_id", "turn_idx", "__lsn").toPandas()
    )
    assert feed_before.equals(feed_after)
    # the feed from AFTER the fold commit is empty (a rewrite, not a change)
    assert table.read_changes(table.current_seq() - 1).count() == 0


def test_minor_compaction_preserves_additive_fold(spark, tmp_path):
    schema = spark.createDataFrame([], "k string, n long, lsn long").schema
    table = IceliteTable.create(
        spark, str(tmp_path / "agg"), schema,
        key_cols=["k"], bucket_key="k", n_buckets=2, order_cols=["k"],
        seq_col="lsn", agg_cols={"n": "sum"},
    )
    for i in range(5):
        df = spark.createDataFrame(
            [("a", 1, i, "U"), ("b", 2, i, "U")],
            "k string, n long, lsn long, op string",
        )
        table.merge(df, batch_key=f"p{i}", seq_col="lsn", mode="mor")
    assert {r["k"]: r["n"] for r in table.read().collect()} == {"a": 5, "b": 10}
    table.compact_deltas(min_delta_files_per_bucket=1)
    _, deltas = _files_by_kind(table)
    # the folded partials MUST stay delta-marked (they still accumulate
    # with future partials on read)
    assert deltas and sum(e["rows"] for e in deltas) == 2
    assert {r["k"]: r["n"] for r in table.read().collect()} == {"a": 5, "b": 10}
    # further partials keep folding against the minor-compacted state
    df = spark.createDataFrame(
        [("a", 7, 99, "U")], "k string, n long, lsn long, op string"
    )
    table.merge(df, batch_key="late", seq_col="lsn", mode="mor")
    assert {r["k"]: r["n"] for r in table.read().collect()} == {"a": 12, "b": 10}


def test_minor_compaction_guards(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    apply_changes(
        table,
        _batch(spark, [(1, "I", "c0", 0, "user", "x", "", TS)]),
        batch_key="b0", mode="mor",
    )
    table.create_branch("dev")
    with pytest.raises(ValueError, match="MAIN"):
        table.branch_table("dev").compact_deltas()
    table.delete_branch("dev")
    # no bucket over threshold: metadata no-op
    seq = table.current_seq()
    table.compact_deltas(min_delta_files_per_bucket=8)
    assert table.current_seq() == seq
