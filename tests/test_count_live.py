"""count_live: the metadata-first SELECT count(*) path.

Iceberg answers whole-table counts from manifest row counts; the
reference pays a full collection scan for the same number
(src/etl/processor.rs:99). count_live must be EXACT in every table
state — deltas pending, tombstones present, post-compaction — while the
detail breakdown proves WHICH tier paid (metadata / tombstone-column
scan / dedup scan)."""

import datetime as dt

from etl_rust_spark.operators.apply import (
    apply_changes,
    create_transcript_table,
    read_transcripts,
)

CHANGE_SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)
TS = dt.datetime(2025, 1, 1)


def _batch(spark, conv, lsn0, n=4, op="I"):
    rows = [
        (
            lsn0 + t,
            op,
            conv,
            t,
            None if op == "D" else "user",
            None if op == "D" else f"{conv} t{t}",
            None if op == "D" else "",
            None if op == "D" else TS,
        )
        for t in range(n)
    ]
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _live_count(table):
    return read_transcripts(table).count()


def test_count_live_exact_across_table_states(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)

    # MoR deltas pending: dedup tier carries the whole count
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    apply_changes(table, _batch(spark, "c1", 100), batch_key="b1", mode="mor")
    d = table.count_live(detail=True)
    assert d["count"] == _live_count(table) == 8
    assert d["dedup_scan_buckets"] > 0

    # updates + deletes still pending as deltas: count is live winners
    apply_changes(table, _batch(spark, "c0", 200), batch_key="b2", mode="mor")
    apply_changes(
        table, _batch(spark, "c1", 300, n=2, op="D"), batch_key="b3", mode="mor"
    )
    assert table.count_live() == _live_count(table) == 6

    seq_before_compact = table.pointer()["seq"]

    # full compaction folds deltas; tombstone winners survive in base
    # files, so the per-file __deleted stats split the files between the
    # metadata tier (max=false) and the tombstone-column scan (max=true)
    table.compact()
    d = table.count_live(detail=True)
    assert d["count"] == _live_count(table) == 6
    assert d["dedup_scan_buckets"] == 0
    assert d["metadata_files"] + d["tombstone_scan_files"] > 0
    assert (
        d["metadata_rows"] + d["tombstone_scan_live"] == 6
    )

    # time travel: count at the pre-compaction snapshot
    assert table.count_live(seq=seq_before_compact) == 6
    assert table.count_live(seq=2) == 8  # before the delete batch


def test_count_live_pure_metadata_when_no_tombstones(spark, tmp_path):
    """A compacted table whose buckets never saw a delete counts from
    manifests alone — zero files opened, zero Spark jobs (the 100 TB
    instant-count state)."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    for i, conv in enumerate(["a", "b", "c"]):
        apply_changes(
            table, _batch(spark, conv, i * 100), batch_key=f"b{i}", mode="mor"
        )
    table.compact()
    d = table.count_live(detail=True)
    assert d["count"] == _live_count(table) == 12
    assert d["tombstone_scan_files"] == 0
    assert d["dedup_scan_buckets"] == 0
    assert d["metadata_rows"] == 12
    assert d["metadata_files"] > 0


def test_cli_count_end_to_end(spark, tmp_path, capsys):
    import json

    from etl_rust_spark.__main__ import main

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    apply_changes(
        table, _batch(spark, "c0", 100, n=1, op="D"), batch_key="b1", mode="mor"
    )
    assert main(["count", "--table", str(tmp_path / "t")]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["count"] == 3 == _live_count(table)
    # historical count by snapshot id
    assert main(["count", "--table", str(tmp_path / "t"), "--seq", "1"]) == 0
    assert json.loads(capsys.readouterr().out)["count"] == 4


def test_min_max_exact_across_states(spark, tmp_path):
    """min_max must track LIVE rows only: a delete that removes the row
    holding the max (key columns are non-null on tombstones — the trap)
    must drop it from the answer, pending or compacted."""
    from pyspark.sql import functions as F

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(table, _batch(spark, "c0", 0, n=3), batch_key="b0", mode="mor")
    apply_changes(table, _batch(spark, "c1", 100, n=9), batch_key="b1", mode="mor")

    def oracle(col):
        r = (
            read_transcripts(table)
            .agg(F.min(col).alias("a"), F.max(col).alias("b"))
            .first()
        )
        return (r["a"], r["b"])

    assert table.min_max("turn_idx") == oracle("turn_idx") == (0, 8)
    assert table.min_max("ts") == oracle("ts")

    # delete the conv holding turn_idx 3..8 — max must fall to 2 even
    # though the tombstones still carry turn_idx values
    apply_changes(
        table, _batch(spark, "c1", 200, n=9, op="D"), batch_key="b2", mode="mor"
    )
    assert table.min_max("turn_idx") == oracle("turn_idx") == (0, 2)

    table.compact()
    d = table.min_max("turn_idx", detail=True)
    assert (d["min"], d["max"]) == (0, 2)
    assert d["dedup_scan_buckets"] == 0
    # string columns never answer from stats (truncation hazard)
    ds = table.min_max("text", detail=True)
    assert ds["metadata_files"] == 0
    assert (ds["min"], ds["max"]) == oracle("text")


def test_min_max_pure_metadata_when_no_tombstones(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    for i, conv in enumerate(["a", "b"]):
        apply_changes(
            table, _batch(spark, conv, i * 100), batch_key=f"b{i}", mode="mor"
        )
    table.compact()
    d = table.min_max("__lsn", detail=True)
    assert d["scan_files"] == 0 and d["dedup_scan_buckets"] == 0
    assert d["metadata_files"] > 0
    assert (d["min"], d["max"]) == (0, 103)
    # time travel
    assert table.min_max("__lsn", seq=1) == (0, 3)


def test_count_live_and_min_max_on_branch(spark, tmp_path):
    """Branch handles resolve through their own chain: counts diverge
    from main after the fork and main stays untouched."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    br = table.create_branch("fix")
    apply_changes(br, _batch(spark, "c1", 100, n=2), batch_key="b1", mode="mor")
    apply_changes(
        br, _batch(spark, "c0", 200, n=1, op="D"), batch_key="b2", mode="mor"
    )
    assert table.count_live() == 4
    assert br.count_live() == _live_count(br) == 5
    assert br.min_max("turn_idx") == (0, 3)
    assert table.min_max("turn_idx") == (0, 3)


def test_min_max_survives_column_rename(spark, tmp_path):
    """Stats are keyed by WRITE-TIME names and files keep their physical
    columns across a rename — min_max must resolve both through the
    field-id map (a raw by-current-name read would silently null every
    pre-rename file)."""
    from pyspark.sql import functions as F

    # scan tier: tombstones force the field-id-resolved projection
    t1 = create_transcript_table(spark, str(tmp_path / "t1"), n_buckets=2)
    apply_changes(t1, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    apply_changes(
        t1, _batch(spark, "c0", 100, n=1, op="D"), batch_key="b1", mode="mor"
    )
    t1.compact()
    t1.rename_column("turn_idx", "pos")
    r = (
        read_transcripts(t1)
        .agg(F.min("pos").alias("a"), F.max("pos").alias("b"))
        .first()
    )
    assert (r["a"], r["b"]) == (1, 3)
    assert t1.min_max("pos") == (1, 3)

    # metadata tier: tombstone-free pre-rename files answer from their
    # write-name stats
    t2 = create_transcript_table(spark, str(tmp_path / "t2"), n_buckets=2)
    apply_changes(t2, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    t2.compact()
    t2.rename_column("turn_idx", "pos")
    d = t2.min_max("pos", detail=True)
    assert (d["min"], d["max"]) == (0, 3)
    assert d["metadata_files"] > 0 and d["scan_files"] == 0


def test_count_col_non_null_across_states(spark, tmp_path):
    """count_live(col) = SELECT count(col): non-null LIVE values, exact
    through deltas, tombstones, compaction, and renames — metadata tier
    backed by footer null counts."""
    from pyspark.sql import functions as F

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    # tool is '' on inserts; null it on a couple of rows via update rows
    rows = [
        (0, "I", "c0", 0, "user", "a", "x", TS),
        (1, "I", "c0", 1, "user", "b", None, TS),
        (2, "I", "c0", 2, "user", "c", None, TS),
        (3, "I", "c1", 0, "user", "d", "y", TS),
    ]
    apply_changes(
        table,
        spark.createDataFrame(rows, CHANGE_SCHEMA),
        batch_key="b0",
        mode="mor",
    )

    def oracle(col):
        return read_transcripts(table).agg(F.count(col)).first()[0]

    assert table.count_live("tool") == oracle("tool") == 2
    assert table.count_live("text") == 4

    # delete a non-null-tool row: the live non-null count drops
    apply_changes(
        table,
        spark.createDataFrame(
            [(10, "D", "c1", 0, None, None, None, None)], CHANGE_SCHEMA
        ),
        batch_key="b1",
        mode="mor",
    )
    assert table.count_live("tool") == oracle("tool") == 1

    table.compact()
    d = table.count_live("tool", detail=True)
    assert d["count"] == 1 and d["column"] == "tool"
    assert d["dedup_scan_buckets"] == 0

    # rename: null counts and scans resolve through the write-time name
    table.rename_column("tool", "fn")
    assert table.count_live("fn") == 1


def test_count_col_pure_metadata_when_no_tombstones(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    rows = [
        (0, "I", "c0", 0, "user", "a", None, TS),
        (1, "I", "c0", 1, "user", "b", "x", TS),
        (2, "I", "c1", 0, "user", None, "y", TS),
    ]
    apply_changes(
        table,
        spark.createDataFrame(rows, CHANGE_SCHEMA),
        batch_key="b0",
        mode="mor",
    )
    table.compact()
    d = table.count_live("tool", detail=True)
    assert d["count"] == 2
    assert d["tombstone_scan_files"] == 0 and d["dedup_scan_buckets"] == 0
    assert d["metadata_files"] > 0 and d["metadata_rows"] == 2
    dt2 = table.count_live("text", detail=True)
    assert dt2["count"] == 2 and dt2["tombstone_scan_files"] == 0


def test_count_where_tiers_and_exactness(spark, tmp_path):
    """count_where: excluded / contained / residual tiers, exact against
    a full filter in every table state."""
    from pyspark.sql import functions as F

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(table, _batch(spark, "c0", 0, n=6), batch_key="b0", mode="mor")
    apply_changes(table, _batch(spark, "c1", 100, n=3), batch_key="b1", mode="mor")

    def oracle(cond):
        return read_transcripts(table).filter(cond).count()

    # deltas pending: everything routes through the dedup tier
    d = table.count_where([("conv_id", "=", "c0")], detail=True)
    assert d["count"] == oracle(F.col("conv_id") == "c0") == 6
    assert d["dedup_scan_buckets"] > 0

    table.compact()

    # equality on the bucket key: hash-bucket pruning + residual scan
    d = table.count_where([("conv_id", "=", "c0")], detail=True)
    assert d["count"] == 6 and d["dedup_scan_buckets"] == 0

    # whole-range predicate on a stat column: pure containment, no scan
    d = table.count_where([("turn_idx", ">=", 0)], detail=True)
    assert d["count"] == 9
    assert d["contained_files"] > 0 and d["residual_scan_files"] == 0

    # provably-empty predicate: every file excluded, zero jobs
    d = table.count_where([("turn_idx", "=", 999)], detail=True)
    assert d["count"] == 0 and d["residual_scan_files"] == 0
    assert d["excluded_files"] > 0 and d["contained_files"] == 0

    # partial range: residual scan stays exact
    assert table.count_where([("turn_idx", "between", (2, 4))]) == oracle(
        F.col("turn_idx").between(2, 4)
    )

    # multi-column AND with zero nulls in both: contained from metadata
    d = table.count_where(
        [("turn_idx", ">=", 0), ("ts", ">=", dt.datetime(2020, 1, 1))],
        detail=True,
    )
    assert d["count"] == 9 and d["residual_scan_files"] == 0

    # deletes: tombstoned keys fall out of the count in every tier
    apply_changes(
        table, _batch(spark, "c0", 200, n=6, op="D"), batch_key="b2", mode="mor"
    )
    assert table.count_where([("conv_id", "=", "c0")]) == 0
    assert table.count_where([("turn_idx", ">=", 0)]) == 3
    table.compact()
    d = table.count_where([("turn_idx", ">=", 0)], detail=True)
    assert d["count"] == 3 and d["dedup_scan_buckets"] == 0

    # validation
    import pytest

    with pytest.raises(ValueError, match="no column"):
        table.count_where([("nope", "=", 1)])
    with pytest.raises(ValueError, match="AND group"):
        table.count_where([[("turn_idx", "=", 1)]])


def test_describe_live_rows_exact_stays_metadata_only(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    # overlapping second batch leaves delta files: metadata cannot
    # prove the live count (read_transcripts must dedup winners)
    apply_changes(table, _batch(spark, "c0", 100), batch_key="b1", mode="mor")
    assert table.describe()["live_rows_exact"] is None
    table.compact()
    assert table.describe()["live_rows_exact"] == 4
