"""sync_snapshot — binlog-less CDC: diff a full upstream snapshot against
live state into ONE commit of exactly the changes (Debezium snapshot mode /
Delta MERGE WHEN NOT MATCHED BY SOURCE, public semantics; the reference's
Mongo cursor scan is such a full-state source, src/etl/processor.rs:99).
Proofs: live state equals the snapshot afterwards, the change feed carries
exactly the diff (unchanged keys emit nothing), deleted keys resurrect,
LWW interplay with real CDC events is preserved in both directions,
replay/zero-diff are no-ops, and missing payload columns fail fast."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.operators.apply import (
    apply_changes,
    create_transcript_table,
    read_transcripts,
    sync_snapshot,
)

TS = dt.datetime(2025, 1, 1)
DDL = ("lsn long, op string, conv_id string, turn_idx int, role string, "
       "text string, tool string, ts timestamp")
SNAP_DDL = ("conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp")


def _seed(spark, path):
    """4 live keys + 1 tombstoned key."""
    t = create_transcript_table(spark, path, n_buckets=4)
    rows = [
        (1, "I", "c0", 0, "user", "keep-me", "", TS),
        (2, "I", "c0", 1, "user", "change-me", "", TS),
        (3, "I", "c1", 0, "user", "delete-me", "", TS),
        (4, "I", "c1", 1, "user", "also-keep", "", TS),
        (5, "I", "c2", 0, "user", "short-lived", "", TS),
        (6, "D", "c2", 0, "user", None, "", TS),
    ]
    apply_changes(t, spark.createDataFrame(rows, DDL), batch_key="seed",
                  mode="mor")
    return t


def _snap(spark, rows):
    return spark.createDataFrame(rows, SNAP_DDL)


def test_sync_diffs_into_one_commit(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    seq0 = t.current_seq()
    snap = _snap(spark, [
        ("c0", 0, "user", "keep-me", "", TS),        # unchanged → nothing
        ("c0", 1, "user", "CHANGED", "", TS),        # update
        ("c1", 1, "user", "also-keep", "", TS),      # unchanged → nothing
        ("c2", 0, "user", "resurrected", "", TS),    # tombstoned → insert
        ("c9", 0, "user", "brand-new", "", TS),      # insert
        # c1/0 absent → delete
    ])
    rep = sync_snapshot(t, snap, batch_key="sync1")
    assert (rep["inserted"], rep["updated"], rep["deleted"]) == (2, 1, 1)
    assert t.current_seq() == seq0 + 1  # ONE commit

    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in read_transcripts(t).collect()}
    assert got == {("c0", 0): "keep-me", ("c0", 1): "CHANGED",
                   ("c1", 1): "also-keep", ("c2", 0): "resurrected",
                   ("c9", 0): "brand-new"}

    # the feed at the sync commit carries EXACTLY the diff — unchanged
    # keys emit nothing (O(changed) contract)
    feed = t.read_changes(since_seq=seq0)
    keys = {(r["conv_id"], r["turn_idx"]) for r in feed.collect()}
    assert keys == {("c0", 1), ("c1", 0), ("c2", 0), ("c9", 0)}
    dead = {(r["conv_id"], r["turn_idx"])
            for r in feed.filter(F.col("__deleted")).collect()}
    assert dead == {("c1", 0)}


def test_sync_is_idempotent_and_zero_diff_commits_nothing(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    snap = _snap(spark, [("c0", 0, "user", "keep-me", "", TS)])
    assert sync_snapshot(t, snap, batch_key="s1") is not None
    seq = t.current_seq()
    # replay of the same batch key: ledger no-op
    assert sync_snapshot(t, snap, batch_key="s1") is None
    # same CONTENT under a new key: zero diff → no commit at all
    assert sync_snapshot(t, snap, batch_key="s2") is None
    assert t.current_seq() == seq


def test_lww_interplay_with_cdc_events(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    snap = _snap(spark, [("c0", 0, "user", "from-sync", "", TS)])
    rep = sync_snapshot(t, snap, batch_key="s1")
    sync_lsn = 7  # 1 + max stored lsn (seed reached 6)
    # an OLDER CDC event for a synced key must lose ...
    late = [(sync_lsn - 1, "U", "c0", 0, "user", "stale", "", TS)]
    apply_changes(t, spark.createDataFrame(late, DDL), batch_key="late",
                  mode="mor")
    # ... and a NEWER one must win
    fresh = [(sync_lsn + 1, "U", "c0", 0, "user", "newer", "", TS)]
    apply_changes(t, spark.createDataFrame(fresh, DDL), batch_key="fresh",
                  mode="mor")
    texts = {r["turn_idx"]: r["text"]
             for r in read_transcripts(t).filter("conv_id='c0'").collect()}
    assert texts[0] == "newer"
    # the sync's delete of every other key also carries sync_lsn: an older
    # upsert cannot resurrect
    revive = [(sync_lsn - 1, "U", "c1", 1, "user", "zombie", "", TS)]
    apply_changes(t, spark.createDataFrame(revive, DDL), batch_key="rev",
                  mode="mor")
    assert read_transcripts(t).filter("conv_id='c1'").count() == 0
    assert rep["deleted"] == 3  # c0/1, c1/0, c1/1 were live at sync time


def test_missing_payload_column_fails_fast(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    snap = spark.createDataFrame(
        [("c0", 0, "user")], "conv_id string, turn_idx int, role string")
    with pytest.raises(ValueError, match="missing live payload columns"):
        sync_snapshot(t, snap, batch_key="s1")
    with pytest.raises(ValueError, match="missing key columns"):
        sync_snapshot(t, spark.createDataFrame([("c0",)], "conv_id string"),
                      batch_key="s1")


def test_new_snapshot_column_evolves_schema_nulls_unchanged(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    # full current live state + a new column, non-null on ONE row: only
    # that row is an update; null-valued new cells are not changes
    live = read_transcripts(t)
    snap = live.withColumn(
        "score",
        F.when((F.col("conv_id") == "c0") & (F.col("turn_idx") == 0),
               F.lit(0.9)),
    )
    rep = sync_snapshot(t, snap, batch_key="s1")
    assert (rep["inserted"], rep["updated"], rep["deleted"]) == (0, 1, 0)
    assert "score" in t.read().columns
    got = {(r["conv_id"], r["turn_idx"]): r["score"]
           for r in read_transcripts(t).collect()}
    assert got[("c0", 0)] == pytest.approx(0.9)
    assert all(v is None for k, v in got.items() if k != ("c0", 0))


def test_sync_respects_check_constraints(spark, tmp_path):
    from etl_rust_spark.lake.format import CheckViolationError

    t = _seed(spark, str(tmp_path / "t"))
    t.add_check("text_nonempty", "length(text) > 0")
    seq = t.current_seq()
    snap = _snap(spark, [("c0", 0, "user", "", "", TS)])
    with pytest.raises(CheckViolationError, match="text_nonempty"):
        sync_snapshot(t, snap, batch_key="s1")
    assert t.current_seq() == seq  # nothing written


def test_cli_sync_snapshot_end_to_end(spark, tmp_path, capsys):
    from etl_rust_spark.__main__ import main

    t = _seed(spark, str(tmp_path / "t"))
    snap = _snap(spark, [
        ("c0", 0, "user", "keep-me", "", TS),
        ("c0", 1, "user", "cli-change", "", TS),
    ])
    snap.write.parquet(str(tmp_path / "snap"))
    assert main(["sync-snapshot", "--table", str(tmp_path / "t"),
                 "--snapshot", str(tmp_path / "snap"),
                 "--batch-key", "cli1"]) == 0
    out = capsys.readouterr().out
    assert '"updated": 1' in out and '"deleted": 2' in out
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in read_transcripts(
               IceliteTable.load(spark, str(tmp_path / "t"))).collect()}
    assert got == {("c0", 0): "keep-me", ("c0", 1): "cli-change"}
    # replay through the CLI: ledger no-op
    assert main(["sync-snapshot", "--table", str(tmp_path / "t"),
                 "--snapshot", str(tmp_path / "snap"),
                 "--batch-key", "cli1"]) == 0
    assert "no-op" in capsys.readouterr().out


def test_sharded_sync_with_where_scope(spark, tmp_path):
    """where= scope: each shard diffs and deletes only inside its key
    range — out-of-scope rows untouched, two shard syncs compose to the
    full sync, the table side is file-pruned, and guards fire on
    out-of-scope snapshot rows / non-key scope columns."""
    t = _seed(spark, str(tmp_path / "t"))  # live: c0/0, c0/1, c1/0, c1/1
    # shard 1 owns conv c0: change one row, keep the other
    snap_c0 = _snap(spark, [
        ("c0", 0, "user", "keep-me", "", TS),
        ("c0", 1, "user", "SHARD0", "", TS),
    ])
    rep = sync_snapshot(t, snap_c0, batch_key="sh0",
                        where=[("conv_id", "=", "c0")])
    assert (rep["inserted"], rep["updated"], rep["deleted"]) == (0, 1, 0)
    # c1 rows are OUTSIDE the scope: untouched even though absent from
    # the shard's snapshot
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in read_transcripts(t).collect()}
    assert got == {("c0", 0): "keep-me", ("c0", 1): "SHARD0",
                   ("c1", 0): "delete-me", ("c1", 1): "also-keep"}
    # shard 2 owns c1: drop one row, add one
    snap_c1 = _snap(spark, [
        ("c1", 1, "user", "also-keep", "", TS),
        ("c1", 2, "user", "SHARD1-new", "", TS),
    ])
    rep = sync_snapshot(t, snap_c1, batch_key="sh1",
                        where=[("conv_id", "=", "c1")])
    assert (rep["inserted"], rep["updated"], rep["deleted"]) == (1, 0, 1)
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in read_transcripts(t).collect()}
    assert got == {("c0", 0): "keep-me", ("c0", 1): "SHARD0",
                   ("c1", 1): "also-keep", ("c1", 2): "SHARD1-new"}
    # guard: snapshot rows outside the scope fail fast
    with pytest.raises(ValueError, match="OUTSIDE the where scope"):
        sync_snapshot(t, snap_c0, batch_key="bad",
                      where=[("conv_id", "=", "c1")])
    # guard: non-key scope columns refused
    with pytest.raises(ValueError, match="key columns only"):
        sync_snapshot(t, snap_c0, batch_key="bad2",
                      where=[("text", "=", "keep-me")])
