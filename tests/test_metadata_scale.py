"""Icelite v2 metadata-scaling guarantees: bounded pointer, archived
exactly-once ledger, manifest-diff expiry, and the delete-op guard.

These are the properties that keep METADATA (not data) from being the
first wall at 10^6 commits: per-commit write cost must be O(files added)
+ O(pointer), never O(all files) or O(all commits)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_rust_spark.lake.format import _TAIL_MAX, IceliteTable
from etl_rust_spark.operators.apply import apply_changes, create_transcript_table


def _batch(spark, i, n=20):
    rows = [
        (f"conv-{j % 5}", j, "user", f"text b{i} r{j}", None, None, i * 1000 + j, "U")
        for j in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, lsn long, op string",
    )


def test_pointer_stays_small_and_ledger_archives(spark, tmp_path):
    """After many commits the pointer must hold ≤ _TAIL_MAX inline ledger
    keys (older keys live in immutable archive chunks), while
    applied_batches() still resolves the FULL history and is_applied
    answers for both tail and archived keys."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    n_commits = _TAIL_MAX + 10
    for i in range(n_commits):
        apply_changes(table, _batch(spark, i, n=5), batch_key=f"b{i}", mode="mor")
    ptr = table.pointer()
    assert len(ptr["applied_tail"]) <= _TAIL_MAX
    assert len(ptr["applied_archives"]) >= 1
    assert ptr["applied_count"] == n_commits
    ledger = table.applied_batches()
    assert len(ledger) == n_commits
    assert ledger["b0"] == 1 and ledger[f"b{n_commits - 1}"] == n_commits
    # both archived and tail keys dedupe replays
    fresh = IceliteTable.load(spark, str(tmp_path / "t"))
    assert fresh.is_applied("b0") and fresh.is_applied(f"b{n_commits - 1}")
    assert not fresh.is_applied("never-applied")
    assert apply_changes(table, _batch(spark, 0, n=5), batch_key="b0", mode="mor") is None


def test_per_commit_metadata_is_delta_sized(spark, tmp_path):
    """Each MoR commit adds ONE manifest holding only that commit's files;
    untouched manifests carry forward by reference (same file, not a
    rewrite). Compaction folds everything back to one manifest."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    names = []
    for i in range(4):
        apply_changes(table, _batch(spark, i), batch_key=f"b{i}", mode="mor")
        ptr = table.pointer()
        names.append([m["name"] for m in ptr["manifests"]])
    # commit k's manifest list = commit k-1's list + exactly one new entry
    for prev, cur in zip(names, names[1:]):
        assert cur[: len(prev)] == prev and len(cur) == len(prev) + 1
    # manifest size is O(files in that commit), not O(table)
    last = table.pointer()["manifests"][-1]
    with open(os.path.join(table._manifest_dir, last["name"])) as f:
        entries = json.load(f)
    assert len(entries) == last["n_files"] <= 8
    table.compact()
    assert len(table.pointer()["manifests"]) == 1


def test_expire_snapshots_manifest_diff(spark, tmp_path):
    """Expiry diffs manifest file-lists: dead data files AND dead metadata
    (manifests, superseded pointers) are removed, live ones survive, and
    the table still reads correctly."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    for i in range(6):
        apply_changes(table, _batch(spark, i), batch_key=f"b{i}", mode="mor")
    table.compact()  # seq 7: pre-compaction delta files become dead
    delta_files = {f["path"] for f in table.snapshot(6)["files"]}
    removed = table.expire_snapshots(keep_last=1)  # keep only the compacted snap
    live = {f["path"] for f in table.snapshot()["files"]}
    assert delta_files - live <= set(removed)  # every dead delta really deleted
    assert not (set(removed) & live)  # never a live file
    for p in live:
        assert os.path.exists(p)
    with pytest.raises(FileNotFoundError):
        table.pointer(1)  # expired pointer gone
    n = table.read().count()
    assert n == 20  # 5 convs x varying turns -> full final state intact
    # lineage survives expiry (it is the permanent audit table)
    assert table.lineage().count() == 7


def test_seq_agg_merge_rejects_raw_deletes(spark, tmp_path):
    """ADVICE fix: op='D' without a __deleted tombstone column must raise
    in seq-agg and MoR modes (it would be silently dropped), while the
    anti-join CoW path still handles raw deletes correctly."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    up = _batch(spark, 0, n=6).withColumnRenamed("lsn", "__lsn")
    table.merge(up, batch_key="b0", seq_col="__lsn", mode="mor")
    deletes = (
        _batch(spark, 1, n=3)
        .withColumn("op", F.lit("D"))
        .withColumnRenamed("lsn", "__lsn")
    )
    with pytest.raises(ValueError, match="tombstone"):
        table.merge(deletes, batch_key="bD", seq_col="__lsn", mode="cow")
    with pytest.raises(ValueError, match="tombstone"):
        table.merge(deletes, batch_key="bD2", seq_col="__lsn", mode="mor")
    # failed merges never committed
    assert "bD" not in table.applied_batches()
    # anti-join path (no seq_col): raw deletes are applied
    before = table.read().count()
    table.merge(deletes.drop("__lsn"), batch_key="bA")
    assert table.read().count() == before - 3
