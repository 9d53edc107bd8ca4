"""rewrite_manifests — metadata-only manifest consolidation (Iceberg's
rewrite_manifests procedure over the pointer model).

The property under test: after many MoR commits the pointer lists one
manifest per commit; consolidation must shrink that list WITHOUT moving
a data file, changing any read result, disturbing stats pruning /
field-id resolution / additive folds, or emitting anything into the
change feed. Reference analog: none — the reference sinks to Postgres
(example/src/main.rs:305-622); this is lake-format hygiene for the
10^6-commit horizon."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_rust_spark.lake import format as fmt
from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

TS = None
CHANGE_SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)


def _batch(spark, conv, lsn0, n=5):
    rows = [
        (lsn0 + t, "I", conv, t, "user", f"{conv} t{t} lsn{lsn0 + t}", "", TS)
        for t in range(n)
    ]
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _race_once(monkeypatch, interleave):
    orig = fmt._commit_pointer
    state = {"armed": True}

    def racing(manifest_dir, seq, pointer):
        if state["armed"]:
            state["armed"] = False
            interleave()
        return orig(manifest_dir, seq, pointer)

    monkeypatch.setattr(fmt, "_commit_pointer", racing)


def _table_with_commits(spark, path, n_commits=6):
    table = create_transcript_table(spark, path, n_buckets=4)
    for i in range(n_commits):
        apply_changes(
            table, _batch(spark, f"c{i % 3}", i * 100),
            batch_key=f"b{i}", mode="mor",
        )
    return table


def test_rewrite_consolidates_without_touching_data(spark, tmp_path):
    """Manifest count collapses, data paths/kinds/stats carry over
    verbatim, and every read surface (full, pruned, keys, time travel)
    is unchanged."""
    table = _table_with_commits(spark, str(tmp_path / "t"), n_commits=6)
    ptr_before = table.pointer()
    files_before = sorted(
        (e["path"], e.get("kind", "base")) for e in table._files(ptr_before)
    )
    before_pdf = table.read().toPandas()
    seq_before = table.current_seq()
    assert len(ptr_before["manifests"]) == 6

    snap = table.rewrite_manifests()
    assert len(snap["manifests"]) == 1
    ptr = table.pointer()
    # entries carried over verbatim — same paths, same delta/base kinds
    assert (
        sorted((e["path"], e.get("kind", "base")) for e in table._files(ptr))
        == files_before
    )
    # no data file was written or moved by the rewrite
    assert ptr["seq"] == seq_before + 1
    after_pdf = table.read().toPandas()
    key = ["conv_id", "turn_idx"]
    assert (
        before_pdf.sort_values(key).reset_index(drop=True)
        .equals(after_pdf.sort_values(key).reset_index(drop=True))
    )
    # bucket-pruned read still skips files (stats/bucket summaries intact)
    pruned = table.read(where=[("conv_id", "=", "c0")])
    assert 0 < len(pruned.inputFiles()) < len(files_before)
    assert pruned.filter(F.col("conv_id") != "c0").count() == 0
    # time travel to the pre-rewrite snapshot resolves via old manifests
    tt = table.read(seq=seq_before).toPandas()
    assert len(tt) == len(before_pdf)
    # fresh loader (no warm caches) sees the same table
    fresh = IceliteTable.load(spark, str(tmp_path / "t"))
    assert fresh.read().count() == len(before_pdf)


def test_rewrite_respects_target_chunking_and_noop(spark, tmp_path):
    table = _table_with_commits(spark, str(tmp_path / "t"), n_commits=6)
    n_files = len(table._files(table.pointer()))
    k = max(1, n_files // 3)
    snap = table.rewrite_manifests(target_files_per_manifest=k)
    want = -(-n_files // k)
    assert len(snap["manifests"]) == want
    # each consolidated manifest holds ≤ k entries and a narrow,
    # sorted bucket summary (entries grouped by bucket)
    for m in snap["manifests"]:
        with open(os.path.join(table._manifest_dir, m["name"])) as f:
            entries = json.load(f)
        assert len(entries) <= k
        assert m["buckets"] == sorted({e["bucket"] for e in entries})
    # a second rewrite at the same target is a pure no-op: no new commit
    seq = table.current_seq()
    table.rewrite_manifests(target_files_per_manifest=k)
    assert table.current_seq() == seq


def test_change_feed_and_batch_source_skip_the_rewrite(spark, tmp_path):
    """source='rewrite_manifests' commits are not changes: the feed over
    a range containing one is identical to the feed before it, and the
    batch format('icelite') read agrees."""
    table = _table_with_commits(spark, str(tmp_path / "t"), n_commits=4)
    feed_before = (
        table.read_changes(0).orderBy("conv_id", "turn_idx", "__lsn").toPandas()
    )
    table.rewrite_manifests()
    feed_after = (
        table.read_changes(0).orderBy("conv_id", "turn_idx", "__lsn").toPandas()
    )
    assert feed_before.equals(feed_after)
    # preimage feed composes read_changes — same skip
    pre = table.read_changes_with_preimage(0)
    assert pre.count() == len(feed_after)
    # the registered batch source resolves the same rows
    from etl_rust_spark.sources.icelite_source import register_icelite_source

    register_icelite_source(spark)
    src = (
        spark.read.format("icelite")
        .option("path", str(tmp_path / "t"))
        .option("sinceSeq", "0")
        .load()
    )
    assert src.count() == len(feed_after)


def test_rewrite_rebases_over_concurrent_append(spark, tmp_path, monkeypatch):
    """An append landing mid-rewrite wins the seq race; the rewrite
    rebases and the winner's manifest survives consolidation untouched."""
    table = _table_with_commits(spark, str(tmp_path / "t"), n_commits=4)
    rival = IceliteTable.load(spark, str(tmp_path / "t"))
    _race_once(
        monkeypatch,
        lambda: apply_changes(rival, _batch(spark, "c-rival", 9000),
                              batch_key="b-rival", mode="mor"),
    )
    snap = table.rewrite_manifests()
    # rival took seq 5; the rewrite rebased onto it at seq 6
    assert snap["seq"] == 6
    names = [m["name"] for m in snap["manifests"]]
    # consolidated manifest(s) + the rival's own manifest both live
    assert any("-rw" in n for n in names)
    assert any("manifest-00000005" in n for n in names)
    got = table.read()
    assert got.filter(F.col("conv_id") == "c-rival").count() == 5
    assert table.is_applied("b-rival")


def test_rewrite_preserves_additive_fold(spark, tmp_path):
    """Additive (agg_cols) tables fold per-key partials on read, keyed
    off entry delta-marking — consolidation must not disturb it."""
    schema = spark.createDataFrame(
        [], "k string, n long, lsn long"
    ).schema
    table = IceliteTable.create(
        spark, str(tmp_path / "agg"), schema,
        key_cols=["k"], bucket_key="k", n_buckets=2, order_cols=["k"],
        seq_col="lsn", agg_cols={"n": "sum"},
    )
    for i in range(4):
        df = spark.createDataFrame(
            [("a", 1, i, "U"), ("b", 2, i, "U")],
            "k string, n long, lsn long, op string",
        )
        table.merge(df, batch_key=f"p{i}", seq_col="lsn", mode="mor")
    before = {r["k"]: r["n"] for r in table.read().collect()}
    assert before == {"a": 4, "b": 8}
    snap = table.rewrite_manifests()
    assert len(snap["manifests"]) == 1
    assert {r["k"]: r["n"] for r in table.read().collect()} == before


def test_rewrite_is_main_only_and_expiry_reclaims_old_manifests(
    spark, tmp_path
):
    table = _table_with_commits(spark, str(tmp_path / "t"), n_commits=4)
    table.create_branch("dev")
    branch = table.branch_table("dev")
    with pytest.raises(ValueError, match="MAIN"):
        branch.rewrite_manifests()
    old_names = [m["name"] for m in table.pointer()["manifests"]]
    table.rewrite_manifests()
    removed = table.expire_snapshots(keep_last=1)
    # the superseded per-commit manifests are reclaimable once no
    # retained snapshot references them... unless the branch pins them
    assert all(
        os.path.exists(os.path.join(table._manifest_dir, n))
        for n in old_names
    )  # branch forked at tip → still pinned
    table.delete_branch("dev")
    # with the branch gone, the superseded manifests are referenced by no
    # pointer in any chain — orphan GC reclaims them
    table.remove_orphans(grace_sec=0.0)
    gone = [
        n for n in old_names
        if not os.path.exists(os.path.join(table._manifest_dir, n))
    ]
    assert gone == old_names
    assert table.read().count() > 0
    assert removed is not None
