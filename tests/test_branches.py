"""Named branches (Iceberg branch refs re-expressed over the pointer
model): O(1) fork via pointer hard-link, isolated multi-commit writes
through the unchanged apply_changes/merge path, fast-forward publish as
per-commit pointer links (crash-resumable), and GC/expiry that treat
every branch chain as a live root. The multi-commit generalization of
single-batch write-audit-publish (``stage_as``)."""

import datetime as dt
import glob
import json
import os

import pytest

from etl_rust_spark.lake.format import ConcurrentCommitError, IceliteTable
from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

CHANGE_SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)
TS = dt.datetime(2025, 1, 1)


def _batch(spark, conv, lsn0, n=4):
    rows = [
        (lsn0 + t, "I", conv, t, "user", f"{conv} t{t}", "", TS) for t in range(n)
    ]
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _mk(spark, tmp_path, n_buckets=4):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=n_buckets)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    return table


def test_branch_isolation_publish_and_ledger(spark, tmp_path):
    table = _mk(spark, tmp_path)
    br = table.create_branch("repair")
    apply_changes(br, _batch(spark, "c1", 100), batch_key="bb1", mode="mor")
    apply_changes(br, _batch(spark, "c2", 200), batch_key="bb2", mode="mor")

    # isolation: branch sees 3 commits, main still 1; shared history reads
    assert table.current_seq() == 1 and br.current_seq() == 3
    assert table.read().count() == 4 and br.read().count() == 12
    assert br.read(seq=1).count() == 4  # pre-fork seq resolves via main
    assert table.branches() == {"repair": {"fork_seq": 1, "tip_seq": 3}}
    # branch lineage covers its whole chain (pre-fork + branch commits)
    lin = {r["commit_seq"]: r["batch_key"] for r in br.lineage().collect()}
    assert lin == {1: "b0", 2: "bb1", 3: "bb2"}

    res = table.fast_forward("repair")
    assert res["published"] == 2 and table.current_seq() == 3
    assert table.read().count() == 12
    # the branch's exactly-once ledger rode the pointers into main
    assert (
        apply_changes(table, _batch(spark, "c2", 200), batch_key="bb2", mode="mor")
        is None
    )
    # published lineage is visible on main
    lin = {r["commit_seq"]: r["batch_key"] for r in table.lineage().collect()}
    assert lin[2] == "bb1" and lin[3] == "bb2"
    # idempotent re-publish is a no-op
    assert table.fast_forward("repair")["published"] == 0


def test_fast_forward_divergence_and_crash_resume(spark, tmp_path):
    table = _mk(spark, tmp_path)
    br = table.create_branch("b")
    apply_changes(br, _batch(spark, "c1", 100), batch_key="bb1", mode="mor")
    apply_changes(br, _batch(spark, "c2", 200), batch_key="bb2", mode="mor")

    # simulate a crash mid-publish: only the first branch commit linked
    bdir = os.path.join(table._manifest_dir, "branch-b")
    os.link(
        os.path.join(bdir, "snap-00000002.json"),
        os.path.join(table._manifest_dir, "snap-00000002.json"),
    )
    assert table.current_seq() == 2  # valid prefix
    res = table.fast_forward("b")  # resumes: verifies seq 2, links seq 3
    assert res["published"] == 1 and table.current_seq() == 3
    assert table.read().count() == 12

    # divergence: main advances after a fresh fork -> hard error
    br2 = table.create_branch("b2")
    apply_changes(br2, _batch(spark, "c3", 300), batch_key="bb3", mode="mor")
    apply_changes(table, _batch(spark, "c4", 400), batch_key="b4", mode="mor")
    with pytest.raises(ConcurrentCommitError, match="advanced past the fork"):
        table.fast_forward("b2")


def test_delete_branch_then_gc_reclaims_only_branch_files(spark, tmp_path):
    table = _mk(spark, tmp_path)
    br = table.create_branch("tmp")
    apply_changes(br, _batch(spark, "c9", 900), batch_key="bb9", mode="mor")
    branch_only = {f["path"] for f in br._files(br.pointer())} - {
        f["path"] for f in table._files(table.pointer())
    }
    assert branch_only

    # while the branch lives, GC must NOT touch its files even with no grace
    assert not set(table.remove_orphans(grace_sec=0.0)) & branch_only
    assert br.read().count() == 8

    table.delete_branch("tmp")
    removed = set(table.remove_orphans(grace_sec=0.0))
    assert branch_only <= removed
    before = sorted(map(tuple, table.read().collect()))
    assert len(before) == 4  # main unaffected
    with pytest.raises(FileNotFoundError):
        table.delete_branch("tmp")


def test_expiry_preserves_branch_pinned_files(spark, tmp_path):
    """Main compacts + expires while a branch still references the
    pre-compaction files: the branch chain pins them (and its ledger
    archives/manifests), so expiry must leave the branch fully readable."""
    table = _mk(spark, tmp_path)
    apply_changes(table, _batch(spark, "c1", 100), batch_key="b1", mode="mor")
    br = table.create_branch("audit")  # pins seq 2's file set
    pinned = {f["path"] for f in br._files(br.pointer())}

    apply_changes(table, _batch(spark, "c2", 200), batch_key="b2", mode="mor")
    table.compact()  # rewrites the live set; old files now unreferenced by main
    expired = set(table.expire_snapshots(keep_last=1))
    assert not expired & pinned
    assert br.read().count() == 8
    assert sorted(r["conv_id"] for r in br.read().select("conv_id").distinct().collect()) == ["c0", "c1"]


def test_branch_schema_evolution_flows_through_publish(spark, tmp_path):
    table = _mk(spark, tmp_path)
    br = table.create_branch("schema")
    evolved = _batch(spark, "c5", 500).selectExpr("*", "'m1' as meta")
    apply_changes(br, evolved, batch_key="bb5", mode="mor")
    assert "meta" in br.read().columns and "meta" not in table.read().columns

    table.fast_forward("schema")
    got = table.read()
    assert "meta" in got.columns
    metas = {r["conv_id"]: r["meta"] for r in got.select("conv_id", "meta").distinct().collect()}
    assert metas["c5"] == "m1" and metas["c0"] is None


def test_maintenance_is_main_only_on_branch_handles(spark, tmp_path):
    table = _mk(spark, tmp_path)
    br = table.create_branch("x")
    for op in (
        lambda: br.compact(),
        lambda: br.rebucket(8),
        lambda: br.rollback(1),
        lambda: br.tag_snapshot("t"),
        lambda: br.remove_orphans(),
        lambda: br.expire_snapshots(),
        lambda: br.create_branch("y"),
        lambda: br.fast_forward("x"),
        lambda: br.delete_branch("x"),
        lambda: apply_changes(
            br, _batch(spark, "z", 999), batch_key="s", mode="mor", stage_as="q"
        ),
    ):
        with pytest.raises(ValueError, match="MAIN ref only"):
            op()
    with pytest.raises(FileNotFoundError, match="no branch"):
        IceliteTable(spark, str(tmp_path / "t"), branch="nope")
    with pytest.raises(ValueError, match="invalid branch name"):
        table.create_branch("bad/name")
    with pytest.raises(FileExistsError):
        table.create_branch("x")


def test_read_changes_on_branch_spans_fork(spark, tmp_path):
    table = _mk(spark, tmp_path)
    br = table.create_branch("feed")
    apply_changes(br, _batch(spark, "c1", 100), batch_key="bb1", mode="mor")
    feed = br.read_changes(since_seq=0)
    per_seq = {
        r["_commit_seq"]: r["n"]
        for r in feed.groupBy("_commit_seq").count().withColumnRenamed("count", "n").collect()
    }
    assert per_seq == {1: 4, 2: 4}
