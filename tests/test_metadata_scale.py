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


def test_read_changes_incremental_feed(spark, tmp_path):
    """read_changes((a, b]) returns exactly the rows committed by those
    snapshots, tagged with _commit_seq — the downstream incremental
    consumer API. Compaction commits are transparent; CoW commits raise."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    for i in range(4):
        apply_changes(table, _batch(spark, i, n=10), batch_key=f"b{i}", mode="mor")
    feed = table.read_changes(since_seq=2).toPandas()
    assert set(feed["_commit_seq"]) == {3, 4}
    assert len(feed) == 20  # 10 winners per batch (keys distinct per batch? same keys -> 10 each)
    # each commit's rows carry that commit's lsn namespace
    assert (feed[feed["_commit_seq"] == 3]["__lsn"] // 1000 == 2).all()
    # compaction in range is skipped, not fed
    table.compact()
    feed2 = table.read_changes(since_seq=2).toPandas()
    assert set(feed2["_commit_seq"]) == {3, 4}
    # full-range feed replays to the table's final state
    full = table.read_changes(since_seq=0)
    from etl_rust_spark.lake.format import _dedup_by_seq
    from pyspark.sql import types as T

    ptr = table.pointer()
    schema = T.StructType.fromJson(ptr["schema"])
    replayed = _dedup_by_seq(
        full.drop("_commit_seq"), ptr["key_cols"], "__lsn", schema
    ).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    state = table.read().toPandas().sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)
    assert replayed.equals(state)
    # a CoW commit breaks per-file change identity -> must raise
    apply_changes(table, _batch(spark, 9, n=4), batch_key="cow", mode="cow")
    with pytest.raises(ValueError, match="copy-on-write"):
        table.read_changes(since_seq=0)
    # ...but a range ending before it still works
    assert set(table.read_changes(0, until_seq=4).toPandas()["_commit_seq"]) == {1, 2, 3, 4}


def test_partial_compaction_only_hot_buckets(spark, tmp_path):
    """compact(min_files_per_bucket=k) rewrites only over-fragmented
    buckets; cold buckets' files and manifests carry forward untouched,
    and the table state is unchanged."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    # conv-0..4 hash into some buckets; 6 commits fragment all touched buckets
    for i in range(6):
        apply_changes(table, _batch(spark, i, n=20), batch_key=f"b{i}", mode="mor")
    before_state = table.read().toPandas().sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)
    files_before = table.snapshot()["files"]
    per_bucket = {}
    for f in files_before:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    hot = {b for b, n in per_bucket.items() if n > 4}
    cold = set(per_bucket) - hot
    assert hot, "fixture should fragment at least one bucket"
    table.compact(min_files_per_bucket=4)
    files_after = table.snapshot()["files"]
    after_per_bucket = {}
    for f in files_after:
        after_per_bucket[f["bucket"]] = after_per_bucket.get(f["bucket"], 0) + 1
    for b in hot:
        assert after_per_bucket[b] < per_bucket[b]  # hot buckets folded
    cold_paths_before = {f["path"] for f in files_before if f["bucket"] in cold}
    cold_paths_after = {f["path"] for f in files_after if f["bucket"] in cold}
    assert cold_paths_before == cold_paths_after  # cold files untouched
    after_state = table.read().toPandas().sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)
    assert before_state.equals(after_state)
    # no-op when nothing exceeds the threshold
    seq = table.current_seq()
    table.compact(min_files_per_bucket=10_000)
    assert table.current_seq() == seq


def test_crash_between_metadata_writes_is_recoverable(spark, tmp_path, monkeypatch):
    """The pointer hard-link is the single commit point: a crash AFTER the
    data files + lineage + manifest are written but BEFORE the pointer
    lands must leave the table unchanged, and a retry of the same batch
    must succeed cleanly (orphans from the failed attempt are overwritten
    or ignored)."""
    from etl_rust_spark.lake import format as fmt

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    apply_changes(table, _batch(spark, 0, n=6), batch_key="b0", mode="mor")
    seq_before = table.current_seq()
    state_before = table.read().toPandas()

    real_commit_pointer = fmt._commit_pointer

    def crash(*a, **k):
        raise RuntimeError("simulated crash before pointer link")

    monkeypatch.setattr(fmt, "_commit_pointer", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        apply_changes(table, _batch(spark, 1, n=6), batch_key="b1", mode="mor")
    monkeypatch.setattr(fmt, "_commit_pointer", real_commit_pointer)

    # table unchanged: same seq, same state, ledger without b1
    fresh = IceliteTable.load(spark, str(tmp_path / "t"))
    assert fresh.current_seq() == seq_before
    assert fresh.read().toPandas().equals(state_before)
    assert not fresh.is_applied("b1")
    # lineage() filters the orphan record by commit_seq
    assert fresh.lineage().count() == seq_before

    # retry commits cleanly over the orphans
    rec = apply_changes(fresh, _batch(spark, 1, n=6), batch_key="b1", mode="mor")
    assert rec is not None and rec["commit_seq"] == seq_before + 1
    assert fresh.is_applied("b1")
    assert fresh.read().count() == 6  # same 6 keys upserted
    feed = fresh.read_changes(0).toPandas()
    assert sorted(set(feed["_commit_seq"])) == [1, 2]


def test_read_changes_expired_range_raises_clearly(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    for i in range(3):
        apply_changes(table, _batch(spark, i, n=6), batch_key=f"b{i}", mode="mor")
    table.compact()
    table.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        table.read_changes(0)


def test_file_skipping_stats_prune_within_bucket(spark, tmp_path):
    """Per-file kmin/kmax stats: a point lookup must read fewer files
    than its whole bucket holds when the bucket's files cover disjoint
    key ranges, and still return exactly the right rows."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=1)
    # one bucket, 3 commits with DISJOINT conv ranges -> 3 files, ranges tight
    for i, convs in enumerate([("a",), ("m",), ("z",)]):
        rows = [(f"conv-{c}{j}", j, "user", f"t{j}", None, None, i * 100 + j, "U")
                for c in convs for j in range(5)]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, "
                  "tool string, ts timestamp, lsn long, op string")
        apply_changes(table, df, batch_key=f"b{i}", mode="mor")
    files = table.snapshot()["files"]
    assert len(files) >= 3 and all("kmin" in f for f in files)
    got = table.read_keys(["conv-z0"]).toPandas()
    assert set(got["conv_id"]) == {"conv-z0"} and len(got) == 1
    # pruning check: only files whose range covers 'conv-z0' are eligible
    eligible = [f for f in files if f["kmin"] <= "conv-z0" <= f["kmax"]]
    assert len(eligible) < len(files)


def test_metadata_tables_files_and_snapshots(spark, tmp_path):
    """files_df / snapshots_df — the Iceberg-style metadata tables: pure
    pointer+manifest reads (no data I/O) that agree with describe() and
    survive evolution (write-time cols maps surface per file)."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    for i in range(3):
        apply_changes(table, _batch(spark, i, n=10), batch_key=f"b{i}",
                      mode="mor")
    table.rename_column("text", "body")

    files = table.files_df()
    d = table.describe()
    assert files.count() == d["n_files"]
    rows = files.collect()
    assert {r["kind"] for r in rows} <= {"base", "delta"}
    assert sum(r["rows"] for r in rows) == d["n_file_rows"]
    import json as _json

    stats = [_json.loads(r["stats"]) for r in rows if r["stats"]]
    assert stats and all("conv_id" in s for s in stats)
    # pre-rename files carry their write-time id→name map
    assert any(r["cols"] and "text" in r["cols"] for r in rows)

    snaps = table.snapshots_df().orderBy("seq").collect()
    assert [r["seq"] for r in snaps] == [0, 1, 2, 3, 4]
    assert snaps[-1]["n_files"] == d["n_files"]
    assert snaps[-1]["n_manifests"] == d["n_manifests"]
    assert snaps[0]["parent_seq"] is None and snaps[-1]["parent_seq"] == 3
    # expiry shrinks the retained-history view, not lineage
    table.expire_snapshots(keep_last=2)
    left = [r["seq"] for r in table.snapshots_df().orderBy("seq").collect()]
    assert left == [3, 4]
    # time-travel files view at a retained past snapshot
    assert table.files_df(seq=3).count() > 0


def test_populated_cow_seq_agg_lineage_and_state(spark, tmp_path):
    """r6: populated-CoW seq-agg merges take the no-persist path (narrow
    touched pre-pass + observe-carried counts) — lineage must record the
    same facts the stats pre-pass produced: touched = the BATCH's bucket
    set (even when old winners survive), n_changes/n_deletes = batch
    rows/tombstones, lsn bounds from the batch, and the merged state
    must equal the max-lsn replay."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    table.merge(
        _batch(spark, 0, n=20).withColumnRenamed("lsn", "__lsn"),
        batch_key="b0", seq_col="__lsn", mode="cow",
    )
    # second batch: 6 upserts + 2 tombstones, a strict key-subset of b0
    up = _batch(spark, 1, n=6).withColumnRenamed("lsn", "__lsn")
    tomb = (
        _batch(spark, 1, n=20).withColumnRenamed("lsn", "__lsn")
        .filter("turn_idx IN (18, 19)")
    )
    b1 = (
        up.withColumn("__deleted", F.lit(False))
        .unionByName(tomb.withColumn("__deleted", F.lit(True)))
    )
    rec = table.merge(b1, batch_key="b1", seq_col="__lsn", mode="cow")
    assert rec["n_changes"] == 8
    assert rec["n_deletes"] == 2
    assert rec["n_upserts"] == 6
    assert rec["lsn_min"] == 1000 and rec["lsn_max"] == 1019
    # touched = the batch's buckets (pre-write set), derived exactly like
    # the writer's layout
    from etl_rust_spark.lake.format import _bucket_expr

    want_buckets = sorted(
        r[0]
        for r in b1.select(_bucket_expr("conv_id", 4)).distinct().collect()
    )
    assert rec["touched_buckets"] == want_buckets
    # state equals the max-__lsn replay of both batches: live rows match
    # on full payload; tombstone winners surface flagged (read() contract)
    all_rows = (
        _batch(spark, 0, n=20).withColumnRenamed("lsn", "__lsn")
        .withColumn("__deleted", F.lit(False))
        .unionByName(b1)
    )
    w = all_rows.groupBy("conv_id", "turn_idx").agg(
        F.max(F.struct("__lsn", "__deleted", "text")).alias("w")
    )
    want_live = w.filter(~F.col("w.__deleted")).select(
        "conv_id", "turn_idx", F.col("w.__lsn").alias("__lsn"),
        F.col("w.text").alias("text"),
    )
    got = table.read()
    got_live = got.filter(
        ~F.coalesce(F.col("__deleted"), F.lit(False))
    ).select("conv_id", "turn_idx", "__lsn", "text")
    assert got_live.exceptAll(want_live).count() == 0
    assert want_live.exceptAll(got_live).count() == 0
    want_dead = {("conv-3", 18), ("conv-4", 19)}
    got_dead = {
        (r["conv_id"], r["turn_idx"])
        for r in got.filter(
            F.coalesce(F.col("__deleted"), F.lit(False))
        ).collect()
    }
    assert got_dead == want_dead
