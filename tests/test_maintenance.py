"""Round-3 maintenance surface: time travel by timestamp (seq_as_of /
read(as_of=...)), crash-orphan cleanup (remove_orphans), and bucket-count
evolution (rebucket) — the operations a long-lived 100 TB table needs
beyond compaction and snapshot expiry."""

import datetime as dt
import json
import os
import time

import pytest

import etl_rust_spark.lake.format as fmt
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


def test_time_travel_by_timestamp(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    time.sleep(0.15)
    t_mid = time.time()
    time.sleep(0.15)
    apply_changes(table, _batch(spark, "c1", 100), batch_key="b1", mode="mor")

    assert table.seq_as_of(t_mid) == 1
    assert table.read(as_of=t_mid).count() == 4
    assert table.read(as_of=time.time()).count() == 8
    # datetime form (UTC)
    as_dt = dt.datetime.utcfromtimestamp(t_mid)
    assert table.read(as_of=as_dt).count() == 4
    with pytest.raises(ValueError, match="no snapshot"):
        table.seq_as_of(0.0)  # before the table existed
    with pytest.raises(ValueError, match="at most one"):
        table.read(seq=1, as_of=t_mid)


def test_remove_orphans_cleans_crash_debris(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    apply_changes(table, _batch(spark, "c1", 100), batch_key="b1", mode="mor")
    before = sorted(map(tuple, table.read().collect()))

    # plant crash debris: an aborted attempt's data dir, manifest, and
    # lineage record for a sequence that never committed
    base = str(tmp_path / "t")
    orphan_dir = os.path.join(base, "data", "commit-00000099-deadbeef", "__bucket=0")
    os.makedirs(orphan_dir)
    orphan_parquet = os.path.join(orphan_dir, "part-000.parquet")
    with open(orphan_parquet, "wb") as f:
        f.write(b"not really parquet")
    orphan_manifest = os.path.join(base, "_manifests", "manifest-00000099-deadbeef.json")
    with open(orphan_manifest, "w") as f:
        json.dump([], f)
    orphan_lineage = os.path.join(base, "_lineage", "lineage-00000099-deadbeef.json")
    with open(orphan_lineage, "w") as f:
        json.dump({"commit_seq": 99}, f)
    past = time.time() - 7200
    for p in (orphan_parquet, orphan_manifest, orphan_lineage,
              orphan_dir, os.path.dirname(orphan_dir)):
        os.utime(p, (past, past))

    removed = table.remove_orphans(grace_sec=3600)
    assert orphan_parquet in removed
    assert orphan_manifest in removed
    assert orphan_lineage in removed
    assert not os.path.exists(os.path.dirname(orphan_dir))  # empty dir dropped
    # live state and feed untouched
    assert sorted(map(tuple, table.read().collect())) == before
    assert table.read_changes(since_seq=0).count() == 8


def test_remove_orphans_respects_grace_window(spark, tmp_path):
    """A FRESH unreferenced file (an in-flight writer's) must survive."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    base = str(tmp_path / "t")
    fresh_dir = os.path.join(base, "data", "commit-00000042-cafecafe", "__bucket=0")
    os.makedirs(fresh_dir)
    fresh = os.path.join(fresh_dir, "part-000.parquet")
    with open(fresh, "wb") as f:
        f.write(b"in flight")
    removed = table.remove_orphans(grace_sec=3600)
    assert fresh not in removed and os.path.exists(fresh)


def test_rebucket_grows_bucket_count(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    apply_changes(table, _batch(spark, "c1", 100), batch_key="b1", mode="mor")
    before = sorted(map(tuple, table.read().collect()))

    table.rebucket(16)
    ptr = table.pointer()
    assert ptr["n_buckets"] == 16
    assert sorted(map(tuple, table.read().collect())) == before
    files = table._files(ptr)
    assert all(f["bucket"] < 16 for f in files)
    assert {f.get("kind", "base") for f in files} == {"base"}  # full rewrite
    # point lookups use the NEW layout correctly
    assert table.read_keys(["c0"]).count() == 4
    # subsequent ingest lands in the new layout and stays readable
    apply_changes(table, _batch(spark, "c2", 200), batch_key="b2", mode="mor")
    assert table.read().count() == 12
    assert table.read_keys(["c2"]).count() == 4


def test_rebucket_refuses_concurrent_commit(spark, tmp_path, monkeypatch):
    """Mixing two bucket layouts in one snapshot would corrupt bucket
    pruning — a commit landing mid-rebucket must fail the rebucket."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    rival = IceliteTable.load(spark, str(tmp_path / "t"))
    orig = fmt._commit_pointer
    state = {"armed": True}

    def racing(manifest_dir, seq, pointer):
        if state["armed"]:
            state["armed"] = False
            apply_changes(rival, _batch(spark, "c1", 100), batch_key="b1", mode="mor")
        return orig(manifest_dir, seq, pointer)

    monkeypatch.setattr(fmt, "_commit_pointer", racing)
    with pytest.raises(ConcurrentCommitError):
        table.rebucket(8)
    # rival's commit stands; layout unchanged
    assert table.pointer()["n_buckets"] == 2
    assert table.read().count() == 8


def test_snapshot_tags_pin_and_survive_expiry(spark, tmp_path):
    """Tags (Iceberg-style named snapshot pins): read(tag=) resolves the
    pinned state, expire_snapshots never expires a tagged snapshot, and
    dropping the tag releases it for the next expiry."""
    import pytest

    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table
    from etl_rust_spark.lake.format import IceliteTable

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    for i in range(5):
        apply_changes(
            t,
            spark.createDataFrame(
                [(i + 1, "I", f"c{i}", 0, "user", f"v{i}", "", None)],
                "lsn long, op string, conv_id string, turn_idx int, role string,"
                " text string, tool string, ts timestamp",
            ),
            batch_key=f"b{i}",
            mode="mor",
        )
    pinned_seq = t.tag_snapshot("train-run-1", seq=2)
    assert t.tags() == {"train-run-1": 2}
    assert t.read(tag="train-run-1").count() == t.read(seq=pinned_seq).count() == 2

    t.expire_snapshots(keep_last=1)
    # the tagged snapshot (and its files) survived expiry
    assert t.read(tag="train-run-1").count() == 2
    assert t.read().count() == 5

    with pytest.raises(ValueError, match="at most one"):
        t.read(seq=2, tag="train-run-1")
    with pytest.raises(FileNotFoundError):
        t.read(tag="nope")

    t.drop_tag("train-run-1")
    t.expire_snapshots(keep_last=1)
    import os
    assert not os.path.exists(t._pointer_path(2))  # released pin expired
    assert t.read().count() == 5


def test_crash_debris_at_committed_seq_cannot_corrupt_change_feed(spark, tmp_path):
    """SIGKILL debris from a LOSING commit attempt at an already-committed
    sequence (same glob pattern, different uuid token) must be invisible:
    the pointer records its own lineage/manifest names, so read_changes
    reads the winner's record, and remove_orphans GCs the debris."""
    import json
    import os

    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    sch = ("lsn long, op string, conv_id string, turn_idx int, role string,"
           " text string, tool string, ts timestamp")
    for i in range(3):
        apply_changes(
            t, spark.createDataFrame(
                [(i + 1, "I", f"c{i}", 0, "user", f"v{i}", "", None)], sch),
            batch_key=f"b{i}", mode="mor",
        )
    s = t.current_seq()
    feed_before = sorted(
        r["conv_id"] for r in t.read_changes(since_seq=0).collect()
    )
    # plant a losing attempt's debris AT the committed seq: a lineage
    # record claiming the commit was a compaction, plus an orphan manifest
    with open(os.path.join(t._lineage_dir, f"lineage-{s:08d}-deadbeef.json"), "w") as f:
        json.dump({"commit_seq": s, "source": "compact", "files_removed": 0,
                   "files_added": 0, "batch_key": None}, f)
    with open(os.path.join(t._manifest_dir, f"manifest-{s:08d}-deadbeef.json"), "w") as f:
        json.dump([{"path": "/nonexistent.parquet", "bucket": 0, "rows": 1}], f)

    # the feed is unchanged: pointer-recorded names win over the glob
    assert sorted(
        r["conv_id"] for r in t.read_changes(since_seq=0).collect()
    ) == feed_before
    rec = t._lineage_record(s)
    assert rec["source"].startswith("stream") or rec["source"] == "batch"

    removed = t.remove_orphans(grace_sec=0.0)
    names = {os.path.basename(p) for p in removed}
    assert f"lineage-{s:08d}-deadbeef.json" in names
    assert f"manifest-{s:08d}-deadbeef.json" in names
    # and the table itself is untouched
    assert t.read().count() == 3


def test_reader_snapshot_isolation_across_concurrent_commits(spark, tmp_path):
    """A DataFrame obtained from read() is pinned to the snapshot current
    at call time: commits (and even a compaction) landing afterwards do
    not change what it returns when finally collected — snapshot
    isolation within the retention window (files are only deleted by
    expire/remove_orphans, never by the commits themselves)."""
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, "c1", 10), batch_key="b0", mode="mor")
    pinned = t.read()  # file list resolved NOW

    apply_changes(t, _batch(spark, "c2", 20), batch_key="b1", mode="mor")
    apply_changes(
        t,
        spark.createDataFrame(
            [(99, "U", "c1", 0, "user", "OVERWRITTEN", "", TS)], CHANGE_SCHEMA
        ),
        batch_key="b2",
        mode="mor",
    )
    t.compact()

    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in pinned.collect()}
    assert set(c for c, _ in got) == {"c1"}          # c2 invisible
    assert got[("c1", 0)] == "c1 t0"                 # pre-update text
    live = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()}
    assert live[("c1", 0)] == "OVERWRITTEN" and ("c2", 0) in live


def test_change_feed_with_preimages(spark, tmp_path):
    """Debezium/Delta-CDF-style before-images on the change feed: every
    change row carries the key's previous winning state (NULL on first
    appearance), exact even when a LATE lower-LSN change arrives after
    the state that beats it."""
    from pyspark.sql import functions as F

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    mk = lambda lsn, op, text: spark.createDataFrame(  # noqa: E731
        [(lsn, op, "c1", 0, "user", text, "", TS)], CHANGE_SCHEMA
    )
    apply_changes(t, mk(10, "I", "v1"), batch_key="b0", mode="mor")       # seq 1
    apply_changes(t, mk(30, "U", "v3"), batch_key="b1", mode="mor")       # seq 2
    apply_changes(t, mk(20, "U", "late-loser"), batch_key="b2", mode="mor")  # seq 3
    apply_changes(t, mk(40, "D", ""), batch_key="b3", mode="mor")         # seq 4

    feed = t.read_changes_with_preimage(0).orderBy("_commit_seq")
    rows = feed.select(
        "_commit_seq", "text", "__lsn",
        F.col("_before.__lsn").alias("prev_lsn"),
        F.col("_before.text").alias("prev_text"),
        F.col("_before.__deleted").alias("prev_deleted"),
    ).collect()
    got = [(r["_commit_seq"], r["__lsn"], r["prev_lsn"], r["prev_text"]) for r in rows]
    assert got == [
        (1, 10, None, None),        # insert: no before-image
        (2, 30, 10, "v1"),          # update sees v1
        (3, 20, 30, "v3"),          # LATE loser: before = the state that beat it
        (4, 40, 30, "v3"),          # delete sees the still-winning v3
    ]
    assert rows[3]["prev_deleted"] is False

    # incremental window: preimage of the delete alone, resuming at seq 3
    inc = t.read_changes_with_preimage(3).collect()
    assert len(inc) == 1 and inc[0]["_before"]["text"] == "v3"

    # tombstone states surface as before-images on re-insert
    apply_changes(t, mk(50, "I", "reborn"), batch_key="b4", mode="mor")
    last = t.read_changes_with_preimage(4).collect()
    assert len(last) == 1
    assert last[0]["_before"]["__deleted"] is True and last[0]["_before"]["__lsn"] == 40


def test_describe_reports_metadata_only_health(spark, tmp_path, capsys):
    """describe(): file/row/byte totals, bucket balance, and delta
    backlog from metadata alone — and compaction visibly shrinks the
    delta backlog it reports. Driven through the CLI too."""
    from etl_rust_spark.__main__ import main

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, "c1", 10), batch_key="b0", mode="mor")
    apply_changes(t, _batch(spark, "c2", 20), batch_key="b1", mode="mor")
    d = t.describe()
    assert d["n_file_rows"] == 8 and d["n_files"] > 0
    assert d["n_delta_files"] > 0  # second commit appended deltas
    assert d["total_bytes"] > 0 and d["max_file_bytes"] >= d["avg_file_bytes"]
    assert d["applied_batches"] == 2 and d["n_buckets"] == 4
    t.compact()
    d2 = t.describe()
    assert d2["n_delta_files"] == 0 and d2["n_file_rows"] == 8

    assert main(["describe", "--table", str(tmp_path / "t")]) == 0
    import json
    out = json.loads(capsys.readouterr().out)
    assert out["seq"] == t.current_seq() and out["n_delta_files"] == 0


def test_preimage_feed_survives_column_add_in_window(spark, tmp_path):
    """ADVICE r04: a column ADDED by a commit inside the preimage window
    must not break the base∪feed union — the base snapshot (schema at
    since_seq) is null-filled to the until pointer's schema, mirroring
    merge's upsert column alignment."""
    from pyspark.sql import functions as F

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    mk = lambda lsn, op, text: spark.createDataFrame(  # noqa: E731
        [(lsn, op, "c1", 0, "user", text, "", TS)], CHANGE_SCHEMA
    )
    apply_changes(t, mk(10, "I", "v1"), batch_key="b0", mode="mor")  # seq 1
    wide = mk(20, "U", "v2").withColumn("lang", F.lit("en"))
    apply_changes(t, wide, batch_key="b1", mode="mor")  # seq 2 ADDS lang
    rows = t.read_changes_with_preimage(1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["text"] == "v2" and r["lang"] == "en"
    # before-image: the pre-evolution winner, lang null-filled
    assert r["_before"]["text"] == "v1" and r["_before"]["lang"] is None


def test_preimage_feed_resolves_rename_in_window(spark, tmp_path):
    """A column RENAMED inside the preimage window resolves through its
    field id: the base snapshot's old-name data surfaces as before-state
    under the NEW name instead of a silent null or an AnalysisException."""
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    mk = lambda lsn, op, text: spark.createDataFrame(  # noqa: E731
        [(lsn, op, "c1", 0, "user", text, "", TS)], CHANGE_SCHEMA
    )
    apply_changes(t, mk(10, "I", "v1"), batch_key="b0", mode="mor")  # seq 1
    t.rename_column("text", "body")  # seq 2
    apply_changes(
        t,
        mk(20, "U", "v2").withColumnRenamed("text", "body"),
        batch_key="b1",
        mode="mor",
    )  # seq 3
    rows = t.read_changes_with_preimage(1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["body"] == "v2"
    assert r["_before"]["body"] == "v1" and r["_before"]["__lsn"] == 10


# ---------------------------------------------------------------- rollback

def test_rollback_restores_state_and_ledger(spark, tmp_path):
    """rollback(to_seq) is a metadata-only commit: state reverts exactly,
    history stays time-travelable, and the exactly-once ledger reverts
    WITH the state so undone batches are re-appliable."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="good", mode="mor")
    good_seq = table.current_seq()
    good_state = {(r["conv_id"], r["turn_idx"], r["text"])
                  for r in table.read().collect()}

    apply_changes(table, _batch(spark, "c1", 100), batch_key="bad", mode="mor")
    bad_seq = table.current_seq()
    assert table.is_applied("bad")

    rec = table.rollback(good_seq)
    assert rec["source"] == "rollback"
    assert rec["rolled_back_to"] == good_seq
    assert table.current_seq() == bad_seq + 1
    # exact state reversion, metadata-only
    assert {(r["conv_id"], r["turn_idx"], r["text"])
            for r in table.read().collect()} == good_state
    assert rec["files_added"] == 0 and rec["files_removed"] == 0
    # history preserved: the bad commit is still inspectable
    assert table.read(seq=bad_seq).count() == 8
    # ledger reverted: the undone batch re-applies instead of deduping
    assert not table.is_applied("bad")
    assert table.is_applied("good")
    apply_changes(table, _batch(spark, "c1", 100), batch_key="bad", mode="mor")
    assert table.read().count() == 8

    # pointer records the reversion
    assert table.pointer(bad_seq + 1)["rolled_back_to"] == good_seq


def test_rollback_validation_and_feed_fail_fast(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    apply_changes(table, _batch(spark, "c1", 100), batch_key="b1", mode="mor")
    cur = table.current_seq()

    with pytest.raises(ValueError, match="already at"):
        table.rollback(cur)
    with pytest.raises(ValueError, match="future"):
        table.rollback(cur + 5)

    table.rollback(1)
    rb_seq = table.current_seq()
    # a feed range containing the rollback fails loud — never a silent
    # skip (consumers cannot un-receive the reverted rows)
    with pytest.raises(ValueError, match="rollback"):
        table.read_changes(0).count()
    # resuming at/after the rollback commit works
    assert table.read_changes(rb_seq).count() == 0
    apply_changes(table, _batch(spark, "c2", 200), batch_key="b2", mode="mor")
    assert table.read_changes(rb_seq).count() == 4


def test_rollback_across_rebucket_restores_layout(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    before = table.current_seq()
    table.rebucket(8)
    assert table.pointer()["n_buckets"] == 8
    table.rollback(before)
    ptr = table.pointer()
    assert ptr["n_buckets"] == 4  # write-time layout of the target's files
    assert table.read().count() == 4
    # and ingest continues under the restored layout
    apply_changes(table, _batch(spark, "c1", 100), batch_key="b1", mode="mor")
    assert table.read().count() == 8


def test_streaming_source_fails_fast_on_rollback(spark, tmp_path):
    from etl_rust_spark.sources import register_icelite_source

    register_icelite_source(spark)
    tpath = str(tmp_path / "t")
    table = create_transcript_table(spark, tpath, n_buckets=4)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    table.rollback(0)

    q = (
        spark.readStream.format("icelite").option("path", tpath).load()
        .writeStream.foreachBatch(lambda df, _e: df.count())
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="rollback"):
        q.awaitTermination()


def test_delete_where_purges_keys_and_feeds_consumers(spark, tmp_path):
    """Predicate delete (round 5): tombstones for the matched keys land as
    a normal MoR commit — final view drops them, survivors intact, the
    change feed delivers the deletes, and a genuinely later CDC event
    still resurrects the key."""
    from pyspark.sql import functions as F

    from etl_rust_spark.operators.apply import read_transcripts

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(table, _batch(spark, "gone", 0, n=3), batch_key="b0", mode="mor")
    apply_changes(table, _batch(spark, "kept", 100, n=2), batch_key="b1", mode="mor")

    rec = table.delete_where([("conv_id", "=", "gone")], batch_key="gdpr1")
    assert rec is not None and rec["n_deletes"] == 3
    got = read_transcripts(table).select("conv_id").distinct().collect()
    assert {r["conv_id"] for r in got} == {"kept"}

    # the feed carries the tombstones like any other change
    feed = table.read_changes(rec["commit_seq"] - 1, rec["commit_seq"])
    assert feed.count() == 3
    assert feed.filter(F.col("__deleted")).count() == 3

    # idempotent redelivery
    assert table.delete_where([("conv_id", "=", "gone")], batch_key="gdpr1") is None
    # nothing matched -> no commit
    seq = table.current_seq()
    assert table.delete_where([("conv_id", "=", "nope")]) is None
    assert table.current_seq() == seq

    # a later CDC event (higher lsn) beats the tombstone
    apply_changes(table, _batch(spark, "gone", 500, n=1), batch_key="b2", mode="mor")
    got = {r["conv_id"] for r in
           read_transcripts(table).select("conv_id").distinct().collect()}
    assert got == {"kept", "gone"}

    # purge pipeline: compact folds the tombstones; the deleted payload
    # bytes are gone from the live files (tombstone rows keep null text)
    table.compact()
    live = table.read()
    dead = live.filter(F.coalesce(F.col("__deleted"), F.lit(False)))
    assert dead.filter(F.col("text").isNotNull()).count() == 0


def test_delete_where_guards(spark, tmp_path):
    import pyspark.sql.types as T

    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.create(
        spark, str(tmp_path / "agg"),
        T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("__lsn", T.LongType()),
        ]),
        key_cols=["k"], bucket_key="k", n_buckets=2, order_cols=["k"],
        seq_col="__lsn", agg_cols={"n": "sum"},
    )
    with pytest.raises(ValueError, match="not supported on additive"):
        t.delete_where([("k", "=", "a")])


def test_update_where_rewrites_rows_and_feeds_consumers(spark, tmp_path):
    """Predicate update (UPDATE ... SET ... WHERE as a CDC event): the
    rewritten winners land as a normal MoR commit — matched rows show
    the new values, survivors untouched, the change feed delivers the
    updates, SET expressions see the OLD row (simultaneous assignment),
    and a genuinely later CDC event still beats the rewrite."""
    from pyspark.sql import functions as F

    from etl_rust_spark.operators.apply import read_transcripts

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(table, _batch(spark, "pii", 0, n=3), batch_key="b0", mode="mor")
    apply_changes(table, _batch(spark, "ok", 100, n=2), batch_key="b1", mode="mor")

    rec = table.update_where(
        [("conv_id", "=", "pii")],
        {"text": "concat('<redacted:', cast(length(text) as string), '>')"},
        batch_key="redact1",
    )
    assert rec is not None and rec["n_upserts"] == 3 and rec["n_deletes"] == 0
    got = read_transcripts(table)
    assert got.count() == 5  # no rows added or removed
    pii = {r["text"] for r in got.filter(F.col("conv_id") == "pii").collect()}
    assert pii == {"<redacted:6>"}  # old text was 'pii tN' (6 chars)
    ok = {r["text"] for r in got.filter(F.col("conv_id") == "ok").collect()}
    assert ok == {"ok t0", "ok t1"}  # survivors byte-identical

    # the feed carries the updates like any other change, as live rows
    feed = table.read_changes(rec["commit_seq"] - 1, rec["commit_seq"])
    assert feed.count() == 3
    assert feed.filter(F.coalesce(F.col("__deleted"), F.lit(False))).count() == 0

    # idempotent redelivery / nothing matched -> no commit
    assert table.update_where(
        [("conv_id", "=", "pii")], {"text": "'x'"}, batch_key="redact1"
    ) is None
    seq = table.current_seq()
    assert table.update_where([("conv_id", "=", "nope")], {"text": "'x'"}) is None
    assert table.current_seq() == seq

    # simultaneous assignment: swapping two columns uses OLD values on
    # both sides (role='user', tool='' before the swap)
    table.update_where(
        [("conv_id", "=", "ok")], {"role": "tool", "tool": "role"},
        batch_key="swap1",
    )
    row = (
        read_transcripts(table)
        .filter((F.col("conv_id") == "ok") & (F.col("turn_idx") == 0))
        .collect()[0]
    )
    assert row["role"] == "" and row["tool"] == "user"

    # a later CDC event (higher lsn) beats the rewrite
    apply_changes(table, _batch(spark, "pii", 500, n=1), batch_key="b2", mode="mor")
    row = (
        read_transcripts(table)
        .filter((F.col("conv_id") == "pii") & (F.col("turn_idx") == 0))
        .collect()[0]
    )
    assert row["text"] == "pii t0"


def test_update_where_guards(spark, tmp_path):
    import pyspark.sql.types as T

    from etl_rust_spark.operators.apply import read_transcripts

    t = IceliteTable.create(
        spark, str(tmp_path / "agg"),
        T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("__lsn", T.LongType()),
        ]),
        key_cols=["k"], bucket_key="k", n_buckets=2, order_cols=["k"],
        seq_col="__lsn", agg_cols={"n": "sum"},
    )
    with pytest.raises(ValueError, match="not supported on additive"):
        t.update_where([("k", "=", "a")], {"n": "n + 1"})

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    apply_changes(table, _batch(spark, "c0", 0, n=2), batch_key="b0", mode="mor")
    with pytest.raises(ValueError, match="cannot assign"):
        table.update_where([("conv_id", "=", "c0")], {"conv_id": "'x'"})
    with pytest.raises(ValueError, match="cannot assign"):
        table.update_where([("conv_id", "=", "c0")], {"__lsn": "0"})
    with pytest.raises(ValueError, match="unknown column"):
        table.update_where([("conv_id", "=", "c0")], {"nope": "'x'"})
    with pytest.raises(ValueError, match="at least one assignment"):
        table.update_where([("conv_id", "=", "c0")], {})

    # an UPDATE never resurrects a tombstoned key
    table.delete_where([("conv_id", "=", "c0")], batch_key="d0")
    assert table.update_where([("conv_id", "=", "c0")], {"text": "'x'"}) is None
    assert read_transcripts(table).count() == 0


def test_clone_exports_independent_table(spark, tmp_path):
    """Shallow clone: one snapshot becomes a NEW independent table —
    state equal (MoR deltas + tombstones carried verbatim), data files
    hard-linked (zero copy), the exactly-once ledger carried so the
    feed resumes without re-applying, and the clone survives source
    compaction, expiry, GC, and even deletion of the source tree."""
    import shutil

    from pyspark.sql import functions as F

    from etl_rust_spark.operators.apply import read_transcripts

    table = create_transcript_table(spark, str(tmp_path / "src"), n_buckets=4)
    apply_changes(table, _batch(spark, "a", 0, n=3), batch_key="b0", mode="mor")
    apply_changes(table, _batch(spark, "b", 100, n=2), batch_key="b1", mode="mor")
    table.delete_where([("conv_id", "=", "b")], batch_key="d0")

    dest = str(tmp_path / "clone")
    c = table.clone(dest)
    # state equal, including the tombstone winners (deltas uncompacted)
    src_live, cl_live = table.read(), c.read()
    assert src_live.exceptAll(cl_live).count() == 0
    assert cl_live.exceptAll(src_live).count() == 0
    assert {r["conv_id"] for r in read_transcripts(c).collect()} == {"a"}

    # hard-linked, not copied: shared inodes
    src_inodes = {os.stat(e["path"]).st_ino for e in table._files(table.pointer())}
    cl_inodes = {os.stat(e["path"]).st_ino for e in c._files(c.pointer())}
    assert cl_inodes == src_inodes

    # exactly-once ledger carried: a replayed batch is a no-op on the clone
    assert c.is_applied("b0") and c.is_applied("d0")
    assert apply_changes(c, _batch(spark, "a", 0, n=3),
                         batch_key="b0", mode="mor") is None

    # the clone commit is a NON-change source (its files may hold many
    # versions of one key): the feed skips it, consumers bootstrap from
    # read() and tail from seq 1 — the standard CDC snapshot-bootstrap
    assert c.earliest_changes_seq() == 0
    assert c.read_changes(0).count() == 0
    assert c.lineage().collect()[0]["source"] == "clone"

    # point-in-time export of an older snapshot
    c1 = table.clone(str(tmp_path / "pit"), seq=1)
    old = table.read(seq=1)
    assert c1.read().exceptAll(old).count() == 0
    assert old.exceptAll(c1.read().select(*old.columns)).count() == 0

    # clones diverge independently: new data lands on the clone only,
    # and the feed from seq 1 delivers exactly that commit
    apply_changes(c, _batch(spark, "z", 900, n=1), batch_key="b9", mode="mor")
    assert c.read().count() == table.read().count() + 1
    tail = c.read_changes(1)
    assert tail.count() == 1
    assert tail.collect()[0]["_commit_seq"] == 2

    # clone survives source-side maintenance AND source deletion
    before = read_transcripts(c).toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    table.compact()
    table.expire_snapshots(keep_last=1)
    table.remove_orphans(grace_sec=0)
    shutil.rmtree(str(tmp_path / "src"))
    after = read_transcripts(c).toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(before, after, check_dtype=False)

    # refuse to clobber an existing table; clone is main-only
    with pytest.raises(FileExistsError):
        c.clone(dest)
    c.create_branch("wip")
    with pytest.raises(ValueError, match="MAIN ref only"):
        c.branch_table("wip").clone(str(tmp_path / "nope"))

    # additive tables clone too: carried partials keep folding
    import pyspark.sql.types as T
    agg = IceliteTable.create(
        spark, str(tmp_path / "agg"),
        T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("__lsn", T.LongType()),
        ]),
        key_cols=["k"], bucket_key="k", n_buckets=2, order_cols=["k"],
        seq_col="__lsn", agg_cols={"n": "sum"},
    )
    for i in range(2):
        agg.merge(
            spark.createDataFrame([("x", 5, i + 1)], "k string, n long, __lsn long")
            .withColumn("op", F.lit("U")),
            batch_key=f"p{i}", seq_col="__lsn", mode="mor",
        )
    ac = agg.clone(str(tmp_path / "aggclone"))
    assert [(r["k"], r["n"]) for r in ac.read().collect()] == [("x", 10)]


def test_fsck_detects_missing_truncated_and_row_drifted_files(spark, tmp_path):
    """fsck: clean on a healthy table (branches included), then catches a
    deleted data file, a truncated file (size drift), a swapped file
    (deep row-count drift the size check can't see when sizes are
    forced), and an unreadable manifest — read-only, reporting instead
    of raising."""
    import shutil

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    apply_changes(table, _batch(spark, "a", 0, n=3), batch_key="b0", mode="mor")
    apply_changes(table, _batch(spark, "b", 100, n=2), batch_key="b1", mode="mor")
    table.create_branch("wip")

    rep = table.fsck(deep=True)
    assert rep["ok"] and rep["errors"] == [], rep
    assert rep["checked"]["files"] > 0 and rep["checked"]["footers"] > 0
    assert rep["checked"]["snapshots"] >= 4  # main chain + branch fork

    files = [e["path"] for e in table._files(table.pointer())]
    # truncation: size drift
    with open(files[0], "r+b") as f:
        f.truncate(10)
    rep = table.fsck()
    assert not rep["ok"] and any("size drift" in e for e in rep["errors"])
    # deletion: missing file
    os.remove(files[0])
    rep = table.fsck()
    assert any("missing" in e for e in rep["errors"])
    shutil.copyfile(files[1], files[0])  # wrong content, plausible size

    # deep mode: row-count drift via footer (metadata bytes may even
    # match another file's; the footer pass is what catches it)
    rep = table.fsck(deep=True)
    deep_errors = [e for e in rep["errors"] if "row drift" in e or "size drift" in e]
    assert deep_errors, rep["errors"]

    # unreadable manifest
    mname = table.pointer()["manifests"][0]["name"]
    mpath = os.path.join(table._manifest_dir, mname)
    orig = open(mpath).read()
    with open(mpath, "w") as f:
        f.write("{not json")
    t2 = type(table)(spark, str(tmp_path / "t"))  # fresh cache
    rep = t2.fsck()
    assert any("manifest" in e and "unreadable" in e for e in rep["errors"])
    with open(mpath, "w") as f:
        f.write(orig)


def test_compact_files_per_bucket_splits_without_zorder(spark, tmp_path):
    """Plain compaction with an explicit files_per_bucket splits each
    bucket into key-range files (file-size cap without a rebucket);
    per-file key ranges stay disjoint enough that a point lookup prunes
    to a strict subset of the bucket's files. Default compaction still
    folds to one file per bucket."""
    from pyspark.sql import functions as F

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    rows = [
        (k, "I", f"conv-{k:04d}", 0, "user", f"text {k}", "", TS)
        for k in range(400)
    ]
    apply_changes(
        table, spark.createDataFrame(rows, CHANGE_SCHEMA),
        batch_key="b0", mode="mor",
    )
    before = table.read().count()
    table.compact(files_per_bucket=4)
    files = table._files(table.pointer())
    per_bucket: dict = {}
    for e in files:
        per_bucket[e["bucket"]] = per_bucket.get(e["bucket"], 0) + 1
    assert max(per_bucket.values()) > 1  # buckets actually split
    assert table.read().count() == before
    # point lookup prunes within the split bucket
    probe = table.read_keys(["conv-0007"])
    assert probe.count() == 1
    bucket_files = max(per_bucket.values())
    assert 0 < len(probe.inputFiles()) < bucket_files
    # zorder layout persistence is untouched by the one-shot split
    assert table.pointer().get("zorder") is None
    # a later DEFAULT compaction folds back to one file per bucket
    apply_changes(table, _batch(spark, "zz", 9000), batch_key="b1", mode="mor")
    table.compact()
    per_bucket2: dict = {}
    for e in table._files(table.pointer()):
        per_bucket2[e["bucket"]] = per_bucket2.get(e["bucket"], 0) + 1
    assert max(per_bucket2.values()) == 1
    live = table.read().filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
    assert live.count() == before + 4


def test_earliest_changes_seq_tracks_retention(spark, tmp_path):
    """earliest_changes_seq: the smallest resumable change-feed start,
    advancing as compaction + expiry reclaim per-commit history — the
    number a lagging consumer checks BEFORE resuming."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    for i in range(4):
        apply_changes(table, _batch(spark, f"c{i}", i * 100),
                      batch_key=f"b{i}", mode="mor")
    assert table.earliest_changes_seq() == 0
    assert table.read_changes(0).count() == 16

    # compaction alone folds nothing away — originals remain replayable
    table.compact()
    assert table.earliest_changes_seq() == 0
    assert table.read_changes(0).count() == 16

    # expiry reclaims the folded commits' manifests: resume point moves
    table.expire_snapshots(keep_last=1)
    e = table.earliest_changes_seq()
    assert e == 4  # (4, 5] spans only the compaction commit — still legal
    assert table.read_changes(e).count() == 0
    with pytest.raises(ValueError, match="expired"):
        table.read_changes(e - 1).count()
    assert table.describe()["earliest_changes_seq"] == e

    # new commits after the fold are replayable from the new floor
    apply_changes(table, _batch(spark, "c9", 900), batch_key="b9", mode="mor")
    assert table.earliest_changes_seq() == 4
    assert table.read_changes(4).count() == 4


def test_remove_orphans_dry_run_touches_nothing(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    base = str(tmp_path / "t")
    odir = os.path.join(base, "data", "commit-00000099-deadbeef", "__bucket=0")
    os.makedirs(odir)
    orphan = os.path.join(odir, "part-000.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    past = time.time() - 7200
    os.utime(orphan, (past, past))

    would = table.remove_orphans(grace_sec=3600, dry_run=True)
    assert orphan in would
    assert os.path.exists(orphan)  # preview deleted nothing
    assert sorted(table.remove_orphans(grace_sec=3600)) == sorted(would)
    assert not os.path.exists(orphan)


def test_expire_snapshots_older_than_composes_with_keep_last(spark, tmp_path):
    """Time-based retention (Iceberg expireOlderThan analog): only
    snapshots committed BEFORE the cutoff expire, keep_last still
    retains that many most-recent regardless of age, and a future
    cutoff never widens what keep_last alone would expire."""
    import glob as _glob

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(table, _batch(spark, "c0", 0), batch_key="b0", mode="mor")
    apply_changes(table, _batch(spark, "c1", 100), batch_key="b1", mode="mor")
    cut = time.time() + 0.25
    time.sleep(0.5)
    apply_changes(table, _batch(spark, "c2", 200), batch_key="b2", mode="mor")
    apply_changes(table, _batch(spark, "c3", 300), batch_key="b3", mode="mor")

    def seqs():
        return sorted(
            int(os.path.basename(p)[5:13])
            for p in _glob.glob(str(tmp_path / "t" / "_manifests" / "snap-*.json"))
        )

    # age gate: seqs 3,4 postdate the cutoff and stay even with keep_last=1
    table.expire_snapshots(keep_last=1, older_than=cut)
    assert seqs() == [0, 3, 4] or seqs() == [3, 4]  # snap-0 may be the empty root
    assert table.read().count() == 16

    # a cutoff in the future does NOT override keep_last's retention
    apply_changes(table, _batch(spark, "c4", 400), batch_key="b4", mode="mor")
    table.expire_snapshots(keep_last=2, older_than=time.time() + 60)
    kept = seqs()
    assert 4 in kept and 5 in kept and 3 not in kept
    assert table.read().count() == 20

    # datetime cutoff is accepted (treated as UTC)
    table.expire_snapshots(
        keep_last=1, older_than=dt.datetime.utcnow() - dt.timedelta(days=1)
    )
    assert 4 in seqs() and 5 in seqs()  # nothing is old enough to expire


def test_fsck_reports_metadata_inconsistencies(spark, tmp_path):
    """fsck's schema-consistency pass: a restored/hand-edited pointer
    whose layout, field ids, agg registry, or CHECK constraints
    reference columns the schema no longer carries is reported at fsck
    time (read-only) instead of failing at the next write."""
    import json

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    apply_changes(table, _batch(spark, "a", 0, n=2), batch_key="b0", mode="mor")
    table.add_check("text_nonempty", "length(text) > 0")
    assert table.fsck()["ok"]

    sp = table._pointer_path(table.current_seq())
    with open(sp) as f:
        good = json.load(f)

    def corrupt(mutate):
        bad = json.loads(json.dumps(good))
        mutate(bad)
        os.remove(sp)
        with open(sp, "w") as f:
            json.dump(bad, f)
        # drop the cached pointer so fsck re-reads the corrupted file
        return table.fsck()["errors"]

    errs = corrupt(lambda p: p["key_cols"].append("ghost"))
    assert any("key_cols references missing column 'ghost'" in e
               for e in errs), errs
    errs = corrupt(lambda p: p.update(bucket_key="role"))
    assert any("not a key column" in e for e in errs), errs
    errs = corrupt(lambda p: p["field_ids"].pop("text"))
    assert any("field_ids keys != schema columns" in e for e in errs), errs
    errs = corrupt(lambda p: p["field_ids"].update(text=0))
    assert any("duplicate field ids" in e for e in errs), errs
    errs = corrupt(lambda p: p.update(next_field_id=1))
    assert any("next_field_id" in e for e in errs), errs
    errs = corrupt(lambda p: p.update(agg_cols={"nope": "sum"}))
    assert any("agg_cols references missing column 'nope'" in e
               for e in errs), errs
    errs = corrupt(lambda p: p.update(agg_cols={"turn_idx": "avg"}))
    assert any("unknown fold fn 'avg'" in e for e in errs), errs
    errs = corrupt(
        lambda p: p.update(checks={"c": "length(dropped_col) > 0"})
    )
    assert any("does not resolve" in e for e in errs), errs

    # restore the good pointer: clean again (pure reporting, no damage)
    os.remove(sp)
    with open(sp, "w") as f:
        json.dump(good, f)
    rep = table.fsck(deep=True)
    assert rep["ok"], rep["errors"]
