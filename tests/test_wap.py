"""Write-audit-publish (WAP) staged commits — Iceberg's wap.id pattern on
Icelite: a batch is fully written (deduplicated, stats-scanned) but the
snapshot pointer does not advance until the audit passes. The
training-data-pipeline gate: run quality checks on the exact post-publish
view, then publish atomically or drop the batch without a trace.

The reference has no audit gate (batches go straight to the sink,
/root/reference/example/src/main.rs:489-510); semantics here follow the
public Iceberg write-audit-publish workflow.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_rust_spark.changelog import CHANGELOG_SCHEMA
from etl_rust_spark.operators.apply import (
    apply_changes,
    create_transcript_table,
    read_transcripts,
)


def _batch(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "ts"]
    )
    pdf["tool"] = ""
    pdf = pdf[["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    pdf["ts"] = pd.Timestamp("2025-01-01")
    return spark.createDataFrame(pdf, schema=CHANGELOG_SCHEMA)


def test_stage_audit_publish_roundtrip(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [
        (1, "I", "c1", 0, "user", "hello", None),
        (2, "I", "c1", 1, "assistant", "hi", None),
    ]), batch_key="b0", mode="mor")
    seq_live = t.current_seq()

    apply_changes(t, _batch(spark, [
        (3, "I", "c2", 0, "user", "staged row", None),
        (4, "U", "c1", 1, "assistant", "hi v2", None),
    ]), batch_key="b1", mode="mor", stage_as="qa")

    # main is untouched: pointer, row count, and content all pre-stage
    assert t.current_seq() == seq_live
    assert read_transcripts(t).count() == 2
    assert not t.is_applied("b1")
    assert t.list_staged() == ["qa"]

    # audit view = table as if published (upsert applied, new key present)
    audit = {(r["conv_id"], r["turn_idx"]): r["text"]
             for r in t.read_staged("qa").collect()}
    assert audit == {("c1", 0): "hello", ("c1", 1): "hi v2", ("c2", 0): "staged row"}

    rec = t.publish_staged("qa")
    assert rec is not None and rec["source"].endswith("+published")
    assert t.is_applied("b1")
    assert t.list_staged() == []
    live = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in read_transcripts(t).collect()}
    assert live == audit
    # exactly-once: replaying the published batch is a no-op
    assert apply_changes(t, _batch(spark, [
        (3, "I", "c2", 0, "user", "staged row", None)]), batch_key="b1", mode="mor") is None


def test_publish_rebases_over_commits_landed_during_audit(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "a", None)]),
                  batch_key="b0", mode="mor")
    apply_changes(t, _batch(spark, [(2, "I", "c2", 0, "user", "staged", None)]),
                  batch_key="st", mode="mor", stage_as="qa")
    # another writer lands while the audit runs — including a NEWER version
    # of the staged batch's key, which must win after publish (lsn order)
    apply_changes(t, _batch(spark, [(5, "U", "c2", 0, "user", "newer", None)]),
                  batch_key="b1", mode="mor")
    seq_mid = t.current_seq()

    rec = t.publish_staged("qa")
    assert rec is not None and rec["commit_seq"] == seq_mid + 1
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in read_transcripts(t).collect()}
    assert got == {("c1", 0): "a", ("c2", 0): "newer"}
    # the change feed sees the published commit at its real sequence
    feed = t.read_changes(since_seq=seq_mid)
    assert feed.filter(F.col("_commit_seq") == seq_mid + 1).count() == 1


def test_drop_staged_leaves_no_trace_and_allows_redelivery(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "bad batch", None)]),
                  batch_key="bk", mode="mor", stage_as="qa")
    st = t._load_staged("qa")
    t.drop_staged("qa")
    assert t.list_staged() == []
    import os
    assert not os.path.exists(st["commit_dir"])
    assert read_transcripts(t).count() == 0
    # the audit rejected the batch; the CORRECTED redelivery under the
    # same batch key must process (key never entered the ledger)
    rec = apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "good", None)]),
                        batch_key="bk", mode="mor")
    assert rec is not None
    assert read_transcripts(t).collect()[0]["text"] == "good"


def test_publish_after_concurrent_duplicate_is_noop(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "x", None)]),
                  batch_key="dup", mode="mor", stage_as="qa")
    # a concurrent (non-staged) writer applies the SAME batch key first
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "x", None)]),
                  batch_key="dup", mode="mor")
    seq = t.current_seq()
    assert t.publish_staged("qa") is None  # duplicate: dropped, not applied twice
    assert t.current_seq() == seq
    assert t.list_staged() == []
    assert read_transcripts(t).count() == 1


def test_remove_orphans_protects_staged_files(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "keep me", None)]),
                  batch_key="b0", mode="mor", stage_as="qa")
    removed = t.remove_orphans(grace_sec=0.0)
    assert removed == []
    assert t.read_staged("qa").count() == 1
    assert t.publish_staged("qa") is not None
    assert read_transcripts(t).count() == 1


def test_stage_requires_mor(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    with pytest.raises(ValueError, match="mor"):
        apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "x", None)]),
                      batch_key="b0", mode="cow", stage_as="qa")
    with pytest.raises(ValueError, match="invalid staged-commit name"):
        t._staged_path("../escape")


def test_audited_ingest_gates_each_micro_batch(spark, tmp_path):
    """End-to-end audited streaming ingest: each micro-batch stages,
    the audit inspects the post-publish view, failing batches drop
    (quarantined, never in the ledger), passing batches publish — the
    table only ever exposes audited data."""
    from pyspark.sql import functions as SF

    from etl_rust_spark.changelog import (
        CHANGELOG_SCHEMA,
        ChangelogConfig,
        generate_changelog_pandas,
        write_wal_segments,
    )
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.streaming.driver import ChangelogIngest

    log = generate_changelog_pandas(
        ChangelogConfig(n_events=300, n_conversations=6, turns_per_conv=10, seed=3)
    )
    # poison the MIDDLE third: those events carry a marker the gate rejects
    third = len(log) // 3
    log.loc[third : 2 * third - 1, "text"] = "POISON " + log.loc[
        third : 2 * third - 1, "text"
    ]
    wal = str(tmp_path / "wal")
    write_wal_segments(log, wal, 3, spark)
    create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)

    def no_poison(view):
        return view.filter(SF.col("text").startswith("POISON")).isEmpty()

    ingest = ChangelogIngest(
        spark=spark, wal_dir=wal, table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ck"), schema=CHANGELOG_SCHEMA,
        name="audited", mode="mor", audit=no_poison,
    )
    ingest.run_available()
    table = IceliteTable.load(spark, ingest.table_path)

    assert len(ingest.rejected) == 1  # exactly the poisoned segment
    got = read_transcripts(table).toPandas()
    assert len(got) > 0
    assert not got.text.str.startswith("POISON").any()
    # the rejected batch's key never entered the ledger; accepted ones did
    lin = table.lineage().toPandas()
    assert (lin.source == "stream:audited+published").all()
    assert len(lin) == 2
    assert table.list_staged() == []  # no staged debris either way


def test_audited_ingest_requires_mor(spark, tmp_path):
    from etl_rust_spark.changelog import CHANGELOG_SCHEMA
    from etl_rust_spark.streaming.driver import ChangelogIngest, PipelineError

    create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    ingest = ChangelogIngest(
        spark=spark, wal_dir=str(tmp_path / "wal"),
        table_path=str(tmp_path / "t"), checkpoint_dir=str(tmp_path / "ck"),
        schema=CHANGELOG_SCHEMA, name="bad", mode="cow", audit=lambda v: True,
    )
    with pytest.raises((PipelineError, ValueError)):
        ingest.run_available()


def test_publish_crash_after_rehome_is_retryable(spark, tmp_path):
    """Crash injected between the data-dir re-home and the pointer
    commit: the staged commit must still resolve (re-homed paths are
    persisted first), so the audit view keeps working and a publish
    retry lands the batch."""
    from etl_rust_spark.lake.format import ConcurrentCommitError, IceliteTable

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "a", None)]),
                  batch_key="b0", mode="mor")
    apply_changes(t, _batch(spark, [(2, "I", "c2", 0, "user", "staged", None)]),
                  batch_key="st", mode="mor", stage_as="qa")
    # main advances during the audit, so publish must re-home the dir
    apply_changes(t, _batch(spark, [(3, "I", "c3", 0, "user", "b", None)]),
                  batch_key="b1", mode="mor")

    real = IceliteTable._commit_rebasing

    def boom(self, *a, **kw):
        raise ConcurrentCommitError("injected crash after re-home")

    IceliteTable._commit_rebasing = boom
    try:
        with pytest.raises(ConcurrentCommitError):
            t.publish_staged("qa")
    finally:
        IceliteTable._commit_rebasing = real

    # staged state survived the crash consistently: files resolve,
    # the audit view still works, orphan GC still protects the data
    assert t.list_staged() == ["qa"]
    import os
    st = t._load_staged("qa")
    assert all(os.path.exists(f["path"]) for f in st["files"])
    assert t.read_staged("qa").filter("conv_id = 'c2'").count() == 1
    assert t.remove_orphans(grace_sec=0.0) == []
    # retry lands it
    assert t.publish_staged("qa") is not None
    got = {r["conv_id"] for r in read_transcripts(t).collect()}
    assert got == {"c1", "c2", "c3"}


def test_stage_name_collision_is_refused(spark, tmp_path):
    """Staging over an existing name would orphan the first batch's data
    — refuse until it's published or dropped."""
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "first", None)]),
                  batch_key="b0", mode="mor", stage_as="qa")
    with pytest.raises(ValueError, match="already exists"):
        apply_changes(t, _batch(spark, [(2, "I", "c2", 0, "user", "second", None)]),
                      batch_key="b1", mode="mor", stage_as="qa")
    t.drop_staged("qa")
    # after the drop the name is free again
    apply_changes(t, _batch(spark, [(2, "I", "c2", 0, "user", "second", None)]),
                  batch_key="b1", mode="mor", stage_as="qa")
    assert t.read_staged("qa").count() == 1


def test_stale_marker_after_published_crash_never_deletes_live_data(spark, tmp_path):
    """Crash injected between the publish's pointer hard-link and the
    staged-marker removal (ADVICE r03 #1): the marker then points at a
    LIVE, manifest-referenced data dir. Every cleanup path — drop_staged,
    a replayed publish_staged, and the streaming driver's is_applied →
    clear_staged_marker recovery — must remove only the marker, never the
    committed data."""
    import os
    import shutil

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "base", None)]),
                  batch_key="b0", mode="mor")
    apply_changes(t, _batch(spark, [(2, "I", "c2", 0, "user", "audited", None)]),
                  batch_key="bk", mode="mor", stage_as="qa")
    marker = t._staged_path("qa")
    saved = marker + ".saved"
    shutil.copy(marker, saved)
    assert t.publish_staged("qa") is not None
    # resurrect the marker exactly as the crash would leave it
    shutil.copy(saved, marker)
    os.remove(saved)
    assert t.is_applied("bk")
    st = t._load_staged("qa")
    assert t._dir_is_live(st["commit_dir"])

    # path 1: drop_staged refuses the rmtree, clears only the marker
    t.drop_staged("qa")
    assert t.list_staged() == []
    assert all(os.path.exists(f["path"]) for f in st["files"])
    got = {r["conv_id"] for r in read_transcripts(t).collect()}
    assert got == {"c1", "c2"}

    # path 2: a replayed publish on a resurrected marker is a safe no-op
    with open(marker, "w") as fh:
        import json
        json.dump(st, fh)
    assert t.publish_staged("qa") is None
    assert all(os.path.exists(f["path"]) for f in st["files"])
    assert {r["conv_id"] for r in read_transcripts(t).collect()} == {"c1", "c2"}

    # path 3: the driver's recovery branch (is_applied → marker only)
    with open(marker, "w") as fh:
        json.dump(st, fh)
    t.clear_staged_marker("qa")
    assert t.list_staged() == []
    assert {r["conv_id"] for r in read_transcripts(t).collect()} == {"c1", "c2"}


def test_layout_change_during_audit_refuses_publish(spark, tmp_path):
    """A rebucket or column rename landing during the audit window makes
    the staged files' bucket ids / field-id stamps stale — read_staged
    and publish_staged must raise instead of silently corrupting pruning
    or column resolution (ADVICE r03 #3)."""
    from etl_rust_spark.lake.format import ConcurrentCommitError

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "a", None)]),
                  batch_key="b0", mode="mor")
    apply_changes(t, _batch(spark, [(2, "I", "c2", 0, "user", "staged", None)]),
                  batch_key="st", mode="mor", stage_as="qa")
    t.rebucket(8)
    with pytest.raises(ConcurrentCommitError, match="bucket layout"):
        t.read_staged("qa")
    with pytest.raises(ConcurrentCommitError, match="bucket layout"):
        t.publish_staged("qa")
    t.drop_staged("qa")

    # rename during the audit: field-id stamps no longer match
    apply_changes(t, _batch(spark, [(3, "I", "c3", 0, "user", "staged2", None)]),
                  batch_key="st2", mode="mor", stage_as="qa")
    t.rename_column("tool", "tool_name")
    with pytest.raises(ConcurrentCommitError, match="rename/drop"):
        t.publish_staged("qa")
    t.drop_staged("qa")
    # redelivery under the same key still works (key never entered ledger)
    assert apply_changes(
        t,
        _batch(spark, [(3, "I", "c3", 0, "user", "redelivered", None)]).withColumnRenamed(
            "tool", "tool_name"
        ),
        batch_key="st2",
        mode="mor",
    ) is not None


def test_read_staged_shows_new_column_values_not_null(spark, tmp_path):
    """A staged batch that ADDS a column must show that column's VALUES in
    the audit view — the whole point of WAP is validating them before
    publish (ADVICE r03 #2: the bare live pointer lacks the new column's
    field id, which silently null-backfilled it)."""
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "c1", 0, "user", "base", None)]),
                  batch_key="b0", mode="mor")
    wide = _batch(spark, [(2, "I", "c2", 0, "user", "tagged", None)]).withColumn(
        "lang", F.lit("en")
    )
    apply_changes(t, wide, batch_key="b1", mode="mor", stage_as="qa")
    audit = {r["conv_id"]: r["lang"] for r in t.read_staged("qa").collect()}
    assert audit == {"c1": None, "c2": "en"}
    assert t.publish_staged("qa") is not None
    live = {r["conv_id"]: r["lang"] for r in t.read().collect()}
    assert live == audit


def test_audited_ingest_recovers_from_crash_between_stage_and_publish(spark, tmp_path):
    """Crash INSIDE the audit (after staging, before publish/drop): the
    replayed epoch must not wedge on 'staged commit already exists' — the
    run-id+epoch-scoped name can only be our own half-finished attempt,
    so the driver discards it and re-stages."""
    from pyspark.sql import functions as SF

    from etl_rust_spark.changelog import (
        CHANGELOG_SCHEMA,
        ChangelogConfig,
        generate_changelog_pandas,
        write_wal_segments,
    )
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.streaming.driver import ChangelogIngest, PipelineError

    log = generate_changelog_pandas(
        ChangelogConfig(n_events=120, n_conversations=4, turns_per_conv=8, seed=9)
    )
    wal = str(tmp_path / "wal")
    write_wal_segments(log, wal, 2, spark)
    create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)

    calls = {"n": 0}

    def flaky_audit(view):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash mid-audit")
        return True

    mk = lambda: ChangelogIngest(  # noqa: E731
        spark=spark, wal_dir=wal, table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ck"), schema=CHANGELOG_SCHEMA,
        name="flaky", mode="mor", audit=flaky_audit,
    )
    with pytest.raises(PipelineError):
        mk().run_available()
    table = IceliteTable.load(spark, str(tmp_path / "t"))
    assert len(table.list_staged()) == 1  # the crashed attempt's leftover

    mk().run_available()  # restart: replayed epoch re-stages and publishes
    assert table.list_staged() == []
    got = read_transcripts(table).toPandas()
    from etl_rust_spark.changelog import replay_oracle_pandas
    from tests.conftest import assert_pdf_equal
    assert_pdf_equal(got, replay_oracle_pandas(log))
