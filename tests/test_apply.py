"""M1/M2 correctness: changelog replay → Icelite state equals the oracle.

Ports the reference's verification invariants (SURVEY.md §5): exactly-once
completeness (every input reflected once, order-insensitive), idempotent
re-delivery, and stable (conv_id, turn_idx) ordering of the final state.
"""

import numpy as np
import pandas as pd
import pytest

from etl_rust_spark.changelog import (
    CHANGELOG_SCHEMA,
    ChangelogConfig,
    generate_changelog_pandas,
    replay_oracle_pandas,
)
from etl_rust_spark.operators.apply import (
    apply_changes,
    create_transcript_table,
    dedup_max_lsn,
    read_transcripts,
)
from tests.conftest import assert_pdf_equal


def _chunks(pdf, n):
    return [pdf.iloc[idx] for idx in np.array_split(np.arange(len(pdf)), n)]


def _spark_changelog(spark, pdf, schema=CHANGELOG_SCHEMA):
    return spark.createDataFrame(pdf, schema=schema)


@pytest.fixture()
def tiny_log():
    return generate_changelog_pandas(
        ChangelogConfig(
            n_events=1200,
            n_conversations=10,
            turns_per_conv=20,
            dup_fraction=0.05,
            delete_fraction=0.08,
            shuffle_order=True,
        )
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_replay_in_chunks_matches_oracle(spark, tiny_log, tmp_path, mode):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=8)
    for i, chunk in enumerate(_chunks(tiny_log, 3)):
        rec = apply_changes(
            table, _spark_changelog(spark, chunk), batch_key=f"b{i}", mode=mode
        )
        assert rec is not None and rec["commit_seq"] == i + 1
    if mode == "mor":
        # delta files present; reads dedup base ∪ deltas
        kinds = {f.get("kind", "base") for f in table.snapshot()["files"]}
        assert "delta" in kinds
    actual = read_transcripts(table).toPandas()
    expected = replay_oracle_pandas(tiny_log)
    assert_pdf_equal(actual, expected)
    # result is emitted in stable (conv_id, turn_idx) order
    keys = list(zip(actual.conv_id, actual.turn_idx))
    assert keys == sorted(keys)
    if mode == "mor":
        # compaction folds deltas, state unchanged, files all base again
        table.compact()
        assert all(
            f.get("kind", "base") == "base" for f in table.snapshot()["files"]
        )
        assert_pdf_equal(read_transcripts(table).toPandas(), expected)


def test_single_batch_replay(spark, tiny_log, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(table, _spark_changelog(spark, tiny_log), batch_key="all")
    assert_pdf_equal(read_transcripts(table).toPandas(), replay_oracle_pandas(tiny_log))


def test_idempotent_redelivery(spark, tiny_log, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=8)
    chunks = _chunks(tiny_log, 3)
    for i, chunk in enumerate(chunks):
        apply_changes(table, _spark_changelog(spark, chunk), batch_key=f"b{i}")
    seq_before = table.current_seq()
    state_before = read_transcripts(table).toPandas()
    # re-deliver batch 1 (crash-replay simulation): must be a no-op
    assert apply_changes(table, _spark_changelog(spark, chunks[1]), batch_key="b1") is None
    assert table.current_seq() == seq_before
    assert_pdf_equal(read_transcripts(table).toPandas(), state_before)


def test_cross_batch_late_data_and_delete_tombstones(spark, tmp_path):
    """A late event (smaller lsn) arriving after a newer update or a delete
    must lose — including the delete-then-late-resurrection case."""
    cols = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ts = pd.Timestamp("2025-01-01")
    b1 = pd.DataFrame(
        [
            [10, "U", "c1", np.int32(0), "user", "new", "", ts],
            [20, "D", "c2", np.int32(0), None, None, None, pd.NaT],
        ],
        columns=cols,
    )
    b2 = pd.DataFrame(  # both events are LATE (lsn < what's applied)
        [
            [5, "I", "c1", np.int32(0), "user", "old", "", ts],
            [15, "U", "c2", np.int32(0), "user", "zombie", "", ts],
        ],
        columns=cols,
    )
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(table, _spark_changelog(spark, b1), batch_key="b1")
    apply_changes(table, _spark_changelog(spark, b2), batch_key="b2")
    final = read_transcripts(table).toPandas()
    expected = replay_oracle_pandas(pd.concat([b1, b2]))
    assert_pdf_equal(final, expected)
    assert list(final.text) == ["new"]  # c2 stays deleted, c1 keeps lsn=10


def test_dedup_salted_equals_plain(spark, tiny_log):
    df = _spark_changelog(spark, tiny_log)
    plain = dedup_max_lsn(df).toPandas()
    salted = dedup_max_lsn(df, salt_buckets=16).toPandas()
    assert_pdf_equal(plain, salted)
    assert plain.set_index(["conv_id", "turn_idx"]).index.is_unique


def test_time_travel_and_lineage(spark, tiny_log, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=8)
    chunks = _chunks(tiny_log, 3)
    for i, chunk in enumerate(chunks):
        apply_changes(table, _spark_changelog(spark, chunk), batch_key=f"b{i}")
    # snapshot 1 = state after chunk 0 only
    expected1 = replay_oracle_pandas(chunks[0])
    assert_pdf_equal(read_transcripts(table, seq=1).toPandas(), expected1)
    lin = table.lineage().toPandas().sort_values("commit_seq")
    assert list(lin.batch_key) == ["b0", "b1", "b2"]
    assert (lin.n_changes > 0).all()
    assert lin.per_bucket_rows.map(len).gt(0).all()
    # source-offset (lsn) range of each commit's APPLIED winners is
    # recorded; the newest event always wins its key, so the final
    # commit's lsn_max reaches the log's tail offset
    assert (lin.lsn_min <= lin.lsn_max).all() and lin.lsn_min.notna().all()
    assert lin.lsn_max.max() == tiny_log.lsn.max()
    assert table.applied_batches() == {"b0": 1, "b1": 2, "b2": 3}


def test_compaction_preserves_state(spark, tiny_log, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    for i, chunk in enumerate(_chunks(tiny_log, 4)):
        apply_changes(table, _spark_changelog(spark, chunk), batch_key=f"b{i}")
    before = read_transcripts(table).toPandas()
    n_files_before = len(table.snapshot()["files"])
    table.compact()
    assert_pdf_equal(read_transcripts(table).toPandas(), before)
    assert len(table.snapshot()["files"]) <= min(n_files_before, 4)
    # expire old snapshots; current state still readable
    table.expire_snapshots(keep_last=1)
    assert_pdf_equal(read_transcripts(table).toPandas(), before)


def test_point_lookup_with_bucket_pruning(spark, tiny_log, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=8)
    apply_changes(table, _spark_changelog(spark, tiny_log), batch_key="all")
    oracle = replay_oracle_pandas(tiny_log)
    conv = oracle.conv_id.iloc[0]
    got = table.read_keys([conv]).toPandas()
    exp = oracle[oracle.conv_id == conv]
    from etl_rust_spark.operators.apply import LSN_COL, DELETED_COL

    got = got[~got[DELETED_COL].fillna(False)].drop(columns=[LSN_COL, DELETED_COL])
    assert_pdf_equal(got, exp)
    # pruning actually prunes: the lookup must read fewer files than a scan
    snap = table.snapshot()
    buckets = {f["bucket"] for f in snap["files"]}
    assert len(buckets) > 1  # table spans multiple buckets


def test_concurrent_commit_raises(spark, tmp_path):
    """Single-writer assumption enforced: losing the atomic pointer-link
    race raises instead of silently clobbering (SURVEY §7.3 watch list).
    os.link (not rename — POSIX rename silently overwrites, so a zombie
    writer could 'win' a seq it lost): the second committer of seq N must
    deterministically fail with ConcurrentCommitError."""
    from etl_rust_spark.lake.format import ConcurrentCommitError, _commit_pointer

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    ptr = table.pointer()
    # two writers race to the same sequence number: the second link loses
    _commit_pointer(table._manifest_dir, 1, {**ptr, "seq": 1})
    with pytest.raises(ConcurrentCommitError):
        _commit_pointer(table._manifest_dir, 1, {**ptr, "seq": 1, "snapshot_id": "loser"})
    # the table remains readable at the winner's snapshot
    assert table.current_seq() == 1
    assert table.pointer(1)["snapshot_id"] != "loser"


def test_read_transcripts_renumbered(spark, tiny_log, tmp_path):
    """read_transcripts(renumber=True): after deletes leave gaps in
    turn_idx, each conversation's surviving turns come back densely
    indexed 0..n-1 with per-turn text preserved in original turn order."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=8)
    apply_changes(table, _spark_changelog(spark, tiny_log), batch_key="all")
    oracle = replay_oracle_pandas(tiny_log)
    got = read_transcripts(table, renumber=True).toPandas()
    # independent renumber of the oracle
    exp = oracle.sort_values(["conv_id", "turn_idx"]).copy()
    exp["turn_idx"] = exp.groupby("conv_id").cumcount().astype("int32")
    assert_pdf_equal(got, exp.reset_index(drop=True))
    # dense invariant: per conv, turn_idx == 0..n-1
    sizes = got.groupby("conv_id")["turn_idx"].agg(["min", "max", "count"])
    assert (sizes["min"] == 0).all()
    assert (sizes["max"] == sizes["count"] - 1).all()


def test_renumber_engines_agree(spark, tiny_log, tmp_path):
    """The JVM-window renumber (scale path), the Arrow grouped-map (fast
    custom-logic slot, measured 5-8x faster than pandas), and the pandas
    grouped-map must all produce identical results."""
    from etl_rust_spark.operators.apply import renumber_turns

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=8)
    apply_changes(table, _spark_changelog(spark, tiny_log), batch_key="all")
    base = read_transcripts(table)
    a = renumber_turns(base, engine="window").toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    for eng in ("grouped_map", "grouped_map_arrow"):
        b = renumber_turns(base, engine=eng).toPandas().sort_values(
            ["conv_id", "turn_idx"]).reset_index(drop=True)
        assert_pdf_equal(a, b)


def test_raw_delete_with_tombstone_column_folds_not_drops(spark, tmp_path):
    """merge() called directly with a __deleted column AND raw op='D'
    rows: the D rows fold into tombstones (the apply_changes convention)
    instead of being silently discarded — the delete must take effect."""
    from pyspark.sql import functions as F

    from etl_rust_spark.lake.format import IceliteTable
    import pandas as pd

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    sch = ("__lsn long, op string, conv_id string, turn_idx int, role string,"
           " text string, tool string, ts timestamp, __deleted boolean")
    t.merge(
        spark.createDataFrame(
            [(1, "I", "c1", 0, "u", "keep", "", None, False),
             (2, "I", "c2", 0, "u", "kill me", "", None, False)], sch),
        batch_key="b0", seq_col="__lsn", mode="mor",
    )
    # mixed batch: one tombstone-style delete, one RAW op='D' delete
    rec = t.merge(
        spark.createDataFrame(
            [(3, "U", "c1", 0, "u", None, "", None, True),
             (4, "D", "c2", 0, "u", None, "", None, None)], sch),
        batch_key="b1", seq_col="__lsn", mode="mor",
    )
    assert rec["n_deletes"] == 2
    live = read_transcripts(t)
    assert live.count() == 0  # both keys deleted
    # the tombstones exist with the deleting lsn (late smaller-lsn events lose)
    raw = {r["conv_id"]: (r["__lsn"], r["__deleted"])
           for r in t.read().collect()}
    assert raw == {"c1": (3, True), "c2": (4, True)}
