"""Row-level dead-letter queue on ChangelogIngest: malformed WAL events
divert to a quarantine parquet sink with per-rule violation labels while
valid rows merge normally — the pipeline never dies on bad data (the
reference aborts instead, src/etl/manager.rs:92-101). Proofs: table state
equals the valid-rows-only oracle, quarantine holds exactly the bad rows
with the right reasons, replay is content-exactly-once, custom rules and
hooks work, and rules without a sink fail fast."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rust_spark.changelog import CHANGELOG_SCHEMA, write_wal_segments
from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.operators.apply import create_transcript_table
from etl_rust_spark.streaming.driver import ChangelogIngest, read_quarantine

TS = dt.datetime(2025, 1, 1)

# malformed events carry nulls in columns the clean schema marks
# non-nullable — the DLQ's whole point — so the WAL declares them lax
LAX_SCHEMA = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in CHANGELOG_SCHEMA.fields]
)


def _log():
    """8 events: 5 valid; a null conv_id, a null lsn (both also carrying a
    bad op, so multi-rule _violations is exercised), and an unknown op."""
    rows = [
        (1, "I", "c0", 0, "user", "a0", "", TS),
        (2, "I", "c0", 1, "user", "b0", "", TS),
        (3, "I", "c1", 0, "user", "x0", "", TS),
        (None, "Z", "c9", 0, "user", "bad-lsn-op", "", TS),
        (4, "X", "c1", 0, "user", "bad-op", "", TS),
        (5, "U", None, 0, "user", "bad-key", "", TS),
        (6, "U", "c0", 0, "user", "a1", "", TS),
        (7, "D", "c1", 0, "user", None, "", TS),
    ]
    return pd.DataFrame(
        rows,
        columns=["lsn", "op", "conv_id", "turn_idx", "role", "text",
                 "tool", "ts"],
    )


def _ingest(spark, tmp_path, **kw):
    wal = str(tmp_path / "wal")
    if not (tmp_path / "wal").exists():
        write_wal_segments(_log(), wal, 2, spark, schema=LAX_SCHEMA)
    if not (tmp_path / "tbl").exists():
        create_transcript_table(spark, str(tmp_path / "tbl"), n_buckets=4)
    return ChangelogIngest(
        spark=spark, wal_dir=wal, table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"), schema=LAX_SCHEMA,
        name="dlq", mode="mor",
        quarantine_dir=str(tmp_path / "quarantine"), **kw,
    )


def test_bad_rows_divert_and_good_rows_merge(spark, tmp_path):
    ing = _ingest(spark, tmp_path)
    ing.run_available()
    tbl = IceliteTable.load(spark, str(tmp_path / "tbl"))
    live = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in tbl.read()
        .filter(~F.coalesce(F.col("__deleted"), F.lit(False))).collect()
    }
    # valid rows only: c0/0 updated to a1, c0/1=b0, c1/0 deleted at lsn 7
    assert live == {("c0", 0): "a1", ("c0", 1): "b0"}

    q = read_quarantine(spark, str(tmp_path / "quarantine"))
    got = {
        r["text"]: set(r["_violations"]) for r in q.collect()
    }
    assert got == {
        "bad-lsn-op": {"lsn_not_null", "op_valid"},
        "bad-op": {"op_valid"},
        "bad-key": {"conv_id_not_null"},
    }
    assert {r["_pipeline"] for r in q.collect()} == {"dlq"}
    assert sum(n for _, n in ing.quarantined) == 3


def test_replay_is_content_exactly_once(spark, tmp_path):
    _ingest(spark, tmp_path).run_available()
    tbl = IceliteTable.load(spark, str(tmp_path / "tbl"))
    seq = tbl.current_seq()
    q1 = sorted(
        (r["text"], r["_epoch_id"])
        for r in read_quarantine(spark, str(tmp_path / "quarantine")).collect()
    )
    # same checkpoint, nothing new: no table commit, quarantine unchanged
    _ingest(spark, tmp_path).run_available()
    assert IceliteTable.load(spark, str(tmp_path / "tbl")).current_seq() == seq
    q2 = sorted(
        (r["text"], r["_epoch_id"])
        for r in read_quarantine(spark, str(tmp_path / "quarantine")).collect()
    )
    assert q1 == q2


def test_custom_rule_and_hook(spark, tmp_path):
    seen = []
    ing = _ingest(
        spark, tmp_path,
        rules={"text_short": "length(text) <= 3",
               "lsn_not_null": "lsn IS NOT NULL"},
        on_quarantine=lambda epoch, n: seen.append((epoch, n)),
    )
    ing.run_available()
    q = read_quarantine(spark, str(tmp_path / "quarantine"))
    texts = {r["text"] for r in q.collect()}
    # custom rules replace the defaults: long texts + the null lsn row
    # (a NULL text fails "length(text) <= 3" — null predicate = violation)
    assert texts == {"bad-lsn-op", "bad-op", "bad-key", None}
    assert sum(n for _, n in seen) == q.count()


def test_rules_without_sink_fail_fast(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal_segments(_log(), wal, 1, spark, schema=LAX_SCHEMA)
    create_transcript_table(spark, str(tmp_path / "tbl"), n_buckets=2)
    bad = ChangelogIngest(
        spark=spark, wal_dir=wal, table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"), schema=LAX_SCHEMA,
        rules={"lsn_not_null": "lsn IS NOT NULL"},
    )
    with pytest.raises(Exception, match="quarantine_dir"):
        bad.run_available()
    with pytest.raises(FileNotFoundError, match="no quarantined"):
        read_quarantine(spark, str(tmp_path / "nothing"))

def test_table_checks_divert_rows_instead_of_failing(spark, tmp_path):
    """A table CHECK constraint + quarantine_dir: violating live rows
    divert as rule ``check_<name>`` (deletes exempt, NULL passes — CHECK
    semantics, not the rule language's null-is-violation), the stream
    survives, and the table equals the clean-rows oracle."""
    rows = [
        (1, "I", "c0", 0, "user", "ok", "", TS),
        (2, "I", "c0", 1, "user", "way-too-long-text", "", TS),  # violates
        (3, "I", "c1", 0, "user", None, "", TS),           # NULL passes
        (4, "D", "c2", 0, "user", "also-way-too-long", "", TS),  # del exempt
        (5, "I", None, 0, "user", "bad-key", "", TS),      # default rule
    ]
    log = pd.DataFrame(rows, columns=["lsn", "op", "conv_id", "turn_idx",
                                      "role", "text", "tool", "ts"])
    wal = str(tmp_path / "wal")
    write_wal_segments(log, wal, 2, spark, schema=LAX_SCHEMA)
    tbl = create_transcript_table(spark, str(tmp_path / "tbl"), n_buckets=4)
    tbl.add_check("text_short", "length(text) <= 8")
    ing = ChangelogIngest(
        spark=spark, wal_dir=wal, table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"), schema=LAX_SCHEMA,
        name="dlqchk", mode="mor",
        quarantine_dir=str(tmp_path / "quarantine"),
    )
    ing.run_available()  # must NOT raise CheckViolationError
    live = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in IceliteTable.load(spark, str(tmp_path / "tbl")).read()
        .filter(~F.coalesce(F.col("__deleted"), F.lit(False))).collect()
    }
    assert live == {("c0", 0): "ok", ("c1", 0): None}
    q = read_quarantine(spark, str(tmp_path / "quarantine"))
    got = {r["text"]: set(r["_violations"]) for r in q.collect()}
    assert got == {"way-too-long-text": {"check_text_short"},
                   "bad-key": {"conv_id_not_null"}}


def test_checks_without_quarantine_fail_the_batch(spark, tmp_path):
    """No quarantine_dir: merge's writer-side enforcement fails the
    stream fast — nothing lands, the table stays untouched."""
    from etl_rust_spark.lake.format import CheckViolationError

    rows = [(1, "I", "c0", -1, "user", "neg", "", TS)]
    log = pd.DataFrame(rows, columns=["lsn", "op", "conv_id", "turn_idx",
                                      "role", "text", "tool", "ts"])
    wal = str(tmp_path / "wal")
    write_wal_segments(log, wal, 1, spark, schema=LAX_SCHEMA)
    tbl = create_transcript_table(spark, str(tmp_path / "tbl"), n_buckets=2)
    tbl.add_check("turn_nonneg", "turn_idx >= 0")
    seq0 = tbl.current_seq()
    ing = ChangelogIngest(
        spark=spark, wal_dir=wal, table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"), schema=LAX_SCHEMA,
        name="nofence", mode="mor",
    )
    with pytest.raises(Exception) as ei:
        ing.run_available()
    # foreachBatch wraps the error; the root cause must be the CHECK
    assert "turn_nonneg" in str(ei.value)
    assert IceliteTable.load(
        spark, str(tmp_path / "tbl")).current_seq() == seq0


def test_unresolvable_check_fails_at_start(spark, tmp_path):
    """A CHECK referencing a column the WAL schema lacks cannot divert
    pre-transform — start() fails loud with the opt-out named."""
    rows = [(1, "I", "c0", 0, "user", "ok", "", TS)]
    log = pd.DataFrame(rows, columns=["lsn", "op", "conv_id", "turn_idx",
                                      "role", "text", "tool", "ts"])
    wal = str(tmp_path / "wal")
    write_wal_segments(log, wal, 1, spark, schema=LAX_SCHEMA)
    tbl = create_transcript_table(spark, str(tmp_path / "tbl"), n_buckets=2)
    # evolve a column onto the table, then constrain it: the WAL events
    # do not carry it
    import datetime as _dt
    evolved = spark.createDataFrame(
        [(9, "I", "cx", 0, "user", "t", "", TS, 1.0)],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp, score double")
    from etl_rust_spark.operators.apply import apply_changes
    apply_changes(tbl, evolved, batch_key="evolve", mode="mor")
    tbl.add_check("score_pos", "score > 0")
    ing = ChangelogIngest(
        spark=spark, wal_dir=wal, table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"), schema=LAX_SCHEMA,
        name="unres", mode="mor",
        quarantine_dir=str(tmp_path / "quarantine"),
    )
    # run_available name-wraps (B10): match the root cause message
    with pytest.raises(Exception, match="quarantine_checks=False"):
        ing.run_available()
    # the opt-out works: enforcement falls back to merge (NULL passes ->
    # the clean row lands)
    ok = ChangelogIngest(
        spark=spark, wal_dir=wal, table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck2"), schema=LAX_SCHEMA,
        name="unres2", mode="mor",
        quarantine_dir=str(tmp_path / "quarantine"),
        quarantine_checks=False,
    )
    ok.run_available()
    assert IceliteTable.load(spark, str(tmp_path / "tbl")).read() \
        .filter("conv_id = 'c0'").count() == 1
