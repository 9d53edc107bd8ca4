"""Writer-enforced CHECK constraints (Delta ``ADD CONSTRAINT`` semantics,
public): boolean SQL rules stored in the snapshot pointer, enforced on
every merge/apply_changes/update_where batch BEFORE any file is written.
Reference analog: the reference validates rows at its sink boundary
(src/etl/processor.rs error paths); here the rule set is table metadata
so every writer shares it."""

import datetime as dt

import pytest
from pyspark.sql import types as T

from etl_rust_spark.lake.format import CheckViolationError, IceliteTable
from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

CHANGE_SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)
TS = dt.datetime(2025, 1, 1)


def _rows(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _clean(spark, conv="c0", lsn0=0, n=3):
    return _rows(
        spark,
        [(lsn0 + t, "I", conv, t, "user", f"{conv} t{t}", "", TS) for t in range(n)],
    )


def test_violating_merge_rejected_before_write(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    t.add_check("nonempty_text", "length(text) > 0")
    apply_changes(t, _clean(spark), batch_key="b0", mode="mor")
    seq = t.current_seq()
    before = sorted(map(tuple, t.read().collect()))

    bad = _rows(spark, [(100, "I", "c1", 0, "user", "", "", TS)])
    with pytest.raises(CheckViolationError, match="nonempty_text: 1 rows"):
        apply_changes(t, bad, batch_key="b1", mode="mor")
    # nothing committed, ledger untouched: the SAME batch key retries
    assert t.current_seq() == seq
    assert sorted(map(tuple, t.read().collect())) == before
    fixed = _rows(spark, [(100, "I", "c1", 0, "user", "fixed", "", TS)])
    assert apply_changes(t, fixed, batch_key="b1", mode="mor") is not None
    assert t.current_seq() == seq + 1


def test_null_predicate_passes_ansi(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    t.add_check("tool_short", "length(tool) < 100")
    null_tool = _rows(spark, [(0, "I", "c0", 0, "user", "hi", None, TS)])
    assert apply_changes(t, null_tool, batch_key="b0", mode="mor") is not None
    assert t.read().count() == 1


def test_deletes_are_exempt(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _clean(spark), batch_key="b0", mode="mor")
    t.add_check("nonempty_text", "length(text) > 0")
    # the delete's payload violates the rule — removing a bad row is legal
    d = _rows(spark, [(100, "D", "c0", 0, "user", "", "", TS)])
    assert apply_changes(t, d, batch_key="b1", mode="mor") is not None
    live = t.read().filter("NOT __deleted")
    assert live.filter("conv_id = 'c0' AND turn_idx = 0").count() == 0


def test_add_check_validates_existing_rows(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    dirty = _rows(spark, [(0, "I", "c0", 0, "user", "", "", TS)])
    apply_changes(t, dirty, batch_key="b0", mode="mor")
    with pytest.raises(CheckViolationError, match="existing rows"):
        t.add_check("nonempty_text", "length(text) > 0")
    assert "checks" not in (t.pointer().get("checks") or {})
    # known-dirty table: skip validation, rule still guards NEW batches
    t.add_check("nonempty_text", "length(text) > 0", validate=False)
    bad = _rows(spark, [(10, "I", "c1", 0, "user", "", "", TS)])
    with pytest.raises(CheckViolationError):
        apply_changes(t, bad, batch_key="b1", mode="mor")


def test_drop_check_and_registry_errors(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    t.add_check("r1", "turn_idx >= 0")
    with pytest.raises(ValueError, match="already exists"):
        t.add_check("r1", "turn_idx >= 1")
    with pytest.raises(KeyError, match="no CHECK named"):
        t.drop_check("nope")
    t.drop_check("r1")
    assert not t.pointer().get("checks")
    bad = _rows(spark, [(0, "I", "c0", -5, "user", "x", "", TS)])
    assert apply_changes(t, bad, batch_key="b0", mode="mor") is not None


def test_bad_expressions_rejected_at_add(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    with pytest.raises(ValueError, match="boolean"):
        t.add_check("notbool", "length(text)")
    with pytest.raises(ValueError):
        t.add_check("unresolvable", "no_such_column > 0")
    with pytest.raises(ValueError, match="name and a SQL expression"):
        t.add_check("empty", "   ")


def test_update_where_enforced(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _clean(spark), batch_key="b0", mode="mor")
    t.add_check("text_short", "length(text) <= 10")
    seq = t.current_seq()
    with pytest.raises(CheckViolationError):
        t.update_where(
            [("conv_id", "=", "c0")], {"text": "repeat('x', 20)"}
        )
    assert t.current_seq() == seq
    t.update_where([("conv_id", "=", "c0")], {"text": "'ok'"})
    assert t.read().filter("NOT __deleted AND text = 'ok'").count() == 3


def test_schema_evolution_guards(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    t.add_check("nonempty_text", "length(text) > 0")
    t.add_check("tool_short", "length(tool) < 100")
    with pytest.raises(ValueError, match="would break CHECK 'nonempty_text'"):
        t.rename_column("text", "body")
    with pytest.raises(ValueError, match="would break CHECK 'tool_short'"):
        t.drop_column("tool")
    t.drop_check("nonempty_text")
    t.rename_column("text", "body")
    assert t.pointer().get("checks") == {"tool_short": "length(tool) < 100"}


def test_clone_carries_checks(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _clean(spark), batch_key="b0", mode="mor")
    t.add_check("nonempty_text", "length(text) > 0")
    c = t.clone(str(tmp_path / "c"))
    assert c.pointer().get("checks") == {"nonempty_text": "length(text) > 0"}
    bad = _rows(spark, [(100, "I", "c9", 0, "user", "", "", TS)])
    with pytest.raises(CheckViolationError):
        apply_changes(c, bad, batch_key="b1", mode="mor")


def test_checks_visible_in_describe_and_history(spark, tmp_path):
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    pre = t.current_seq()
    t.add_check("r1", "turn_idx >= 0")
    assert t.describe()["checks"] == {"r1": "turn_idx >= 0"}
    # time travel: the rule set in force at each commit is recorded
    assert not (t.pointer(pre).get("checks") or {})
    assert t.pointer(t.current_seq())["checks"] == {"r1": "turn_idx >= 0"}


def test_additive_tables_refuse_checks(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("__lsn", T.LongType()),
        ]
    )
    t = IceliteTable.create(
        spark, str(tmp_path / "a"), schema, key_cols=["k"], bucket_key="k",
        n_buckets=2, order_cols=["k"], seq_col="__lsn", agg_cols={"n": "sum"},
    )
    with pytest.raises(ValueError, match="additive"):
        t.add_check("pos", "n >= 0")


def test_native_sink_refuses_checked_table(spark, tmp_path):
    from etl_rust_spark.sources.icelite_sink import IceliteStreamWriter

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    t.add_check("nonempty_text", "length(text) > 0")
    schema = T.StructType.fromJson(t.pointer()["schema"])
    with pytest.raises(ValueError, match="CHECK constraints"):
        IceliteStreamWriter({"path": str(tmp_path / "t")}, schema)
    # the replication escape hatch: upstream already enforced them
    IceliteStreamWriter(
        {"path": str(tmp_path / "t"), "upstreamchecked": "true"}, schema
    )


def test_check_report_counts_without_raising(spark, tmp_path):
    """check_report: violation counts over live rows in one pass —
    reports, never raises; tombstones excluded; ad-hoc extra rules ride
    the same aggregation; CLI twin exits 1 on findings."""
    from etl_rust_spark.__main__ import main

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    apply_changes(t, _rows(spark, [
        (1, "I", "c0", 0, "user", "ok", "", TS),
        (2, "I", "c0", 1, "assistant", "way-too-long-here", "", TS),
        (3, "I", "c1", 0, "user", "fine", "", TS),
    ]), batch_key="seed", mode="mor")
    # constrain AFTER the bad row exists (validate=False = known-dirty)
    t.add_check("text_short", "length(text) <= 8", validate=False)
    rep = t.check_report()
    assert rep == {"text_short": 1}
    # a tombstoned violator stops counting
    t.delete_where([("conv_id", "=", "c0")], batch_key="purge")
    rep = t.check_report(extra={"role_known": "role in ('user')"})
    assert rep == {"text_short": 0, "role_known": 0}
    # CLI: clean = exit 0; findings (ad-hoc rule) = exit 1
    assert main(["check", "--table", str(tmp_path / "t"), "--report"]) == 0
    assert main(["check", "--table", str(tmp_path / "t"), "--report",
                 "--rule", "never=text IS NULL"]) == 1


def test_checks_survive_maintenance_commits(spark, tmp_path):
    """Every commit path re-emits the pointer: compact / rewrite_manifests
    / expire must all carry the checks map forward (a maintenance op that
    dropped it would silently disarm every writer)."""
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    for i in range(3):
        apply_changes(t, _clean(spark, conv=f"c{i}", lsn0=i * 10),
                      batch_key=f"b{i}", mode="mor")
    t.add_check("turn_nonneg", "turn_idx >= 0")
    t.compact()
    t.rewrite_manifests(target_files_per_manifest=2)
    t.expire_snapshots(keep_last=2)
    assert t.pointer().get("checks") == {"turn_nonneg": "turn_idx >= 0"}
    # and the constraint still bites after the maintenance chain
    with pytest.raises(CheckViolationError):
        apply_changes(
            t,
            _rows(spark, [(99, "I", "cx", -1, "user", "bad", "", TS)]),
            batch_key="bad", mode="mor",
        )
