"""IceliteCatalog: named tables over a root dir + the spark.sql surface
(temp views of current snapshots) — multi-table deployments address the
lake like a database."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rust_spark.lake.catalog import IceliteCatalog
from etl_rust_spark.operators.apply import apply_changes

CHANGE_SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)
TS = dt.datetime(2025, 1, 1)

TRANSCRIPT_SCHEMA = (
    T.StructType()
    .add("conv_id", T.StringType())
    .add("turn_idx", T.IntegerType())
    .add("role", T.StringType())
    .add("text", T.StringType())
    .add("tool", T.StringType())
    .add("ts", T.TimestampType())
)


def _mk(cat, name):
    return cat.create_table(
        name, TRANSCRIPT_SCHEMA, key_cols=["conv_id", "turn_idx"],
        bucket_key="conv_id", n_buckets=4, seq_col="__lsn",
    )


def _apply(spark, t, rows, key):
    apply_changes(
        t, spark.createDataFrame(rows, CHANGE_SCHEMA), batch_key=key, mode="mor"
    )


def test_catalog_lifecycle_and_sql_join(spark, tmp_path):
    cat = IceliteCatalog(spark, str(tmp_path / "lake"))
    assert cat.list_tables() == []
    a, b = _mk(cat, "convs"), _mk(cat, "labels")
    assert cat.list_tables() == ["convs", "labels"]

    _apply(spark, a, [
        (1, "I", "c1", 0, "user", "hello", "", TS),
        (2, "I", "c2", 0, "user", "world", "", TS),
    ], "b0")
    _apply(spark, b, [
        (1, "I", "c1", 0, "sys", "GOOD", "", TS),
    ], "b0")

    # plain spark.sql across two lake tables, by name
    out = cat.sql(
        """
        SELECT t.conv_id, t.text, l.text AS label
        FROM convs t LEFT JOIN labels l
          ON t.conv_id = l.conv_id AND t.turn_idx = l.turn_idx
        WHERE NOT t.__deleted
        ORDER BY t.conv_id
        """
    )
    got = [(r["conv_id"], r["text"], r["label"]) for r in out.collect()]
    assert got == [("c1", "hello", "GOOD"), ("c2", "world", None)]

    # views are snapshot-pinned at registration; re-register advances
    cat.register_views()
    _apply(spark, a, [(3, "I", "c3", 0, "user", "late", "", TS)], "b1")
    stale = spark.sql("SELECT count(*) AS n FROM convs").first()["n"]
    assert stale == 2
    cat.register_views()
    assert spark.sql("SELECT count(*) AS n FROM convs").first()["n"] == 3

    # load-by-name round-trips to the same table
    assert cat.load("convs").current_seq() == a.current_seq()
    with pytest.raises(FileNotFoundError):
        cat.load("nope")
    with pytest.raises(ValueError):
        cat.load("../escape")

    cat.drop_table("labels")
    assert cat.list_tables() == ["convs"]


def test_catalog_prefix_and_subset_registration(spark, tmp_path):
    cat = IceliteCatalog(spark, str(tmp_path / "lake"))
    t = _mk(cat, "convs")
    _apply(spark, t, [(1, "I", "c1", 0, "user", "x", "", TS)], "b0")
    views = cat.register_views(names=["convs"], prefix="lake_")
    assert views == ["lake_convs"]
    assert spark.sql("SELECT count(*) AS n FROM lake_convs").first()["n"] == 1


def test_catalog_historical_views_as_of_and_tag(spark, tmp_path):
    """register_views(as_of=) / (tag=) projects every table at the same
    historical instant (or named pin) — a cross-table time-travel SQL
    surface; tables missing the tag fail loud instead of silently
    contributing current rows to a historical query."""
    import time

    cat = IceliteCatalog(spark, str(tmp_path / "lake"))
    a, b = _mk(cat, "convs"), _mk(cat, "labels")
    _apply(spark, a, [(1, "I", "c1", 0, "user", "v1", "", TS)], "a0")
    _apply(spark, b, [(1, "I", "c1", 0, "user", "gold", "", TS)], "b0")
    a.tag_snapshot("march_run")
    b.tag_snapshot("march_run")
    time.sleep(0.3)
    t_mid = time.time()
    time.sleep(0.3)
    _apply(spark, a, [(2, "U", "c1", 0, "user", "v2", "", TS)], "a1")
    _apply(spark, b, [(2, "U", "c1", 0, "user", "silver", "", TS)], "b1")

    # current views see the updates
    cat.register_views()
    cur = spark.sql(
        "SELECT c.text AS t, l.text AS lab FROM convs c "
        "JOIN labels l ON c.conv_id = l.conv_id AND c.turn_idx = l.turn_idx"
    ).first()
    assert (cur["t"], cur["lab"]) == ("v2", "silver")

    # the same join at the historical instant sees only the old rows
    cat.register_views(as_of=t_mid)
    old = spark.sql(
        "SELECT c.text AS t, l.text AS lab FROM convs c "
        "JOIN labels l ON c.conv_id = l.conv_id AND c.turn_idx = l.turn_idx"
    ).first()
    assert (old["t"], old["lab"]) == ("v1", "gold")

    # tag-pinned lake: the reproducibility surface
    cat.register_views(tag="march_run")
    tagged = spark.sql("SELECT text FROM convs").collect()
    assert [r["text"] for r in tagged] == ["v1"]

    # a table without the tag fails loud
    _mk(cat, "extras")
    with pytest.raises(FileNotFoundError, match="march_run"):
        cat.register_views(names=["extras"], tag="march_run")
    with pytest.raises(ValueError, match="not one of each"):
        cat.register_views(as_of=t_mid, tag="march_run")


def test_catalog_export_consistent_cut(spark, tmp_path):
    """export(dest, as_of=) clones every table at ONE instant — the
    multi-table DR move: restored tables read exactly as the lake stood
    at the cut, a table born after the cut is skipped, and a current
    (no as_of) export pins each table's snapshot at call time."""
    import time

    cat = IceliteCatalog(spark, str(tmp_path / "lake"))
    a, b = _mk(cat, "convs"), _mk(cat, "labels")
    _apply(spark, a, [(1, "I", "c1", 0, "user", "v1", "", TS)], "a0")
    _apply(spark, b, [(1, "I", "c1", 0, "user", "gold", "", TS)], "b0")
    time.sleep(0.3)
    t_mid = time.time()
    time.sleep(0.3)
    _apply(spark, a, [(2, "U", "c1", 0, "user", "v2", "", TS)], "a1")
    _mk(cat, "late")  # born after the cut: skipped by the as_of export

    exported = cat.export(str(tmp_path / "backup"), as_of=t_mid)
    assert exported == {"convs": 1, "labels": 1}
    bak = IceliteCatalog(spark, str(tmp_path / "backup"))
    assert bak.list_tables() == ["convs", "labels"]
    got = bak.sql(
        "SELECT c.text AS t, l.text AS lab FROM convs c "
        "JOIN labels l ON c.conv_id = l.conv_id AND c.turn_idx = l.turn_idx"
    ).first()
    assert (got["t"], got["lab"]) == ("v1", "gold")

    # restored table resumes the feed exactly-once (ledger carried)
    restored = bak.load("convs")
    assert restored.is_applied("a0")

    # current export (quiesced writers): sees the update and the late table
    cur = cat.export(str(tmp_path / "backup2"))
    assert cur == {"convs": 2, "labels": 1, "late": 0}
    bak2 = IceliteCatalog(spark, str(tmp_path / "backup2"))
    assert [r["text"] for r in bak2.sql(
        "SELECT text FROM convs WHERE NOT __deleted ORDER BY text"
    ).collect()] == ["v2"]

    # subset export
    sub = cat.export(str(tmp_path / "backup3"), names=["labels"])
    assert list(sub) == ["labels"]


def test_catalog_fsck_aggregates_per_table_reports(spark, tmp_path):
    """Catalog-wide fsck: the DR-verify composition (export -> restore
    -> fsck) in one call — every table checked, one bad table flips the
    aggregate without hiding the healthy ones, an unloadable directory
    is a finding rather than a crash, and deep mode counts footers."""
    import os

    cat = IceliteCatalog(spark, str(tmp_path / "lake"))
    a, b = _mk(cat, "convs"), _mk(cat, "labels")
    _apply(spark, a, [(1, "I", "c1", 0, "user", "hello", "", TS)], "b0")
    _apply(spark, b, [(1, "I", "c1", 0, "sys", "GOOD", "", TS)], "b0")

    rep = cat.fsck(deep=True)
    assert rep["ok"] and set(rep["tables"]) == {"convs", "labels"}
    assert all(r["checked"]["footers"] > 0 for r in rep["tables"].values())

    # export -> fsck the restored catalog: the DR loop end-to-end
    cat.export(str(tmp_path / "backup"))
    restored = IceliteCatalog(spark, str(tmp_path / "backup"))
    assert restored.fsck(deep=True)["ok"]

    # corrupt ONE table: only it reports, aggregate flips
    f = [e["path"] for e in a._files(a.pointer())][0]
    os.remove(f)
    rep = cat.fsck()
    assert not rep["ok"]
    assert not rep["tables"]["convs"]["ok"]
    assert rep["tables"]["labels"]["ok"]
    assert cat.fsck(names=["labels"])["ok"]  # subset scoping

    # a table-shaped dir whose metadata is gutted (has _manifests, no
    # pointer) is a finding, not a sweep abort
    os.makedirs(str(tmp_path / "lake" / "junk" / "_manifests"))
    rep = cat.fsck()
    assert "junk" in rep["tables"] and not rep["tables"]["junk"]["ok"]
    assert rep["tables"]["junk"]["errors"]  # reported, not raised
    assert rep["tables"]["labels"]["ok"]
