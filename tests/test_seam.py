"""TableFormat seam: dispatch, availability gating, and the Iceberg MERGE
SQL — all testable without an Iceberg jar (this container ships none)."""

from __future__ import annotations

import pytest

from etl_rust_spark.lake import seam
from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.operators.apply import create_transcript_table


def test_icelite_satisfies_tableformat(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    assert isinstance(table, seam.TableFormat)


def test_auto_dispatch_without_jar(spark, tmp_path):
    """No Iceberg runtime here: auto must fall back to Icelite for paths,
    and an explicit iceberg request must fail loudly, not silently."""
    create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    assert not seam.iceberg_available(spark)
    t = seam.open_table(spark, str(tmp_path / "t"))
    assert isinstance(t, IceliteTable)
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        seam.open_table(spark, "cat.db.tbl", format="iceberg")


def test_auto_dispatch_with_mocked_jar(spark, tmp_path, monkeypatch):
    """With availability mocked on, a catalog identifier routes to
    IcebergFormat and a filesystem path still routes to Icelite."""
    monkeypatch.setattr(seam, "iceberg_available", lambda s: True)
    create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    assert isinstance(seam.open_table(spark, str(tmp_path / "t")), IceliteTable)
    t = seam.open_table(spark, "cat.db.transcripts")
    assert isinstance(t, seam.IcebergFormat)
    assert t.identifier == "cat.db.transcripts"


def test_merge_sql_shape():
    sql = seam.build_merge_sql("cat.db.t", "src", ["conv_id", "turn_idx"])
    assert "MERGE INTO cat.db.t t USING src s" in sql
    assert "t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in sql
    assert "WHEN MATCHED AND s.__deleted THEN DELETE" in sql
    assert "WHEN MATCHED THEN UPDATE SET *" in sql
    assert "WHEN NOT MATCHED AND NOT s.__deleted THEN INSERT *" in sql


def test_iceberg_merge_uses_explicit_keys(spark, monkeypatch):
    """Merge keys come from the caller (or table identifier fields), never
    positional guessing — covers a table whose keys are NOT its first two
    columns (ADVICE r02)."""
    monkeypatch.setattr(seam, "iceberg_available", lambda s: True)
    fmt = seam.IcebergFormat(spark, "cat.db.t", key_cols=["sid", "version"])
    captured = []
    monkeypatch.setattr(spark, "sql", lambda q: captured.append(q))
    df = spark.createDataFrame(
        [("x", 9, 1, 2, "U")], "a string, b int, sid int, version int, op string"
    )  # keys are columns 3-4, not 1-2
    fmt.merge(df, batch_key="b1")
    assert "t.sid = s.sid AND t.version = s.version" in captured[0]
    assert "t.a = s.a" not in captured[0]


def test_iceberg_merge_uses_identifier_fields(spark, monkeypatch):
    """Without explicit key_cols the table's declared identifier fields
    are used."""
    monkeypatch.setattr(seam, "iceberg_available", lambda s: True)
    fmt = seam.IcebergFormat(spark, "cat.db.t")
    monkeypatch.setattr(
        fmt, "_identifier_fields", lambda: ["conv_id", "turn_idx"]
    )
    captured = []
    monkeypatch.setattr(spark, "sql", lambda q: captured.append(q))
    df = spark.createDataFrame(
        [("c", 0, "U")], "conv_id string, turn_idx int, op string"
    )
    fmt.merge(df)
    assert "t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in captured[0]


def test_iceberg_merge_refuses_to_guess_keys(spark, monkeypatch):
    """No explicit keys and no declared identifier fields: raise before
    issuing any SQL (a guessed ON clause would corrupt the target)."""
    monkeypatch.setattr(seam, "iceberg_available", lambda s: True)
    fmt = seam.IcebergFormat(spark, "cat.db.t")
    monkeypatch.setattr(fmt, "_identifier_fields", lambda: None)
    issued = []
    monkeypatch.setattr(spark, "sql", lambda q: issued.append(q))
    with pytest.raises(ValueError, match="no merge keys"):
        fmt.merge(spark.createDataFrame([("c", "U")], "conv_id string, op string"))
    assert issued == []
