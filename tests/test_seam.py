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
