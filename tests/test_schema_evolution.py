"""M4 — mid-stream schema evolution: the envelope gains a `meta` column;
old rows are null-backfilled in the merged sink schema (the capability the
reference lacks entirely — its sink DDL is fixed up front,
/root/reference/example/src/migration.rs:6-26)."""

import numpy as np
import pandas as pd
import pytest

from etl_rust_spark.changelog import (
    CHANGELOG_SCHEMA,
    CHANGELOG_SCHEMA_EVOLVED,
    ChangelogConfig,
    generate_changelog_pandas,
    replay_oracle_pandas,
)
from etl_rust_spark.operators.apply import (
    apply_changes,
    create_transcript_table,
    read_transcripts,
)
from tests.conftest import assert_pdf_equal


def test_meta_column_appears_mid_stream(spark, tmp_path):
    cfg = ChangelogConfig(
        n_events=1000, n_conversations=8, turns_per_conv=15, evolve_after=500,
        shuffle_order=False,
    )
    log = generate_changelog_pandas(cfg)
    pre, post = log[log.lsn < 500], log[log.lsn >= 500]

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    # batch 1: pre-evolution envelope (no meta column at all)
    apply_changes(
        table,
        spark.createDataFrame(pre.drop(columns=["meta"]), schema=CHANGELOG_SCHEMA),
        batch_key="b0",
    )
    assert "meta" not in [f.name for f in table.schema.fields]
    # batch 2: evolved envelope
    apply_changes(
        table,
        spark.createDataFrame(post, schema=CHANGELOG_SCHEMA_EVOLVED),
        batch_key="b1",
    )
    assert "meta" in [f.name for f in table.schema.fields]

    actual = read_transcripts(table).toPandas()
    expected = replay_oracle_pandas(log)
    assert_pdf_equal(actual, expected)
    # both populations exist: null-backfilled pre-evolution rows and
    # meta-carrying post-evolution rows (equality with the oracle above
    # proves the per-row backfill values themselves)
    assert actual.meta.isna().any()
    assert actual.meta.notna().any()


def test_type_conflict_is_rejected(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    bad = pd.DataFrame(
        [[1, "I", "c", np.int32(0), "user", "x", "", pd.Timestamp("2025-01-01"), 3]],
        columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "meta"],
    )
    schema_bad = "lsn long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp, meta long"
    good = spark.createDataFrame(bad, schema=schema_bad)
    apply_changes(table, good, batch_key="b0")  # meta:long evolves in
    with pytest.raises(TypeError, match="type conflict"):
        apply_changes(
            table,
            spark.createDataFrame(
                bad.assign(meta="s", lsn=2),
                schema=schema_bad.replace("meta long", "meta string"),
            ),
            batch_key="b1",
        )
