"""Skew fixture (FIXTURES.md §F2): one conversation holds ~50% of events.
The job must complete and match the oracle both with the default
partial-agg path and the explicit two-phase salted path; the skew-aware
write must spread the hot conversation across multiple files."""


from etl_rust_spark.changelog import (
    CHANGELOG_SCHEMA,
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


def test_hot_conversation_matches_oracle(spark, tmp_path):
    log = generate_changelog_pandas(
        ChangelogConfig(
            n_events=20000, n_conversations=40, turns_per_conv=25,
            hot_share=0.5, dup_fraction=0.05, delete_fraction=0.05,
        )
    )
    hot = log.conv_id.value_counts(normalize=True)
    assert hot.iloc[0] > 0.45  # fixture sanity

    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=8)
    sdf = spark.createDataFrame(log, schema=CHANGELOG_SCHEMA)
    apply_changes(table, sdf, batch_key="b0", salt_buckets=16)
    assert_pdf_equal(read_transcripts(table).toPandas(), replay_oracle_pandas(log))

    # same input, unsalted path (map-side partial agg) — identical result
    table2 = create_transcript_table(spark, str(tmp_path / "t2"), n_buckets=8)
    apply_changes(table2, sdf, batch_key="b0")
    assert_pdf_equal(
        read_transcripts(table2).toPandas(), replay_oracle_pandas(log)
    )
