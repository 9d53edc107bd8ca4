"""Platform test: the whole CDC system running CONCURRENTLY — one WAL
ingest feeding a fact table while five live downstream consumers tail
its change feed (SCD2 history, additive rollup, dim enrichment, a
materialized chunk transform, and a bidirectional join materialization
tailing BOTH the facts and the dim), all on one SparkSession — then
every table is verified against an independent oracle. The system-level
analog of the reference's multi-pipeline manager
(/root/reference/src/etl/manager.rs:76-102), with the part the
reference cannot do: each hop is exactly-once and replayable."""

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rust_spark.changelog import (
    CHANGELOG_SCHEMA,
    ChangelogConfig,
    generate_changelog_pandas,
    replay_oracle_pandas,
    write_wal_segments,
)
from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.operators.apply import create_transcript_table, read_transcripts
from etl_rust_spark.streaming.driver import ChangeFeedRollup, ChangelogIngest
from etl_rust_spark.streaming.enrich import ChangeFeedEnrich
from etl_rust_spark.streaming.join import ChangeFeedJoin
from etl_rust_spark.streaming.scd2 import ChangeFeedScd2
from etl_rust_spark.streaming.transform import ChangeFeedTransform
from tests.conftest import assert_pdf_equal


def test_concurrent_pipelines_all_converge(spark, tmp_path):
    log = generate_changelog_pandas(ChangelogConfig(
        n_events=6000, n_conversations=40, turns_per_conv=10, seed=21))
    wal = str(tmp_path / "wal")
    write_wal_segments(log, wal, 3, spark)
    facts_path = str(tmp_path / "facts")
    create_transcript_table(spark, facts_path, n_buckets=4)

    dim = IceliteTable.create(
        spark, str(tmp_path / "dim"),
        T.StructType([T.StructField("conv_id", T.StringType()),
                      T.StructField("label", T.StringType()),
                      T.StructField("dlsn", T.LongType())]),
        key_cols=("conv_id",), bucket_key="conv_id", n_buckets=4,
        seq_col="dlsn",
    )
    dim.merge(
        spark.createDataFrame(
            [(f"conv-{i:06d}", "even" if i % 2 == 0 else "odd", i + 1)
             for i in range(40)],
            "conv_id string, label string, dlsn long",
        ).withColumn("op", F.lit("U")),
        batch_key="d0", seq_col="dlsn", mode="mor",
    )

    ChangeFeedScd2.create_target(
        spark, str(tmp_path / "hist"), facts_path, n_buckets=4)
    ChangeFeedRollup.create_target(
        spark, str(tmp_path / "roll"), facts_path,
        key_cols=("conv_id",), aggs={"n_changes": "count"}, n_buckets=4)
    ChangeFeedEnrich.create_target(
        spark, str(tmp_path / "enr"), facts_path, str(tmp_path / "dim"),
        n_buckets=4)
    IceliteTable.create(
        spark, str(tmp_path / "chunks"),
        T.StructType([T.StructField("conv_id", T.StringType()),
                      T.StructField("turn_idx", T.IntegerType()),
                      T.StructField("chunk_idx", T.IntegerType()),
                      T.StructField("chunk", T.StringType()),
                      T.StructField("__lsn", T.LongType())]),
        key_cols=("conv_id", "turn_idx", "chunk_idx"), bucket_key="conv_id",
        n_buckets=4, order_cols=("conv_id", "turn_idx", "chunk_idx"),
        seq_col="__lsn",
    )

    def _chunks(df):
        return df.select(
            "conv_id", "turn_idx", "__lsn",
            F.posexplode(F.split(F.coalesce("text", F.lit("")), " "))
            .alias("chunk_idx", "chunk"),
        )

    ingest = ChangelogIngest(
        spark=spark, wal_dir=wal, table_path=facts_path,
        checkpoint_dir=str(tmp_path / "ck_ingest"), schema=CHANGELOG_SCHEMA,
        name="plat_ingest", mode="mor", max_files_per_trigger=1,
    )
    scd2 = ChangeFeedScd2(
        spark=spark, source_path=facts_path, table_path=str(tmp_path / "hist"),
        checkpoint_dir=str(tmp_path / "ck_scd2"), name="plat_scd2",
    )
    roll = ChangeFeedRollup(
        spark=spark, source_path=facts_path, table_path=str(tmp_path / "roll"),
        checkpoint_dir=str(tmp_path / "ck_roll"), key_cols=("conv_id",),
        aggs={"n_changes": "count"}, name="plat_roll",
    )
    enr = ChangeFeedEnrich(
        spark=spark, fact_path=facts_path, dim_path=str(tmp_path / "dim"),
        table_path=str(tmp_path / "enr"), checkpoint_dir=str(tmp_path / "ck_enr"),
        name="plat_enr",
    )
    trf = ChangeFeedTransform(
        spark=spark, source_path=facts_path,
        table_path=str(tmp_path / "chunks"),
        checkpoint_dir=str(tmp_path / "ck_trf"), transform=_chunks,
        name="plat_trf",
    )
    ChangeFeedJoin.create_target(
        spark, str(tmp_path / "joined"), facts_path, str(tmp_path / "dim"),
        join_cols=["conv_id"], n_buckets=4,
    )
    jn = ChangeFeedJoin(
        spark=spark, a_path=facts_path, b_path=str(tmp_path / "dim"),
        table_path=str(tmp_path / "joined"),
        checkpoint_dir=str(tmp_path / "ck_join"),
        join_cols=["conv_id"], name="plat_join",
    )

    facts = IceliteTable.load(spark, facts_path)
    queries = [ingest.start(), scd2.start(), roll.start(), enr.start(),
               trf.start(), jn.start()]
    try:
        deadline = time.monotonic() + 420
        feed_rows = None
        while time.monotonic() < deadline:
            for q in queries:
                if q.exception() is not None:
                    raise AssertionError(str(q.exception()))
            try:
                if facts.current_seq() >= 3:
                    feed_rows = facts.read_changes(0).count()
                    hist_n = IceliteTable.load(
                        spark, str(tmp_path / "hist")).read().count()
                    enr_rows = IceliteTable.load(
                        spark, str(tmp_path / "enr")).read().count()
                    roll_t = IceliteTable.load(spark, str(tmp_path / "roll"))
                    roll_sum = (roll_t.read().agg(
                        F.sum("n_changes").alias("s")).collect()[0]["s"]
                        if roll_t.current_seq() > 0 else 0)
                    if hist_n == feed_rows and roll_sum == feed_rows:
                        # enriched target holds one row per fact KEY;
                        # chunk target equals the live-state derivation
                        n_keys = facts.read().count()
                        live_f = facts.read().filter(
                            ~F.coalesce(F.col("__deleted"), F.lit(False)))
                        want_ch = _chunks(live_f).count()
                        got_ch = (
                            IceliteTable.load(spark, str(tmp_path / "chunks"))
                            .read()
                            .filter(~F.coalesce(F.col("__deleted"),
                                                F.lit(False)))
                            .count())
                        got_jn = (
                            IceliteTable.load(spark, str(tmp_path / "joined"))
                            .read()
                            .filter(~F.coalesce(F.col("__deleted"),
                                                F.lit(False)))
                            .count())
                        if (enr_rows == n_keys and got_ch == want_ch
                                and got_jn == live_f.count()):
                            break
            except Exception:
                pass  # pointer mid-swap during concurrent commits; retry
            time.sleep(1.0)
        else:
            raise AssertionError(
                f"pipelines did not converge: feed={feed_rows}")
    finally:
        for q in queries:
            q.stop()
        for q in queries:
            q.awaitTermination()

    # facts == independent replay oracle
    got = read_transcripts(facts).toPandas().reset_index(drop=True)
    assert_pdf_equal(got, replay_oracle_pandas(log),
                     sort_cols=["conv_id", "turn_idx"])

    feed = facts.read_changes(0)
    # rollup == keyed recompute over the full feed
    want_roll = {r["conv_id"]: r["n"] for r in feed.groupBy("conv_id")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
    got_roll = {r["conv_id"]: r["n_changes"] for r in IceliteTable.load(
        spark, str(tmp_path / "roll")).read().collect()}
    assert got_roll == want_roll

    # scd2 as_of(final) == facts live state
    live = {(r["conv_id"], r["turn_idx"], r["text"]) for r in facts.read()
            .filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
            .select("conv_id", "turn_idx", "text").collect()}
    asof = {(r["conv_id"], r["turn_idx"], r["text"])
            for r in ChangeFeedScd2.as_of(
                spark, str(tmp_path / "hist"), facts.current_seq())
            .select("conv_id", "turn_idx", "text").collect()}
    assert asof == live

    # enriched == facts live + dim label (static dim: deterministic)
    want_enr = {(c, t): ("even" if int(c.split("-")[1]) % 2 == 0 else "odd")
                for (c, t, _x) in live}
    got_enr = {(r["conv_id"], r["turn_idx"]): r["label_dim"]
               for r in IceliteTable.load(spark, str(tmp_path / "enr")).read()
               .filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
               .collect()}
    assert got_enr == want_enr

    # chunk target == transform of facts live rows, exactly
    live_f = facts.read().filter(
        ~F.coalesce(F.col("__deleted"), F.lit(False)))
    want_ch = _chunks(live_f).select(
        "conv_id", "turn_idx", "chunk_idx", "chunk", "__lsn")
    got_ch = (
        IceliteTable.load(spark, str(tmp_path / "chunks")).read()
        .filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
        .select("conv_id", "turn_idx", "chunk_idx", "chunk", "__lsn"))
    assert got_ch.exceptAll(want_ch).count() == 0
    assert want_ch.exceptAll(got_ch).count() == 0

    # join target == facts live ⋈ dim (bidirectional view; static dim
    # here, so it must agree with the enrich labels row-for-row)
    dim_t = IceliteTable.load(spark, str(tmp_path / "dim"))
    dim_live = dim_t.read()
    if "__deleted" in dim_live.columns:
        dim_live = dim_live.filter(
            ~F.coalesce(F.col("__deleted"), F.lit(False)))
    want_jn = live_f.join(
        dim_live.select("conv_id", F.col("label").alias("label_b")),
        "conv_id", "inner",
    ).select("conv_id", "turn_idx", "text", "label_b")
    got_jn = (
        IceliteTable.load(spark, str(tmp_path / "joined")).read()
        .filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
        .select("conv_id", "turn_idx", "text", "label_b"))
    assert got_jn.exceptAll(want_jn).count() == 0
    assert want_jn.exceptAll(got_jn).count() == 0
