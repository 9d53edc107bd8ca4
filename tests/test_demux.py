"""DemuxIngest — one WAL stream routed to K tables (round 5): each table
equals the oracle replay of its route's slice, the WAL is scanned once
per micro-batch, overlapping routes duplicate by design, and redelivery
(same checkpoint, nothing new) is a per-route ledger no-op."""

import pandas as pd
from pyspark.sql import functions as F

from etl_rust_spark.changelog import (
    CHANGELOG_SCHEMA,
    ChangelogConfig,
    generate_changelog_pandas,
    replay_oracle_pandas,
    write_wal_segments,
)
from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.operators.apply import create_transcript_table, read_transcripts
from etl_rust_spark.streaming.driver import DemuxIngest
from tests.conftest import assert_pdf_equal


def _setup(spark, tmp_path, n_events=4000):
    cfg = ChangelogConfig(n_events=n_events, n_conversations=40,
                          turns_per_conv=8, seed=13, shuffle_order=True)
    log = generate_changelog_pandas(cfg)
    write_wal_segments(log, str(tmp_path / "wal"), 3, spark)
    return log


def _demux(spark, tmp_path, routes):
    for _, path in routes.values():
        create_transcript_table(spark, path, n_buckets=2)
    return DemuxIngest(
        spark=spark, wal_dir=str(tmp_path / "wal"),
        checkpoint_dir=str(tmp_path / "ck"), schema=CHANGELOG_SCHEMA,
        routes=routes, max_files_per_trigger=1,
    )


def test_routes_match_sliced_oracles(spark, tmp_path):
    log = _setup(spark, tmp_path)
    even = F.substring("conv_id", -1, 1).cast("int") % 2 == 0
    routes = {
        "even": (even, str(tmp_path / "t_even")),
        "odd": (~even, str(tmp_path / "t_odd")),
    }
    pipe = _demux(spark, tmp_path, routes)
    pipe.run_available()

    mask = log.conv_id.str[-1].astype(int) % 2 == 0
    for rname, sel in (("even", mask), ("odd", ~mask)):
        t = IceliteTable.load(spark, routes[rname][1])
        got = read_transcripts(t).toPandas()
        want = replay_oracle_pandas(log[sel])
        assert_pdf_equal(got, want)

    # redelivery: nothing new on the same checkpoint -> no commits anywhere
    seqs = {r: IceliteTable.load(spark, p).current_seq()
            for r, (_, p) in routes.items()}
    DemuxIngest(
        spark=spark, wal_dir=str(tmp_path / "wal"),
        checkpoint_dir=str(tmp_path / "ck"), schema=CHANGELOG_SCHEMA,
        routes=routes,
    ).run_available()
    for r, (_, p) in routes.items():
        assert IceliteTable.load(spark, p).current_seq() == seqs[r]


def test_overlapping_routes_and_incremental_segments(spark, tmp_path):
    log = _setup(spark, tmp_path, n_events=2000)
    routes = {
        "all": (F.lit(True), str(tmp_path / "t_all")),
        "user_turns": (F.col("role") == "user", str(tmp_path / "t_user")),
    }
    pipe = _demux(spark, tmp_path, routes)
    pipe.run_available()

    t_all = IceliteTable.load(spark, routes["all"][1])
    assert_pdf_equal(read_transcripts(t_all).toPandas(), replay_oracle_pandas(log))
    t_user = IceliteTable.load(spark, routes["user_turns"][1])
    assert_pdf_equal(read_transcripts(t_user).toPandas(),
                     replay_oracle_pandas(log[log.role == "user"]))

    # a NEW segment arrives: the same checkpoint picks up only the delta
    extra = log.head(200).copy()
    extra["lsn"] = extra["lsn"] + 1_000_000
    extra["text"] = "late-" + extra["lsn"].astype(str)
    extra.loc[extra.op == "D", "text"] = None
    # write through the same segment writer (exact CHANGELOG_SCHEMA types)
    # into a staging dir, then move the file into the tailed WAL dir
    import glob as _glob
    import os

    write_wal_segments(extra, str(tmp_path / "wal_extra"), 1, spark)
    seg = _glob.glob(str(tmp_path / "wal_extra" / "*.parquet"))[0]
    os.rename(seg, str(tmp_path / "wal" / "seg-late.parquet"))
    DemuxIngest(
        spark=spark, wal_dir=str(tmp_path / "wal"),
        checkpoint_dir=str(tmp_path / "ck"), schema=CHANGELOG_SCHEMA,
        routes=routes,
    ).run_available()
    full = pd.concat([log, extra], ignore_index=True)
    assert_pdf_equal(read_transcripts(t_all).toPandas(), replay_oracle_pandas(full))
    assert_pdf_equal(read_transcripts(t_user).toPandas(),
                     replay_oracle_pandas(full[full.role == "user"]))


def test_crash_between_route_commits_replays_idempotently(spark, tmp_path):
    """Simulate a crash after route A committed but before route B: the
    replayed micro-batch re-runs both routes; A's batch key is a ledger
    no-op, B applies — neither double-applied nor lost."""
    log = _setup(spark, tmp_path, n_events=600)
    even = F.substring("conv_id", -1, 1).cast("int") % 2 == 0
    routes = {
        "a": (even, str(tmp_path / "t_a")),
        "b": (~even, str(tmp_path / "t_b")),
    }
    pipe = _demux(spark, tmp_path, routes)

    # crash injection: first attempt dies after the FIRST route's commit
    from etl_rust_spark.streaming import driver as drv

    orig = drv.apply_changes
    calls = {"n": 0}

    def crashing(table, batch_df, **kw):
        out = orig(table, batch_df, **kw)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash between route commits")
        return out

    drv.apply_changes = crashing
    try:
        try:
            pipe.run_available()
        except Exception:
            pass
    finally:
        drv.apply_changes = orig

    # restart on the same checkpoint: full replay, exactly-once per route
    DemuxIngest(
        spark=spark, wal_dir=str(tmp_path / "wal"),
        checkpoint_dir=str(tmp_path / "ck"), schema=CHANGELOG_SCHEMA,
        routes=routes,
    ).run_available()
    mask = log.conv_id.str[-1].astype(int) % 2 == 0
    for rname, sel in (("a", mask), ("b", ~mask)):
        t = IceliteTable.load(spark, routes[rname][1])
        assert_pdf_equal(read_transcripts(t).toPandas(),
                         replay_oracle_pandas(log[sel]))
