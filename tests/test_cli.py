"""CLI entrypoint (python -m etl_rust_spark / spark-submit __main__.py):
parser wiring. The full lifecycle (create -> ingest -> compact -> lineage
-> changes -> expire) is driven through real spark-submit by the verify
recipe; here we pin the argument surface."""

from etl_rust_spark.__main__ import build_parser


def test_parser_surface():
    p = build_parser()
    a = p.parse_args([
        "ingest", "--wal-dir", "/w", "--table", "/t", "--checkpoint", "/c",
        "--mode", "mor", "--compact-every", "16", "--compact-min-files", "8",
        "--follow",
    ])
    assert (a.cmd, a.mode, a.compact_every, a.compact_min_files, a.follow) == (
        "ingest", "mor", 16, 8, True)
    a = p.parse_args(["compact", "--table", "/t", "--min-files-per-bucket", "4"])
    assert a.min_files_per_bucket == 4
    a = p.parse_args(["changes", "--table", "/t", "--since", "7"])
    assert a.since == 7
    a = p.parse_args(["rebucket", "--table", "/t", "--n-buckets", "256"])
    assert a.n_buckets == 256
    a = p.parse_args(["remove-orphans", "--table", "/t", "--grace-sec", "60"])
    assert a.grace_sec == 60.0
    for cmd in ("create", "ingest", "compact", "expire", "rebucket",
                "remove-orphans", "lineage", "changes"):
        assert any(cmd in str(c) for c in p._subparsers._group_actions[0].choices)


def test_parser_new_subcommands():
    p = build_parser()
    a = p.parse_args(["rename-column", "--table", "/t", "--old", "a", "--new", "b"])
    assert (a.cmd, a.old, a.new) == ("rename-column", "a", "b")
    a = p.parse_args(["drop-column", "--table", "/t", "--column", "c"])
    assert a.column == "c"
    a = p.parse_args(["compact", "--table", "/t", "--zorder", "x,y",
                      "--files-per-bucket", "8"])
    assert (a.zorder, a.files_per_bucket) == ("x,y", 8)
    a = p.parse_args(["ingest", "--wal-dir", "/w", "--table", "/t",
                      "--checkpoint", "/c", "--audit-reject-regex", "POISON"])
    assert a.audit_reject_regex == "POISON"
    a = p.parse_args(["add-column", "--table", "/t", "--column", "lang",
                      "--type", "string"])
    assert (a.cmd, a.column, a.type, a.agg) == ("add-column", "lang",
                                                "string", None)
    a = p.parse_args(["add-column", "--table", "/t", "--column", "n",
                      "--type", "bigint", "--agg", "sum"])
    assert a.agg == "sum"
    a = p.parse_args(["expire", "--table", "/t", "--keep-last", "3",
                      "--older-than", "2026-01-01T00:00:00"])
    assert (a.keep_last, a.older_than) == (3, "2026-01-01T00:00:00")


def test_cli_audited_ingest_end_to_end(spark, tmp_path, capsys):
    """Drive cmd_ingest with the audit gate through the real arg path:
    the poisoned segment is rejected (quarantined epoch printed), clean
    segments publish."""
    from etl_rust_spark.__main__ import main
    from etl_rust_spark.changelog import (
        ChangelogConfig,
        generate_changelog_pandas,
        write_wal_segments,
    )
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import read_transcripts

    log = generate_changelog_pandas(
        ChangelogConfig(n_events=200, n_conversations=5, turns_per_conv=8, seed=5)
    )
    third = len(log) // 3
    log.loc[third : 2 * third - 1, "text"] = (
        "POISON " + log.loc[third : 2 * third - 1, "text"]
    )
    wal = str(tmp_path / "wal")
    write_wal_segments(log, wal, 3, spark)
    assert main([
        "create", "--table", str(tmp_path / "t"), "--n-buckets", "4",
    ]) == 0
    assert main([
        "ingest", "--wal-dir", wal, "--table", str(tmp_path / "t"),
        "--checkpoint", str(tmp_path / "ck"), "--mode", "mor",
        "--audit-reject-regex", "^POISON",
    ]) == 0
    out = capsys.readouterr().out
    assert "REJECTED batch epoch=" in out
    table = IceliteTable.load(spark, str(tmp_path / "t"))
    got = read_transcripts(table).toPandas()
    assert len(got) > 0 and not got.text.str.startswith("POISON").any()


def test_cli_rollup_end_to_end(spark, tmp_path, capsys):
    """Drive the rollup job through the CLI: the materialized view equals
    the batch aggregate of the WAL's events."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from etl_rust_spark.__main__ import main
    from etl_rust_spark.lake.format import IceliteTable

    rows = [(i, pd.Timestamp("2025-04-01") + pd.Timedelta(minutes=7 * i),
             i % 5, float(i)) for i in range(200)]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    wal = tmp_path / "wal"
    wal.mkdir()
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:120], preserve_index=False),
                   wal / "seg-0.parquet")
    pq.write_table(pa.Table.from_pandas(pdf.iloc[120:], preserve_index=False),
                   wal / "seg-1.parquet")
    assert main([
        "rollup", "--wal-dir", str(wal), "--table", str(tmp_path / "r"),
        "--checkpoint", str(tmp_path / "ck"),
        "--schema-ddl", "event_id long, ts timestamp, user_id long, value double",
        "--window", "1 hour", "--watermark", "6 hours",
    ]) == 0
    assert "rollup at seq" in capsys.readouterr().out
    t = IceliteTable.load(spark, str(tmp_path / "r"))
    got = t.read().drop("__lsn")
    want = (
        spark.createDataFrame(pdf)
        .groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(24,6)")).cast("double").alias("value_sum"))
        .select("user_id", F.col("w.start").cast("long").alias("window_start"),
                "n_events", "value_sum")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_parser_tail_subcommand():
    p = build_parser()
    a = p.parse_args(["tail", "--table", "/t", "--checkpoint", "/c",
                      "--since", "3", "--once"])
    assert (a.cmd, a.since, a.once) == ("tail", 3, True)
    a = p.parse_args(["tail", "--table", "/t", "--checkpoint", "/c",
                      "--interval", "2 seconds", "--timeout-sec", "30"])
    assert (a.interval, a.timeout_sec, a.once) == ("2 seconds", 30, False)


def test_cli_tail_emits_change_feed_json(spark, tmp_path, capsys):
    """Drive cmd_tail --once through the real arg path: it drains the
    table's commit log via the icelite streaming source and prints each
    change row as a JSON line; a second --once run on the same
    checkpoint emits nothing (exactly-once resume)."""
    import json

    import pandas as pd

    from etl_rust_spark.__main__ import main
    from etl_rust_spark.changelog import CHANGELOG_SCHEMA
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    pdf = pd.DataFrame(
        [[1, "I", "c1", 0, "user", "hello", "", pd.Timestamp("2025-01-01")],
         [2, "I", "c2", 0, "user", "world", "", pd.Timestamp("2025-01-01")]],
        columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    apply_changes(t, spark.createDataFrame(pdf, schema=CHANGELOG_SCHEMA),
                  batch_key="b0", mode="mor")
    assert main([
        "tail", "--table", str(tmp_path / "t"),
        "--checkpoint", str(tmp_path / "ck"), "--once",
    ]) == 0
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert {r["conv_id"] for r in lines} == {"c1", "c2"}
    assert all(r["_commit_seq"] == t.current_seq() for r in lines)
    # resume: nothing new
    assert main([
        "tail", "--table", str(tmp_path / "t"),
        "--checkpoint", str(tmp_path / "ck"), "--once",
    ]) == 0
    assert not [ln for ln in capsys.readouterr().out.splitlines()
                if ln.startswith("{")]


def test_cli_tail_streams_backlog_without_driver_collect(spark, tmp_path, capsys):
    """VERDICT r04 #4: a backlog catch-up must never materialize a whole
    micro-batch driver-side. cmd_tail emits via toJSON().toLocalIterator
    (asserted — collect() must not come back) and --max-commits-per-batch
    bounds each micro-batch at the source, so the full backlog still
    drains exactly once across runs."""
    import json

    import pandas as pd

    from etl_rust_spark.__main__ import cmd_tail, main
    from etl_rust_spark.changelog import CHANGELOG_SCHEMA
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    # emission path is iterator-based, not collect-based
    import inspect

    src_text = inspect.getsource(cmd_tail)
    assert "toLocalIterator" in src_text and ".collect()" not in src_text

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    n_commits = 5
    for b in range(n_commits):
        pdf = pd.DataFrame(
            [[b + 1, "I", f"c{b}", 0, "user", f"m{b}", "",
              pd.Timestamp("2025-01-01")]],
            columns=["lsn", "op", "conv_id", "turn_idx", "role", "text",
                     "tool", "ts"],
        )
        apply_changes(t, spark.createDataFrame(pdf, schema=CHANGELOG_SCHEMA),
                      batch_key=f"b{b}", mode="mor")

    # availableNow falls back to single-batch for Python sources, so each
    # --once run drains ONE bounded micro-batch; the backlog needs
    # ceil(5/2)+? runs — loop until silent, then assert exactly-once
    seen = []
    for _ in range(n_commits + 2):
        assert main([
            "tail", "--table", str(tmp_path / "t"),
            "--checkpoint", str(tmp_path / "ck"), "--once",
            "--max-commits-per-batch", "2",
        ]) == 0
        lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
                 if ln.startswith("{")]
        assert len({r["_commit_seq"] for r in lines}) <= 2  # bounded batch
        if not lines and len(seen) == n_commits:
            break
        seen.extend(lines)
    assert {r["conv_id"] for r in seen} == {f"c{b}" for b in range(n_commits)}
    assert len(seen) == n_commits  # exactly once across bounded runs


def test_cli_rollback_end_to_end(spark, tmp_path, capsys):
    import datetime as dt

    from etl_rust_spark.__main__ import build_parser
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    p = build_parser()
    a = p.parse_args(["rollback", "--table", "/t", "--to-seq", "3"])
    assert (a.cmd, a.to_seq) == ("rollback", 3)

    tpath = str(tmp_path / "t")
    t = create_transcript_table(spark, tpath, n_buckets=4)
    rows = [(1, "I", "c0", 0, "user", "keep", "", dt.datetime(2025, 1, 1))]
    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    apply_changes(t, spark.createDataFrame(rows, sch), batch_key="g", mode="mor")
    bad = [(2, "I", "c1", 0, "user", "oops", "", dt.datetime(2025, 1, 1))]
    apply_changes(t, spark.createDataFrame(bad, sch), batch_key="b", mode="mor")

    args = p.parse_args(["rollback", "--table", tpath, "--to-seq", "1"])
    assert args.fn(args) == 0
    out = capsys.readouterr().out
    assert "rolled back to seq 1" in out
    t2 = IceliteTable(spark, tpath)
    assert [r["text"] for r in t2.read().collect()] == ["keep"]


def test_cli_branch_lifecycle(spark, tmp_path, capsys):
    """branch create/list/fast-forward/delete — pure metadata, no Spark
    session in the command path (IceliteTable(None, ...))."""
    import datetime as dt

    from etl_rust_spark.__main__ import build_parser
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    p = build_parser()
    tpath = str(tmp_path / "t")
    t = create_transcript_table(spark, tpath, n_buckets=4)
    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    rows = [(1, "I", "c0", 0, "user", "base", "", dt.datetime(2025, 1, 1))]
    apply_changes(t, spark.createDataFrame(rows, sch), batch_key="b0", mode="mor")

    assert p.parse_args(["branch", "create", "--table", tpath, "--name", "fix"]).fn(
        p.parse_args(["branch", "create", "--table", tpath, "--name", "fix"])
    ) == 0
    assert "created branch 'fix' at seq 1" in capsys.readouterr().out

    br = IceliteTable(spark, tpath, branch="fix")
    rows2 = [(2, "I", "c1", 0, "user", "fixed", "", dt.datetime(2025, 1, 1))]
    apply_changes(br, spark.createDataFrame(rows2, sch), batch_key="b1", mode="mor")

    args = p.parse_args(["branch", "list", "--table", tpath])
    assert args.fn(args) == 0
    assert "fix\tfork=1\ttip=2" in capsys.readouterr().out

    args = p.parse_args(["branch", "fast-forward", "--table", tpath, "--name", "fix"])
    assert args.fn(args) == 0
    assert "published 1 commit(s)" in capsys.readouterr().out
    assert sorted(r["text"] for r in t.read().collect()) == ["base", "fixed"]

    args = p.parse_args(["branch", "delete", "--table", tpath, "--name", "fix"])
    assert args.fn(args) == 0
    assert IceliteTable(spark, tpath).branches() == {}


def test_cli_maintain_threshold_service(spark, tmp_path, capsys):
    """`maintain` is the cron-able one-shot table service: partial
    compaction fires only past the file-count threshold, expiry and
    orphan GC only when asked, and a healthy table is a metadata no-op."""
    import datetime as dt
    import json

    from etl_rust_spark.__main__ import build_parser
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    p = build_parser()
    tpath = str(tmp_path / "t")
    t = create_transcript_table(spark, tpath, n_buckets=2)
    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    for i in range(4):
        rows = [(10 * i + k, "I", "c0", 10 * i + k, "user", f"t{i}.{k}", "",
                 dt.datetime(2025, 1, 1)) for k in range(3)]
        apply_changes(t, spark.createDataFrame(rows, sch),
                      batch_key=f"b{i}", mode="mor")
    rows_before = t.read().count()

    args = p.parse_args([
        "maintain", "--table", tpath, "--compact-threshold", "2",
        "--keep-last", "1", "--orphan-grace-sec", "3600",
    ])
    assert args.fn(args) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["before"]["max_files_per_bucket"] > 2
    assert "compacted_to_seq" in rep and rep["orphans_removed"] == 0
    assert rep["after"]["max_files_per_bucket"] <= 2
    assert t.read().count() == rows_before

    # second run: below threshold now -> no compaction commit
    seq = t.current_seq()
    assert args.fn(args) == 0
    rep2 = json.loads(capsys.readouterr().out)
    assert "compacted_to_seq" not in rep2 and t.current_seq() == seq


def test_cli_feed_rollup_end_to_end(spark, tmp_path, capsys):
    """Drive the table→table additive rollup through the CLI arg path:
    the accumulated target equals a recompute over the source's full
    change feed, and a second run with nothing new is a no-op."""
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_rust_spark.__main__ import main
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    src = create_transcript_table(spark, str(tmp_path / "src"), n_buckets=4)
    ddl = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    for c in range(3):
        rows = [(c * 4 + i, "I", f"conv-{i % 2}", i, "user", f"t{c}-{i}", "",
                 dt.datetime(2025, 1, 1)) for i in range(4)]
        apply_changes(src, spark.createDataFrame(rows, ddl),
                      batch_key=f"b{c}", mode="mor")

    argv = [
        "feed-rollup", "--source", str(tmp_path / "src"),
        "--table", str(tmp_path / "tgt"), "--checkpoint", str(tmp_path / "ck"),
        "--keys", "conv_id", "--agg", "n_changes=count",
        "--agg", "max_turn=max:turn_idx", "--n-buckets", "4",
        "--max-commits-per-batch", "1",
    ]
    assert main(argv) == 0
    assert "feed rollup at seq" in capsys.readouterr().out
    tgt = IceliteTable.load(spark, str(tmp_path / "tgt"))
    got = {r["conv_id"]: (r["n_changes"], r["max_turn"])
           for r in tgt.read().collect()}
    want = {r["conv_id"]: (r["n"], r["m"])
            for r in src.read_changes(0).groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n"), F.max("turn_idx").alias("m"))
            .collect()}
    assert got == want
    seq = tgt.current_seq()
    assert main(argv) == 0  # resume: nothing new -> no commit
    assert tgt.current_seq() == seq


def test_parser_feed_rollup_subcommand():
    p = build_parser()
    a = p.parse_args([
        "feed-rollup", "--source", "/s", "--table", "/t", "--checkpoint", "/c",
        "--agg", "n=count", "--agg", "v=sum:value", "--keys", "a,b",
        "--max-commits-per-batch", "2", "--shard", "0/4",
    ])
    assert (a.cmd, a.keys, a.agg, a.max_commits_per_batch, a.shard) == (
        "feed-rollup", "a,b", ["n=count", "v=sum:value"], 2, "0/4")


def test_cli_delete_where_end_to_end(spark, tmp_path, capsys):
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_rust_spark.__main__ import main
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    ddl = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    rows = [(i, "I", f"c{i % 2}", i, "user", f"t{i}", "", dt.datetime(2025, 1, 1))
            for i in range(6)]
    apply_changes(t, spark.createDataFrame(rows, ddl), batch_key="b0", mode="mor")
    assert main([
        "delete-where", "--table", str(tmp_path / "t"),
        "--col", "conv_id", "--value", "c0", "--batch-key", "purge1",
    ]) == 0
    assert '"deleted": 3' in capsys.readouterr().out
    live = (IceliteTable.load(spark, str(tmp_path / "t")).read()
            .filter(~F.coalesce(F.col("__deleted"), F.lit(False))))
    assert {r["conv_id"] for r in live.select("conv_id").distinct().collect()} == {"c1"}


def test_parser_delete_where_subcommand():
    p = build_parser()
    a = p.parse_args(["delete-where", "--table", "/t", "--col", "ts",
                      "--op", "<", "--value", "2024-01-01", "--value-type", "ts",
                      "--at-seq", "99"])
    assert (a.cmd, a.col, a.op, a.value, a.value_type, a.at_seq) == (
        "delete-where", "ts", "<", "2024-01-01", "ts", 99)


def test_cli_update_where_end_to_end(spark, tmp_path, capsys):
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_rust_spark.__main__ import main
    from etl_rust_spark.lake.format import IceliteTable

    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    ddl = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    rows = [(i, "I", f"c{i % 2}", i, "user", f"t{i}", "", dt.datetime(2025, 1, 1))
            for i in range(6)]
    apply_changes(t, spark.createDataFrame(rows, ddl), batch_key="b0", mode="mor")
    assert main([
        "update-where", "--table", str(tmp_path / "t"),
        "--col", "conv_id", "--value", "c0",
        "--set", "text=upper(text)", "--set", "role='assistant'",
        "--batch-key", "redact1",
    ]) == 0
    assert '"updated": 3' in capsys.readouterr().out
    live = (IceliteTable.load(spark, str(tmp_path / "t")).read()
            .filter(~F.coalesce(F.col("__deleted"), F.lit(False))))
    c0 = live.filter(F.col("conv_id") == "c0").collect()
    assert {r["text"] for r in c0} == {"T0", "T2", "T4"}
    assert {r["role"] for r in c0} == {"assistant"}
    c1 = live.filter(F.col("conv_id") == "c1").collect()
    assert {r["text"] for r in c1} == {"t1", "t3", "t5"}
    assert {r["role"] for r in c1} == {"user"}


def test_cli_clone_end_to_end(spark, tmp_path, capsys):
    import datetime as dt

    from etl_rust_spark.__main__ import main
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    ddl = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    rows = [(i, "I", f"c{i % 2}", i, "user", f"t{i}", "", dt.datetime(2025, 1, 1))
            for i in range(4)]
    apply_changes(t, spark.createDataFrame(rows, ddl), batch_key="b0", mode="mor")
    assert main([
        "clone", "--table", str(tmp_path / "t"), "--dest", str(tmp_path / "c"),
    ]) == 0
    assert "clone seq 1" in capsys.readouterr().out
    c = IceliteTable.load(spark, str(tmp_path / "c"))
    assert c.read().count() == t.read().count() == 4
    assert c.is_applied("b0")


def test_cli_fsck_end_to_end(spark, tmp_path, capsys):
    import datetime as dt
    import os

    from etl_rust_spark.__main__ import main
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    ddl = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    rows = [(i, "I", f"c{i % 2}", i, "user", f"t{i}", "", dt.datetime(2025, 1, 1))
            for i in range(4)]
    apply_changes(t, spark.createDataFrame(rows, ddl), batch_key="b0", mode="mor")

    # clean table (deep): exit 0; the backup-verify composition
    assert main(["clone", "--table", str(tmp_path / "t"),
                 "--dest", str(tmp_path / "c")]) == 0
    capsys.readouterr()
    assert main(["fsck", "--table", str(tmp_path / "c"), "--deep"]) == 0
    assert '"ok": true' in capsys.readouterr().out

    # corrupt the clone: exit 1 with the finding
    victim = IceliteTable.load(spark, str(tmp_path / "c"))
    path = victim._files(victim.pointer())[0]["path"]
    os.remove(path)
    assert main(["fsck", "--table", str(tmp_path / "c")]) == 1
    assert "missing" in capsys.readouterr().out
    # the SOURCE is untouched by the clone's corruption
    assert main(["fsck", "--table", str(tmp_path / "t"), "--deep"]) == 0


def test_parser_update_where_subcommand():
    p = build_parser()
    a = p.parse_args(["update-where", "--table", "/t", "--col", "conv_id",
                      "--value", "c0", "--set", "text='x'",
                      "--set", "role=tool", "--at-seq", "7"])
    assert (a.cmd, a.col, a.value, a.set, a.at_seq) == (
        "update-where", "conv_id", "c0", ["text='x'", "role=tool"], 7)


def test_cli_scd2_end_to_end(spark, tmp_path, capsys):
    """Drive the SCD2 pipeline through the CLI arg path: history count
    printed, as-of read reconstructs the source state, re-run is a
    no-op."""
    import datetime as dt
    import json

    from etl_rust_spark.__main__ import main
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    src = create_transcript_table(spark, str(tmp_path / "src"), n_buckets=4)
    ddl = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    for c, rows in enumerate([
        [(10, "I", "c0", 0, "a0"), (11, "I", "c1", 0, "x0")],
        [(20, "U", "c0", 0, "a1"), (21, "D", "c1", 0, None)],
    ]):
        df = spark.createDataFrame(
            [(lsn, op, cv, k, "user", tx, "", dt.datetime(2025, 1, 1))
             for lsn, op, cv, k, tx in rows], ddl)
        apply_changes(src, df, batch_key=f"b{c}", mode="mor")

    argv = [
        "scd2", "--source", str(tmp_path / "src"),
        "--table", str(tmp_path / "hist"), "--checkpoint", str(tmp_path / "ck"),
        "--n-buckets", "4", "--max-commits-per-batch", "1",
    ]
    assert main(argv) == 0
    assert "versions" in capsys.readouterr().out

    assert main(["scd2-read", "--table", str(tmp_path / "hist"),
                 "--as-of-seq", "1"]) == 0
    state = {(json.loads(line)["conv_id"], json.loads(line)["text"])
             for line in capsys.readouterr().out.strip().splitlines()}
    assert state == {("c0", "a0"), ("c1", "x0")}

    hist = IceliteTable.load(spark, str(tmp_path / "hist"))
    seq = hist.current_seq()
    assert main(argv) == 0  # resume: nothing new -> no commit
    assert hist.current_seq() == seq


def test_parser_scd2_and_quarantine_args():
    p = build_parser()
    a = p.parse_args(["scd2", "--source", "/s", "--table", "/t",
                      "--checkpoint", "/c", "--max-commits-per-batch", "3",
                      "--shard", "1/4"])
    assert (a.cmd, a.max_commits_per_batch, a.shard) == ("scd2", 3, "1/4")
    a = p.parse_args(["scd2-read", "--table", "/t", "--as-of-seq", "5"])
    assert (a.cmd, a.as_of_seq) == ("scd2-read", 5)
    a = p.parse_args(["ingest", "--wal-dir", "/w", "--table", "/t",
                      "--checkpoint", "/c", "--quarantine-dir", "/q",
                      "--rule", "lsn_ok=lsn IS NOT NULL",
                      "--rule", "op_ok=op IN ('I')"])
    assert a.quarantine_dir == "/q"
    assert a.rule == ["lsn_ok=lsn IS NOT NULL", "op_ok=op IN ('I')"]
    assert a.no_quarantine_checks is False
    a = p.parse_args(["ingest", "--wal-dir", "/w", "--table", "/t",
                      "--checkpoint", "/c", "--no-quarantine-checks"])
    assert a.no_quarantine_checks is True


def test_cli_enrich_end_to_end(spark, tmp_path, capsys):
    """Drive the enrichment pipeline through the CLI arg path: facts get
    the dim label, unknown keys NULL, re-run is a no-op."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_rust_spark.__main__ import main
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    dim = IceliteTable.create(
        spark, str(tmp_path / "dim"),
        T.StructType([T.StructField("conv_id", T.StringType()),
                      T.StructField("label", T.StringType()),
                      T.StructField("dlsn", T.LongType())]),
        key_cols=("conv_id",), bucket_key="conv_id", n_buckets=2,
        seq_col="dlsn",
    )
    dim.merge(
        spark.createDataFrame([("c0", "gold", 1)],
                              "conv_id string, label string, dlsn long")
        .withColumn("op", F.lit("U")),
        batch_key="d0", seq_col="dlsn", mode="mor",
    )
    facts = create_transcript_table(spark, str(tmp_path / "facts"), n_buckets=2)
    ddl = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    apply_changes(facts, spark.createDataFrame(
        [(10, "I", "c0", 0, "user", "a0", "", dt.datetime(2025, 1, 1)),
         (11, "I", "c9", 0, "user", "o", "", dt.datetime(2025, 1, 1))], ddl),
        batch_key="f0", mode="mor")
    argv = [
        "enrich", "--facts", str(tmp_path / "facts"),
        "--dim", str(tmp_path / "dim"), "--table", str(tmp_path / "tgt"),
        "--checkpoint", str(tmp_path / "ck"), "--n-buckets", "2",
    ]
    assert main(argv) == 0
    assert "enriched at seq" in capsys.readouterr().out
    tgt = IceliteTable.load(spark, str(tmp_path / "tgt"))
    got = {r["conv_id"]: r["label_dim"] for r in tgt.read().collect()}
    assert got == {"c0": "gold", "c9": None}
    seq = tgt.current_seq()
    assert main(argv) == 0
    assert tgt.current_seq() == seq


def test_cli_rewrite_manifests_and_maintain_threshold(spark, tmp_path, capsys):
    """`rewrite-manifests` consolidates metadata without a data rewrite,
    and `maintain --manifest-threshold` runs it as part of the one-shot
    service when the live manifest count exceeds the threshold."""
    import datetime as dt
    import json

    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    p = build_parser()
    tpath = str(tmp_path / "t")
    t = create_transcript_table(spark, tpath, n_buckets=2)
    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    for i in range(5):
        rows = [(10 * i + k, "I", f"c{k}", i, "user", f"t{i}.{k}", "",
                 dt.datetime(2025, 1, 1)) for k in range(3)]
        apply_changes(t, spark.createDataFrame(rows, sch),
                      batch_key=f"b{i}", mode="mor")
    rows_before = t.read().count()
    files_before = sorted(e["path"] for e in t._files(t.pointer()))
    assert t.describe()["n_manifests"] == 5

    args = p.parse_args(["rewrite-manifests", "--table", tpath])
    assert args.fn(args) == 0
    out = capsys.readouterr().out
    assert "5 -> 1" in out
    assert t.describe()["n_manifests"] == 1
    assert sorted(e["path"] for e in t._files(t.pointer())) == files_before
    assert t.read().count() == rows_before

    # grow fragmentation again; maintain with a manifest threshold folds
    # it even though no bucket crosses the compaction threshold
    for i in range(5, 9):
        rows = [(10 * i + k, "I", f"c{k}", i, "user", f"t{i}.{k}", "",
                 dt.datetime(2025, 1, 1)) for k in range(3)]
        apply_changes(t, spark.createDataFrame(rows, sch),
                      batch_key=f"b{i}", mode="mor")
    args = p.parse_args([
        "maintain", "--table", tpath, "--compact-threshold", "99",
        "--manifest-threshold", "2",
    ])
    assert args.fn(args) == 0
    rep = json.loads(capsys.readouterr().out)
    assert "compacted_to_seq" not in rep
    assert "manifests_rewritten_to_seq" in rep
    assert rep["after"]["n_manifests"] == 1
    assert t.read().count() == t.read().dropDuplicates(["conv_id", "turn_idx"]).count()


def test_cli_minor_compaction_and_maintain_delta_threshold(spark, tmp_path, capsys):
    """`compact --deltas-only` folds only delta files (base untouched),
    and `maintain --delta-threshold` fires the minor pass when full
    compaction's bucket threshold is not crossed."""
    import datetime as dt
    import json

    from pyspark.sql import functions as F

    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    p = build_parser()
    tpath = str(tmp_path / "t")
    t = create_transcript_table(spark, tpath, n_buckets=2)
    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    apply_changes(t, spark.createDataFrame(
        [(k, "I", f"c{k}", 0, "user", f"base{k}", "", dt.datetime(2025, 1, 1))
         for k in range(8)], sch), batch_key="b0", mode="mor")
    t.compact()
    base = sorted(e["path"] for e in t._files(t.pointer())
                  if e.get("kind", "base") == "base")
    for i in range(1, 5):
        apply_changes(t, spark.createDataFrame(
            [(100 * i + k, "U", f"c{k}", 0, "user", f"u{i}.{k}", "",
              dt.datetime(2025, 1, 1)) for k in range(4)], sch),
            batch_key=f"b{i}", mode="mor")
    rows = t.read().filter(~F.coalesce(F.col("__deleted"), F.lit(False))).count()

    args = p.parse_args(
        ["compact", "--table", tpath, "--deltas-only",
         "--min-files-per-bucket", "1"]
    )
    assert args.fn(args) == 0
    capsys.readouterr()
    assert sorted(e["path"] for e in t._files(t.pointer())
                  if e.get("kind", "base") == "base") == base
    per_bucket: dict = {}
    for e in t._files(t.pointer()):
        if e.get("kind", "base") == "delta":
            per_bucket[e["bucket"]] = per_bucket.get(e["bucket"], 0) + 1
    assert per_bucket and all(n == 1 for n in per_bucket.values())
    assert t.read().filter(
        ~F.coalesce(F.col("__deleted"), F.lit(False))
    ).count() == rows

    # grow a fresh trickle; maintain's minor path folds it when the full
    # threshold is not crossed
    for i in range(5, 8):
        apply_changes(t, spark.createDataFrame(
            [(100 * i + k, "U", f"c{k}", 0, "user", f"u{i}.{k}", "",
              dt.datetime(2025, 1, 1)) for k in range(4)], sch),
            batch_key=f"b{i}", mode="mor")
    args = p.parse_args([
        "maintain", "--table", tpath, "--compact-threshold", "99",
        "--delta-threshold", "1",
    ])
    assert args.fn(args) == 0
    rep = json.loads(capsys.readouterr().out)
    assert "compacted_to_seq" not in rep
    assert "delta_compacted_to_seq" in rep
    # re-run: healthy now, no new commit
    seq = t.current_seq()
    assert args.fn(args) == 0
    rep2 = json.loads(capsys.readouterr().out)
    assert "delta_compacted_to_seq" not in rep2 and t.current_seq() == seq


def test_cli_maintain_retention_policy(spark, tmp_path, capsys):
    """`maintain --retention-days` tombstones rows older than the cutoff
    through delete_where (a change-feed-visible CDC event), and a
    same-day re-run replays as an exactly-once no-op."""
    import datetime as dt
    import json

    from pyspark.sql import functions as F

    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    p = build_parser()
    tpath = str(tmp_path / "t")
    t = create_transcript_table(spark, tpath, n_buckets=2)
    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    now = dt.datetime.utcnow()
    old = now - dt.timedelta(days=30)
    rows = (
        [(k, "I", f"old{k}", 0, "user", "stale", "", old) for k in range(4)]
        + [(100 + k, "I", f"new{k}", 0, "user", "fresh", "", now)
           for k in range(4)]
    )
    apply_changes(t, spark.createDataFrame(rows, sch),
                  batch_key="b0", mode="mor")
    feed_before = t.read_changes(0).count()

    args = p.parse_args([
        "maintain", "--table", tpath, "--compact-threshold", "99",
        "--retention-days", "7",
    ])
    assert args.fn(args) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["retention_deleted"] == 4
    live = t.read().filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
    assert {r["conv_id"] for r in live.collect()} == {f"new{k}" for k in range(4)}
    # deletes are change-feed events — downstream consumers see them
    assert t.read_changes(0).count() == feed_before + 4

    # same-day re-run: ledger no-op, no new commit
    seq = t.current_seq()
    assert args.fn(args) == 0
    rep2 = json.loads(capsys.readouterr().out)
    assert rep2["retention_deleted"] == 0 and t.current_seq() == seq


def test_cli_changes_and_tail_since_timestamp(spark, tmp_path, capsys):
    """--since-timestamp resolves the feed start from the commit clock on
    both the batch (`changes`) and streaming (`tail`) consumers."""
    import datetime as dt
    import time as _time

    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    p = build_parser()
    tpath = str(tmp_path / "t")
    t = create_transcript_table(spark, tpath, n_buckets=2)
    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    apply_changes(t, spark.createDataFrame(
        [(1, "I", "early", 0, "u", "a", "", dt.datetime(2025, 1, 1))], sch),
        batch_key="b1", mode="mor")
    _time.sleep(0.3)
    mid = _time.time()
    _time.sleep(0.3)
    apply_changes(t, spark.createDataFrame(
        [(2, "I", "late", 0, "u", "b", "", dt.datetime(2025, 1, 1))], sch),
        batch_key="b2", mode="mor")

    args = p.parse_args(
        ["changes", "--table", tpath, "--since-timestamp", str(mid)]
    )
    assert args.fn(args) == 0
    out = capsys.readouterr().out
    assert "late" in out and "early" not in out

    args = p.parse_args([
        "tail", "--table", tpath, "--checkpoint", str(tmp_path / "ck"),
        "--since-timestamp", str(mid), "--once",
    ])
    assert args.fn(args) == 0
    out = capsys.readouterr().out
    assert '"late"' in out and "early" not in out


def test_cli_feed_transform_end_to_end(spark, tmp_path, capsys):
    """`feed-transform` deploys the materialized transform from SQL
    expressions: target == selectExpr over source live rows, target
    auto-created on first run, re-run a metadata no-op, group
    replacement on update."""
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    p = build_parser()
    src_path = str(tmp_path / "src")
    t = create_transcript_table(spark, src_path, n_buckets=2)
    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    apply_changes(t, spark.createDataFrame(
        [(1, "I", "c0", 0, "u", "alpha beta gamma", "", dt.datetime(2025, 1, 1)),
         (2, "I", "c1", 0, "u", "one two", "", dt.datetime(2025, 1, 1))], sch),
        batch_key="b1", mode="mor")

    argv = [
        "feed-transform", "--source", src_path,
        "--table", str(tmp_path / "chunks"),
        "--checkpoint", str(tmp_path / "ck"),
        "--expr", "conv_id", "--expr", "turn_idx", "--expr", "__lsn",
        "--expr", "posexplode(split(text, ' ')) AS (chunk_idx, chunk)",
        "--keys", "conv_id,turn_idx,chunk_idx",
    ]
    args = p.parse_args(argv)
    assert args.fn(args) == 0
    capsys.readouterr()
    tgt = IceliteTable.load(spark, str(tmp_path / "chunks"))
    live = tgt.read()
    if "__deleted" in live.columns:
        live = live.filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
    assert {(r["conv_id"], r["chunk_idx"], r["chunk"]) for r in live.collect()} == {
        ("c0", 0, "alpha"), ("c0", 1, "beta"), ("c0", 2, "gamma"),
        ("c1", 0, "one"), ("c1", 1, "two"),
    }

    # re-run with nothing new: metadata no-op
    seq = tgt.current_seq()
    assert args.fn(args) == 0
    capsys.readouterr()
    assert tgt.current_seq() == seq

    # update shrinks c0's group; the CLI pipeline replaces it
    apply_changes(t, spark.createDataFrame(
        [(5, "U", "c0", 0, "u", "solo", "", dt.datetime(2025, 1, 1))], sch),
        batch_key="b2", mode="mor")
    assert args.fn(args) == 0
    capsys.readouterr()
    live = tgt.read().filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
    assert {(r["conv_id"], r["chunk"]) for r in live.collect()} == {
        ("c0", "solo"), ("c1", "one"), ("c1", "two"),
    }


def test_cli_maintain_full_service_composition(spark, tmp_path, capsys):
    """One `maintain` invocation with every knob: retention tombstones
    old rows FIRST, the compaction threshold then folds them in the same
    pass, manifests consolidate, snapshots expire, orphans GC — and a
    second run is a no-op. The whole nightly service as one command."""
    import datetime as dt
    import json
    import time as _time

    from pyspark.sql import functions as F

    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    p = build_parser()
    tpath = str(tmp_path / "t")
    t = create_transcript_table(spark, tpath, n_buckets=2)
    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    now = dt.datetime.utcnow()
    old = now - dt.timedelta(days=45)
    for i in range(6):  # fragmented: 6 commits, half stale rows
        rows = [
            (100 * i + k, "I", f"c{i}-{k}", 0, "user", f"t{i}.{k}", "",
             old if k % 2 == 0 else now)
            for k in range(4)
        ]
        apply_changes(t, spark.createDataFrame(rows, sch),
                      batch_key=f"b{i}", mode="mor")
    live_fresh = t.read().filter(F.col("ts") > old).count()
    assert t.describe()["n_manifests"] == 6

    args = p.parse_args([
        "maintain", "--table", tpath,
        "--retention-days", "7",
        "--compact-threshold", "3",
        "--manifest-threshold", "2",
        "--delta-threshold", "1",
        "--keep-last", "2",
        "--orphan-grace-sec", "3600",
    ])
    assert args.fn(args) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["retention_deleted"] == 12
    assert "compacted_to_seq" in rep  # the tombstones folded this pass
    assert rep["after"]["n_manifests"] <= 2
    assert "expired" in rep and "orphans_removed" in rep
    live = t.read().filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
    assert live.count() == live_fresh
    assert live.filter(F.col("ts") <= old).count() == 0

    # second run same day: ledger no-op for retention, thresholds all
    # satisfied — no new commit
    seq = t.current_seq()
    assert args.fn(args) == 0
    rep2 = json.loads(capsys.readouterr().out)
    assert rep2["retention_deleted"] == 0
    assert "compacted_to_seq" not in rep2
    assert "manifests_rewritten_to_seq" not in rep2
    assert "delta_compacted_to_seq" not in rep2
    assert t.current_seq() == seq


def test_cli_tag_lifecycle(spark, tmp_path, capsys):
    """tag create/list/drop — pure metadata, no Spark session in the
    command path (IceliteTable(None, ...)); a tagged snapshot survives
    expiry and resolves through read(tag=...)."""
    import datetime as dt

    from etl_rust_spark.__main__ import build_parser
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    p = build_parser()
    tpath = str(tmp_path / "t")
    t = create_transcript_table(spark, tpath, n_buckets=4)
    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    rows = [(1, "I", "c0", 0, "user", "base", "", dt.datetime(2025, 1, 1))]
    apply_changes(t, spark.createDataFrame(rows, sch), batch_key="b0", mode="mor")

    args = p.parse_args(["tag", "create", "--table", tpath, "--name", "march"])
    assert args.fn(args) == 0
    assert "tagged snapshot 1 as 'march'" in capsys.readouterr().out

    rows2 = [(2, "I", "c1", 0, "user", "later", "", dt.datetime(2025, 1, 1))]
    apply_changes(t, spark.createDataFrame(rows2, sch), batch_key="b1", mode="mor")

    args = p.parse_args(["tag", "list", "--table", tpath])
    assert args.fn(args) == 0
    assert "march\tseq=1" in capsys.readouterr().out

    # the pin holds through expiry and resolves via read(tag=...)
    t.expire_snapshots(keep_last=1)
    assert t.read(tag="march").count() == 1

    args = p.parse_args(["tag", "drop", "--table", tpath, "--name", "march"])
    assert args.fn(args) == 0
    assert "dropped tag 'march'" in capsys.readouterr().out
    assert t.tags() == {}

    # drop of a missing tag fails loud; create without --name fails loud
    import pytest as _pytest
    args = p.parse_args(["tag", "drop", "--table", tpath, "--name", "nope"])
    with _pytest.raises(FileNotFoundError):
        args.fn(args)
    args = p.parse_args(["tag", "create", "--table", tpath])
    with _pytest.raises(SystemExit, match="requires --name"):
        args.fn(args)


def test_cli_feed_join_end_to_end(spark, tmp_path, capsys):
    """`feed-join` deploys the incremental join materialization: the
    target is derived+created on first run, equals A ⋈ B live, re-run is
    a metadata no-op, and a B-side delete shrinks the joined group."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_rust_spark.lake.format import IceliteTable

    a_schema = T.StructType([
        T.StructField("user_id", T.StringType()),
        T.StructField("plan", T.StringType()),
        T.StructField("lsn", T.LongType()),
    ])
    b_schema = T.StructType([
        T.StructField("user_id", T.StringType()),
        T.StructField("order_id", T.StringType()),
        T.StructField("amount", T.LongType()),
        T.StructField("lsn", T.LongType()),
    ])
    a = IceliteTable.create(
        spark, str(tmp_path / "a"), a_schema, key_cols=["user_id"],
        bucket_key="user_id", n_buckets=2, order_cols=["user_id"],
        seq_col="lsn",
    )
    b = IceliteTable.create(
        spark, str(tmp_path / "b"), b_schema,
        key_cols=["user_id", "order_id"], bucket_key="user_id",
        n_buckets=2, order_cols=["user_id", "order_id"], seq_col="lsn",
    )
    a.merge(spark.createDataFrame(
        [("u1", "free", 1), ("u2", "pro", 1)], a_schema
    ).withColumn("op", F.lit("U")), batch_key="a1", seq_col="lsn", mode="mor")
    b.merge(spark.createDataFrame(
        [("u1", "o1", 10, 1), ("u1", "o2", 20, 1), ("u3", "o9", 90, 1)],
        b_schema
    ).withColumn("op", F.lit("U")), batch_key="b1", seq_col="lsn", mode="mor")

    p = build_parser()
    argv = [
        "feed-join", "--a", str(tmp_path / "a"), "--b", str(tmp_path / "b"),
        "--table", str(tmp_path / "j"), "--checkpoint", str(tmp_path / "ck"),
        "--on", "user_id", "--n-buckets", "2",
    ]
    args = p.parse_args(argv)
    assert args.fn(args) == 0
    capsys.readouterr()
    tgt = IceliteTable.load(spark, str(tmp_path / "j"))
    live = tgt.read().filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
    assert {(r["user_id"], r["order_id_b"], r["plan"], r["amount_b"])
            for r in live.collect()} == {
        ("u1", "o1", "free", 10), ("u1", "o2", "free", 20),
    }

    # re-run with nothing new: metadata no-op
    seq = tgt.current_seq()
    assert args.fn(args) == 0
    capsys.readouterr()
    assert tgt.current_seq() == seq

    # B-side delete shrinks u1's group through the CLI pipeline
    b.merge(
        spark.createDataFrame([("u1", "o2", 0, 2)], b_schema)
        .withColumn("op", F.lit("U")).withColumn("__deleted", F.lit(True)),
        batch_key="b2", seq_col="lsn", mode="mor",
    )
    assert args.fn(args) == 0
    capsys.readouterr()
    live = tgt.read().filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
    assert {(r["user_id"], r["order_id_b"]) for r in live.collect()} == {
        ("u1", "o1"),
    }


def test_cli_check_end_to_end(spark, tmp_path, capsys):
    """Drive CHECK constraints through the CLI: add validates and lands
    metadata-only, list shows the rule, a violating ingest batch fails
    with per-rule counts, drop removes it and the batch then lands."""
    import datetime as dt

    import pytest

    from etl_rust_spark.__main__ import main
    from etl_rust_spark.lake.format import CheckViolationError, IceliteTable
    from etl_rust_spark.operators.apply import (
        apply_changes,
        create_transcript_table,
    )

    t = str(tmp_path / "t")
    tab = create_transcript_table(spark, t, n_buckets=2)
    ddl = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    seed = [(1, "I", "c0", 0, "user", "hi", "", dt.datetime(2025, 1, 1))]
    apply_changes(tab, spark.createDataFrame(seed, ddl), batch_key="b0",
                  mode="mor")

    assert main(["check", "--table", t,
                 "--add", "turn_nonneg", "turn_idx >= 0"]) == 0
    assert "metadata-only" in capsys.readouterr().out
    assert main(["check", "--table", t]) == 0
    assert "turn_idx >= 0" in capsys.readouterr().out

    bad = [(2, "I", "c1", -5, "user", "bad", "", dt.datetime(2025, 1, 2))]
    victim = IceliteTable.load(spark, t)
    seq0 = victim.current_seq()
    with pytest.raises(CheckViolationError, match="turn_nonneg: 1 rows"):
        apply_changes(victim, spark.createDataFrame(bad, ddl),
                      batch_key="b1", mode="mor")
    assert victim.current_seq() == seq0  # nothing written

    assert main(["check", "--table", t, "--drop", "turn_nonneg"]) == 0
    capsys.readouterr()
    apply_changes(IceliteTable.load(spark, t),
                  spark.createDataFrame(bad, ddl), batch_key="b1", mode="mor")
    live = IceliteTable.load(spark, t).read()
    assert live.filter("conv_id = 'c1'").count() == 1


def test_cli_add_column_and_age_expire_end_to_end(spark, tmp_path, capsys):
    import datetime as dt

    from etl_rust_spark.__main__ import main
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    tpath = str(tmp_path / "t")
    t = create_transcript_table(spark, tpath, n_buckets=4)
    rows = [(1, "I", "c0", 0, "user", "hello", "", dt.datetime(2025, 1, 1))]
    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    apply_changes(t, spark.createDataFrame(rows, sch), batch_key="b0", mode="mor")

    assert main(["add-column", "--table", tpath, "--column", "lang",
                 "--type", "string"]) == 0
    out = capsys.readouterr().out
    assert "added lang string" in out and "metadata-only" in out
    t2 = IceliteTable.load(spark, tpath)
    assert [r["lang"] for r in t2.read().collect()] == [None]

    # age-based expiry with a cutoff in the past removes nothing
    assert main(["expire", "--table", tpath, "--keep-last", "1",
                 "--older-than", "2020-01-01T00:00:00"]) == 0
    assert "removed 0 files" in capsys.readouterr().out
    assert t2.read().count() == 1


def test_cli_maintain_age_based_expiry(spark, tmp_path, capsys):
    """`maintain --expire-older-than-days` composes age with keep_last:
    a cutoff older than every snapshot expires nothing (even with
    keep-last 1 and many snapshots past it), while age 0 falls back to
    pure keep_last retention."""
    import datetime as dt
    import json

    from etl_rust_spark.__main__ import build_parser
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    p = build_parser()
    a = p.parse_args(["maintain", "--table", "/t",
                      "--expire-older-than-days", "30"])
    assert a.expire_older_than_days == 30.0 and a.keep_last is None

    tpath = str(tmp_path / "t")
    t = create_transcript_table(spark, tpath, n_buckets=2)
    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    for i in range(4):
        rows = [(10 * i, "I", f"c{i}", 0, "user", f"t{i}", "",
                 dt.datetime(2025, 1, 1))]
        apply_changes(t, spark.createDataFrame(rows, sch),
                      batch_key=f"b{i}", mode="mor")
    # compact so superseded pre-compaction files are reclaimable
    t.compact()

    args = p.parse_args([
        "maintain", "--table", tpath, "--compact-threshold", "999",
        "--keep-last", "1", "--expire-older-than-days", "365",
    ])
    assert args.fn(args) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["expired"] == 0  # nothing is a year old yet

    args = p.parse_args([
        "maintain", "--table", tpath, "--compact-threshold", "999",
        "--keep-last", "1", "--expire-older-than-days", "0",
    ])
    assert args.fn(args) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["expired"] > 0  # age gate open -> keep_last drives expiry
    t2 = IceliteTable.load(spark, tpath)
    assert t2.read().count() == 4  # live state untouched either way
