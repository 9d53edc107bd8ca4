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
