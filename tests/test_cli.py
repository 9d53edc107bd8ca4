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
