"""Consumer fan-out measurement for ``format("icelite")`` sharding.

The question a 100-TB deployment asks: k downstream pipelines each need
the change feed — does that cost k full-feed scans, or ~1×? With
``option("shard", "i/k")`` each consumer plans only the files whose
bucket ≡ i (mod k) at the MANIFEST level, so the k consumers together
read each change file exactly once (disjoint + complete), and each
consumer's wall clock shrinks toward 1/k of the full drain.

Protocol: build a MoR table (``SHARD_EVENTS`` events across
``SHARD_COMMITS`` commits, ``SHARD_BUCKETS`` buckets), then time a full
batch-feed drain vs each of k=``SHARD_K`` sharded drains (same forced
full-column scan), recording files planned per shard from the manifest
layer. Prints one JSON line.

Usage:
  python scripts/shard_bench.py
  SHARD_EVENTS=4000000 SHARD_K=4 python scripts/shard_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_rust_spark.changelog import generate_changelog_spark  # noqa: E402
from etl_rust_spark.operators.apply import (  # noqa: E402
    apply_changes,
    create_transcript_table,
)
from etl_rust_spark.session import get_spark  # noqa: E402
from etl_rust_spark.sources import register_icelite_source  # noqa: E402
from etl_rust_spark.sources.icelite_source import _TableMeta  # noqa: E402

EVENTS = int(os.environ.get("SHARD_EVENTS", 2_000_000))
COMMITS = int(os.environ.get("SHARD_COMMITS", 8))
BUCKETS = int(os.environ.get("SHARD_BUCKETS", 64))
K = int(os.environ.get("SHARD_K", 4))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", 32))


def _drain_secs(spark, path: str, shard: str | None) -> tuple[float, int]:
    """Force a full-column scan of the batch change feed; (secs, rows)."""
    r = spark.read.format("icelite").option("path", path)
    if shard is not None:
        r = r.option("shard", shard)
    t0 = time.monotonic()
    # the Python data source materializes every column through the Arrow
    # data plane (no reader-side pruning), so count() is a full scan —
    # identical work per delivered row in all runs
    n = r.load().count()
    return time.monotonic() - t0, n


def main() -> None:
    spark = get_spark("shard_bench", master=f"local[{CORES}]")
    register_icelite_source(spark)
    wd = tempfile.mkdtemp(prefix="shard_bench_")
    try:
        tpath = os.path.join(wd, "t")
        t = create_transcript_table(spark, tpath, n_buckets=BUCKETS)
        per = EVENTS // COMMITS
        for c in range(COMMITS):
            batch = generate_changelog_spark(
                spark,
                per,
                n_conversations=max(1000, EVENTS // 100),
                turns_per_conv=30,
                seed=77,
                start=c * per,
            )
            apply_changes(t, batch, batch_key=f"b{c}", mode="mor")

        meta = _TableMeta(tpath)
        seq = t.current_seq()
        files_full = len(meta.change_files(0, seq))
        files_shard = [len(meta.change_files(0, seq, (i, K))) for i in range(K)]

        full_s, full_rows = _drain_secs(spark, tpath, None)
        shard_s, shard_rows = [], []
        for i in range(K):
            s, n = _drain_secs(spark, tpath, f"{i}/{K}")
            shard_s.append(round(s, 3))
            shard_rows.append(n)

        out = {
            "metric": "icelite_shard_fanout",
            "events": EVENTS,
            "commits": COMMITS,
            "k": K,
            "full_s": round(full_s, 3),
            "shard_s": shard_s,
            "max_shard_s": max(shard_s),
            "speedup_vs_full": round(full_s / max(shard_s), 3),
            "files_full": files_full,
            "files_per_shard": files_shard,
            "rows_full": full_rows,
            "rows_shards_sum": sum(shard_rows),
            "disjoint_complete": sum(shard_rows) == full_rows
            and sum(files_shard) == files_full,
        }
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
