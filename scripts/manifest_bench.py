"""Metadata-fragmentation microbench for rewrite_manifests.

An append-only merge-on-read table (no compaction — the files are
healthy, only the metadata fragments) accumulates one manifest per
commit. This measures what that costs at the driver and what the
metadata-only consolidation buys back:

- pointer bytes (every commit rewrites the pointer, which lists all
  live manifests);
- cold metadata resolution (fresh table handle: open pointer + every
  manifest JSON — what every reader pays before the first Spark job);
- pruned-read planning wall (read(where=key) end-to-end count);
- rewrite_manifests wall time itself (one driver-side JSON pass).

Usage: python scripts/manifest_bench.py [n_commits] [events_per_batch]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_rust_spark.changelog import generate_changelog_spark
from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.operators.apply import apply_changes, create_transcript_table
from etl_rust_spark.session import get_spark


def _cold_resolve_ms(spark, path: str) -> float:
    t0 = time.monotonic()
    t = IceliteTable.load(spark, path)  # fresh handle: empty caches
    ptr = t.pointer()
    n = len(t._files(ptr))
    ms = (time.monotonic() - t0) * 1000.0
    assert n > 0
    return round(ms, 2)


def _pruned_read_ms(spark, path: str, conv: str) -> tuple[float, int]:
    t = IceliteTable.load(spark, path)
    t0 = time.monotonic()
    n = t.read(where=[("conv_id", "=", conv)]).count()
    return round((time.monotonic() - t0) * 1000.0, 2), n


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    spark = get_spark("manifest_bench")
    work = tempfile.mkdtemp(prefix="manifest_bench_")
    try:
        path = f"{work}/tbl"
        table = create_transcript_table(spark, path, n_buckets=32)
        for i in range(n_commits):
            batch = generate_changelog_spark(
                spark, per_batch, n_conversations=50_000, turns_per_conv=64,
                start=i * per_batch,
            )
            apply_changes(table, batch, batch_key=f"mb:{i}", mode="mor")
        conv = table.read().select("conv_id").limit(1).collect()[0][0]
        ptr_path = table._pointer_path(table.current_seq())
        before = {
            "n_manifests": table.describe()["n_manifests"],
            "pointer_bytes": os.path.getsize(ptr_path),
            "cold_resolve_ms": min(
                _cold_resolve_ms(spark, path) for _ in range(3)
            ),
            "pruned_read_ms": min(
                _pruned_read_ms(spark, path, conv)[0] for _ in range(3)
            ),
        }
        rows_before = table.read().count()
        t0 = time.monotonic()
        table.rewrite_manifests()
        rewrite_ms = round((time.monotonic() - t0) * 1000.0, 2)
        ptr_path = table._pointer_path(table.current_seq())
        after = {
            "n_manifests": table.describe()["n_manifests"],
            "pointer_bytes": os.path.getsize(ptr_path),
            "cold_resolve_ms": min(
                _cold_resolve_ms(spark, path) for _ in range(3)
            ),
            "pruned_read_ms": min(
                _pruned_read_ms(spark, path, conv)[0] for _ in range(3)
            ),
        }
        assert table.read().count() == rows_before
        print(json.dumps({
            "metric": "manifest_consolidation",
            "n_commits": n_commits,
            "events_per_batch": per_batch,
            "rewrite_ms": rewrite_ms,
            "before": before,
            "after": after,
            "rows": rows_before,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
