"""Write-amplification comparison: full partial compaction vs minor
(delta-only) compaction on the steady-state shape — one large sorted
base file per bucket plus a trickle of small micro-batch deltas.

Both paths produce byte-identical read results; the difference is what
they WRITE. Full compaction rewrites base+deltas (O(bucket bytes));
compact_deltas folds only the deltas (O(delta bytes)). At 100 TB, the
nightly maintenance bill is the difference.

Usage: python scripts/minor_compaction_bench.py [base_events] [n_deltas]
       [events_per_delta]
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


def _build(spark, path: str, base_events: int, n_deltas: int, per_delta: int):
    table = create_transcript_table(spark, path, n_buckets=32)
    base = generate_changelog_spark(
        spark, base_events, n_conversations=200_000, turns_per_conv=64,
    )
    apply_changes(table, base, batch_key="base", mode="mor")
    table.compact()  # pure base layout
    for i in range(n_deltas):
        delta = generate_changelog_spark(
            spark, per_delta, n_conversations=200_000, turns_per_conv=64,
            start=base_events + i * per_delta,
        )
        apply_changes(table, delta, batch_key=f"d{i}", mode="mor")
    return table


def _final_rows(table) -> int:
    from pyspark.sql import functions as F

    return (
        table.read()
        .filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
        .count()
    )


def main() -> None:
    base_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_deltas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    per_delta = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    spark = get_spark("minor_compaction_bench")
    work = tempfile.mkdtemp(prefix="minorbench_")
    out = {"metric": "minor_vs_full_compaction", "base_events": base_events,
           "n_deltas": n_deltas, "events_per_delta": per_delta}
    try:
        for mode in ("minor", "full"):
            path = f"{work}/tbl_{mode}"
            table = _build(spark, path, base_events, n_deltas, per_delta)
            rows_before = _final_rows(table)
            t0 = time.monotonic()
            if mode == "minor":
                snap = table.compact_deltas(min_delta_files_per_bucket=0)
            else:
                snap = table.compact(min_files_per_bucket=1)
            wall = round(time.monotonic() - t0, 2)
            rec = next(
                r for r in table.lineage().collect()
                if r["commit_seq"] == snap["seq"]
            )
            out[mode] = {
                "wall_s": wall,
                "rows_written": int(rec["rows_written"]),
                "files_added": int(rec["files_added"]),
                "files_removed": int(rec["files_removed"]),
            }
            assert _final_rows(table) == rows_before
            shutil.rmtree(path, ignore_errors=True)
        out["rows_written_ratio"] = round(
            out["full"]["rows_written"] / max(1, out["minor"]["rows_written"]), 1
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
