"""Steady-state soak: many merge-on-read micro-batches with periodic
compaction + snapshot expiry. Verifies what a single bench run can't:
commit latency stays flat, file counts stay bounded, the ledger keeps
growing idempotently, and the final state still equals a full-replay
computed independently.

Usage: python scripts/soak.py [n_batches] [events_per_batch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_rust_spark.changelog import generate_changelog_spark
from etl_rust_spark.lake.format import _dedup_by_seq
from etl_rust_spark.operators.apply import (
    LSN_COL,
    apply_changes,
    create_transcript_table,
)
from etl_rust_spark.session import get_spark


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    compact_every = 5
    # partial compaction: only buckets with more than this many files
    # rewrite (unset = full compaction each cycle)
    min_files = os.environ.get("SOAK_COMPACT_MIN_FILES")
    min_files = int(min_files) if min_files else None
    spark = get_spark("soak")
    work = tempfile.mkdtemp(prefix="soak_")
    try:
        table = create_transcript_table(spark, f"{work}/tbl", n_buckets=32)
        latencies, file_counts, pointer_bytes, snap_load_ms = [], [], [], []
        for i in range(n_batches):
            batch = generate_changelog_spark(
                spark, per_batch, n_conversations=100_000, turns_per_conv=64,
                start=i * per_batch,
            )
            t0 = time.monotonic()
            apply_changes(table, batch, batch_key=f"soak:{i}", mode="mor")
            if (i + 1) % compact_every == 0:
                table.compact(min_files_per_bucket=min_files)
                table.expire_snapshots(keep_last=3)
            latencies.append(round(time.monotonic() - t0, 2))
            file_counts.append(len(table.snapshot()["files"]))
            # metadata-scaling probes: pointer size and cold snapshot
            # resolution cost must stay FLAT as commits accumulate
            pointer_bytes.append(
                os.path.getsize(table._pointer_path(table.current_seq()))
            )
            t0 = time.monotonic()
            fresh = type(table)(spark, table.path)  # empty caches
            fresh.snapshot()
            snap_load_ms.append(round((time.monotonic() - t0) * 1000.0, 1))
        # full-replay check: engine state == one-shot dedup of all events
        total = n_batches * per_batch
        alllog = generate_changelog_spark(
            spark, total, n_conversations=100_000, turns_per_conv=64
        )
        expect = _dedup_by_seq(
            alllog.withColumnRenamed("lsn", LSN_COL),
            ["conv_id", "turn_idx"], LSN_COL,
            alllog.withColumnRenamed("lsn", LSN_COL).schema,
        ).filter(F.col("op") != "D")
        got = table.read().filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
        n_expect, n_got = expect.count(), got.count()
        mismatch = (
            got.select("conv_id", "turn_idx", LSN_COL)
            .exceptAll(expect.select("conv_id", "turn_idx", LSN_COL))
            .count()
        )
        print(json.dumps({
            "batches": n_batches,
            "events_per_batch": per_batch,
            "commit_sec": latencies,
            "commit_sec_first5_avg": round(sum(latencies[:5]) / 5, 2),
            "commit_sec_last5_avg": round(sum(latencies[-5:]) / 5, 2),
            "file_counts": file_counts,
            "pointer_bytes_first5_avg": round(sum(pointer_bytes[:5]) / 5),
            "pointer_bytes_last5_avg": round(sum(pointer_bytes[-5:]) / 5),
            "pointer_bytes_max": max(pointer_bytes),
            "snap_load_ms_first5_avg": round(sum(snap_load_ms[:5]) / 5, 1),
            "snap_load_ms_last5_avg": round(sum(snap_load_ms[-5:]) / 5, 1),
            "final_rows": n_got,
            "expected_rows": n_expect,
            "key_mismatches": mismatch,
            "ledger_entries": len(table.applied_batches()),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
