"""Headline-slice run: N change events through the MoR ingest kernel in
16M-event batches — the doubling-ladder protocol behind BENCH.md §1
(32M → 128M → 256M → 512M). Flat events/s across doublings is the
10^10 argument's backbone: nothing in the per-commit path may grow with
accumulated table size (O(batch) deltas, O(files-added) manifests,
footer-harvested stats).

Protocol (identical to the r4 256M run): per batch, GENERATE the input
parquet (untimed), INGEST it through apply_changes mode=mor (timed),
delete the input; one final compaction (timed). Calibration probes
bracket the run so a steal window is visible in the record.

Usage: SLICE_EVENTS=512000000 python scripts/headline_slice.py
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

EVENTS = int(os.environ.get("SLICE_EVENTS", "512000000"))
BATCH = int(os.environ.get("SLICE_BATCH", "16000000"))
CPUS = int(os.environ.get("SLICE_CPUS", "32"))
N_BUCKETS = int(os.environ.get("SLICE_BUCKETS", "64"))


def calibration_probe(spark, cores: int) -> int:
    from pyspark.sql import functions as F

    for n in (cores * 1_000_000, cores * 10_000_000):  # first pass = warmup
        t0 = time.monotonic()
        (
            spark.range(n, numPartitions=cores)
            .select(F.xxhash64(F.xxhash64(F.xxhash64("id"))).alias("h"))
            .agg(F.bit_xor("h"))
            .collect()
        )
    return int(n / (time.monotonic() - t0))


def main() -> None:
    spark = get_spark(
        "headline-slice", master=f"local[{CPUS}]", shuffle_partitions=N_BUCKETS
    )
    n_batches = EVENTS // BATCH
    n_convs = EVENTS // 64  # ~60% key-distinct events, turns_per_conv=64
    workdir = tempfile.mkdtemp(prefix="slice_")
    calib_before = calibration_probe(spark, CPUS)
    ingest_secs = 0.0
    try:
        table = create_transcript_table(
            spark, os.path.join(workdir, "t"), n_buckets=N_BUCKETS
        )
        for i in range(n_batches):
            p = os.path.join(workdir, f"batch-{i}")
            generate_changelog_spark(
                spark, BATCH, n_conversations=n_convs, turns_per_conv=64,
                skew_alpha=1.1, start=i * BATCH,
            ).write.mode("overwrite").parquet(p)
            t0 = time.monotonic()
            apply_changes(
                table, spark.read.parquet(p), batch_key=f"slice:{i}", mode="mor"
            )
            ingest_secs += time.monotonic() - t0
            shutil.rmtree(p, ignore_errors=True)
            print(
                f"batch {i + 1}/{n_batches}: cumulative {ingest_secs:.1f}s "
                f"({int((i + 1) * BATCH / ingest_secs):,} events/s)",
                file=sys.stderr,
            )
        t0 = time.monotonic()
        table.compact()
        ingest_secs += time.monotonic() - t0
        final_rows = table.read().count()
        calib_after = calibration_probe(spark, CPUS)
        print(
            json.dumps(
                {
                    "metric": "headline_slice",
                    "events": EVENTS,
                    "batches": n_batches,
                    "seconds": round(ingest_secs, 1),
                    "events_per_sec": int(EVENTS / ingest_secs),
                    "final_state_rows": final_rows,
                    "n_buckets": N_BUCKETS,
                    "cpus": CPUS,
                    "calibration_before": calib_before,
                    "calibration_after": calib_after,
                }
            )
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
