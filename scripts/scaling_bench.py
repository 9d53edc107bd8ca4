"""Scaling evidence for the north rule's N→4N criterion.

No real cluster exists in this sandbox, so the two-cluster-size criterion
is evidenced by running the IDENTICAL ingest job at two parallelism levels
(local[8] vs local[32], shuffle partitions = cores) on the SAME
pre-generated input, reporting throughput at both plus scaling efficiency
  eff = (events_per_sec[32] / events_per_sec[8]) / 4.

Each measurement runs in its own process (fresh JVM) via this script's
worker mode, so no state leaks between parallelism levels.

Usage:
  python scripts/scaling_bench.py                 # full run, prints JSON
  python scripts/scaling_bench.py worker N DIR    # internal
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS = int(os.environ.get("SCALING_EVENTS", "32000000"))
BATCHES = 4
REPEATS = int(os.environ.get("SCALING_REPEATS", "3"))
CORES = [int(c) for c in os.environ.get("SCALING_CORES", "8,32").split(",")]
# shuffle through tmpfs: the sandbox's single shared disk would otherwise
# serialize shuffle I/O that a real cluster spreads across node-local disks
LOCAL_DIR = os.environ.get("SCALING_LOCAL_DIR", "/dev/shm/spark-local")


def gen(workdir: str) -> None:
    from etl_rust_spark.changelog import generate_changelog_spark
    from etl_rust_spark.session import get_spark

    spark = get_spark("scaling-gen", master="local[32]")
    per = EVENTS // BATCHES
    for i in range(BATCHES):
        generate_changelog_spark(
            spark, per, n_conversations=1_000_000, turns_per_conv=64,
            start=i * per,
        ).write.mode("overwrite").parquet(os.path.join(workdir, f"batch-{i}"))
    spark.stop()


def worker(cores: int, workdir: str) -> None:
    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table
    from etl_rust_spark.session import get_spark

    os.makedirs(LOCAL_DIR, exist_ok=True)
    spark = get_spark(
        f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=cores,
        extra_conf={"spark.local.dir": LOCAL_DIR},
    )
    # warm codegen/JIT outside the measured window
    warm = create_transcript_table(spark, os.path.join(workdir, f"warm-{cores}"), n_buckets=8)
    apply_changes(
        warm, spark.read.parquet(os.path.join(workdir, "batch-0")).limit(10_000),
        batch_key="warm", mode="mor",
    )
    table = create_transcript_table(
        spark, os.path.join(workdir, f"table-{cores}"), n_buckets=32
    )
    t0 = time.monotonic()
    for i in range(BATCHES):
        apply_changes(
            table,
            spark.read.parquet(os.path.join(workdir, f"batch-{i}")),
            batch_key=f"b{i}",
            mode="mor",
        )
    table.compact()
    dt = time.monotonic() - t0
    print(json.dumps({"cores": cores, "sec": round(dt, 2),
                      "events_per_sec": int(EVENTS / dt)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), sys.argv[3])
        return
    lo, hi = CORES
    workdir = tempfile.mkdtemp(prefix="scaling_")
    try:
        gen(workdir)
        # interleave the two core counts across repeats so time-varying
        # host CPU steal hits both fairly; take best-of-N per level
        results: dict[int, dict] = {}
        runs: dict[int, list] = {lo: [], hi: []}
        for _ in range(REPEATS):
            for cores in (lo, hi):
                for d in (f"table-{cores}", f"warm-{cores}"):
                    shutil.rmtree(os.path.join(workdir, d), ignore_errors=True)
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "worker",
                     str(cores), workdir],
                    capture_output=True, text=True, check=True,
                )
                rec = json.loads(out.stdout.strip().splitlines()[-1])
                runs[cores].append(rec["sec"])
                if cores not in results or rec["sec"] < results[cores]["sec"]:
                    results[cores] = rec
        factor = hi / lo
        eff = (
            results[hi]["events_per_sec"] / results[lo]["events_per_sec"]
        ) / factor
        print(json.dumps({
            "events": EVENTS,
            f"local{lo}": {**results[lo], "all_sec": runs[lo]},
            f"local{hi}": {**results[hi], "all_sec": runs[hi]},
            "speedup": round(
                results[hi]["events_per_sec"] / results[lo]["events_per_sec"], 3
            ),
            "core_factor": factor,
            "scaling_efficiency": round(eff, 3),
        }))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        shutil.rmtree(LOCAL_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
