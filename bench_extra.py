"""Isolated per-piece benchmarks (guide §1.4) — NOT the driver's bench.

``bench.py`` is the frozen round-feedback harness; this file reuses its
exact workload functions to time ONE piece at a time on an idle box, so
an optimization's effect is measured without the suite's写-back noise.

    python bench_extra.py feeds        # replicate/scd2/enrich/transform/join
    python bench_extra.py chain
    python bench_extra.py migration
    python bench_extra.py ingest       # cow + mor
    python bench_extra.py queries [name ...]

Each run prints one JSON line per piece. Numbers quoted in
OPTIMIZATION_r06.md cite this harness.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # the frozen harness: reuse its workload functions verbatim
from etl_rust_spark.queries import QUERIES
from etl_rust_spark.session import get_spark


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "feeds"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count())
    spark = get_spark(
        "bench_extra", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    workdir = tempfile.mkdtemp(prefix="bench_extra_")
    out: dict = {"piece": what}
    try:
        if what == "queries":
            names = sys.argv[2:] or bench.BENCH_QUERIES
            for name in names:
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.monotonic()
                QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                out[name] = round(time.monotonic() - t0, 3)
            print(json.dumps(out))
            return
        if what == "migration":
            out["reference_migration_s"] = round(
                bench.bench_migration(spark, workdir, bench.MIGRATE_USERS), 3
            )
            out["records_per_sec"] = int(
                21 * bench.MIGRATE_USERS / out["reference_migration_s"]
            )
        elif what == "ingest":
            cow_paths = bench._materialize_batches(
                spark, workdir, "cow", bench.CDC_EVENTS // 4
            )
            out["cdc_ingest_cow"] = round(
                bench.bench_cdc_once(spark, workdir, "cow", cow_paths), 3
            )
            for p in cow_paths:
                shutil.rmtree(p, ignore_errors=True)
            mor_paths = bench._materialize_batches(
                spark, workdir, "mor", bench.CDC_EVENTS
            )
            os.sync()
            out["cdc_ingest_mor"] = round(
                bench.bench_cdc_once(spark, workdir, "mor", mor_paths), 3
            )
            out["events_per_sec"] = int(
                bench.CDC_EVENTS / out["cdc_ingest_mor"]
            )
        elif what == "chain":
            out["cdc_chain"] = round(
                bench.bench_chain(spark, workdir, bench.CHAIN_EVENTS), 3
            )
            out["chain_hop_secs"] = list(bench.bench_chain.hop_secs)
        elif what == "feeds":
            repl = bench.bench_replicate(
                spark, workdir, bench.REPLICATE_EVENTS
            )
            out["replicate"] = repl
            src = os.path.join(workdir, "repl_a")
            out["scd2"] = bench.bench_scd2(spark, workdir, src)
            out["enrich"] = bench.bench_enrich(spark, workdir, src)
            out["transform"] = bench.bench_transform(spark, workdir, src)
            out["join"] = bench.bench_join(spark, workdir, src)
        else:
            raise SystemExit(f"unknown piece {what!r}")
        print(json.dumps(out))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
