"""Measure the metadata-first aggregates against their full-scan twins.

Builds a moderately large table (seeded changelog -> MoR ingest ->
compact), then times count_live / min_max in the compacted state vs
read()-based answers. Run on an IDLE box (bench hygiene, BENCH.md):

    python scripts/metadata_agg_bench.py [n_events]

Prints one JSON line. The point at 100 TB is asymmetry, not the local
milliseconds: the metadata tier is O(manifests) driver-side while the
scan twin is O(table); on this box the gap is already orders of
magnitude at a few million rows.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_rust_spark.changelog import ChangelogConfig, generate_changelog_pandas
from etl_rust_spark.operators.apply import (
    apply_changes,
    create_transcript_table,
    read_transcripts,
)
from etl_rust_spark.session import get_spark


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = get_spark("metadata-agg-bench")
    root = tempfile.mkdtemp(prefix="metacount-")
    try:
        t = create_transcript_table(spark, os.path.join(root, "t"), n_buckets=32)
        # delete-free (append/update-only) — the shape whose compacted
        # state is PURE metadata; deleted-key tombstone files instead pay
        # a boolean-column scan (covered by tests/test_count_live.py)
        cfg = ChangelogConfig(
            n_conversations=n_events // 32,
            turns_per_conv=8,
            n_events=n_events,
            delete_fraction=0.0,
            seed=7,
        )
        log = generate_changelog_pandas(cfg)
        n_batches = 8
        step = (len(log) + n_batches - 1) // n_batches
        for i in range(n_batches):
            chunk = log.iloc[i * step:(i + 1) * step]
            if len(chunk) == 0:
                continue
            apply_changes(t, spark.createDataFrame(chunk),
                          batch_key=f"b{i}", mode="mor")
        t.compact()

        t0 = time.time()
        meta = t.count_live(detail=True)
        t_meta = time.time() - t0

        t0 = time.time()
        scan = read_transcripts(t).count()
        t_scan = time.time() - t0

        t0 = time.time()
        mm = t.min_max("ts", detail=True)
        t_mm_meta = time.time() - t0

        t0 = time.time()
        r = read_transcripts(t).agg(F.min("ts"), F.max("ts")).first()
        t_mm_scan = time.time() - t0

        assert meta["count"] == scan, (meta, scan)
        assert (mm["min"], mm["max"]) == (r[0], r[1]), (mm, r)
        print(json.dumps({
            "events": n_events,
            "live_rows": scan,
            "count_live_sec": round(t_meta, 4),
            "count_scan_sec": round(t_scan, 4),
            "count_speedup": round(t_scan / max(t_meta, 1e-9), 1),
            "count_detail": {k: meta[k] for k in (
                "metadata_files", "tombstone_scan_files",
                "dedup_scan_buckets")},
            "min_max_meta_sec": round(t_mm_meta, 4),
            "min_max_scan_sec": round(t_mm_scan, 4),
            "min_max_detail": {k: mm[k] for k in (
                "metadata_files", "scan_files", "dedup_scan_buckets")},
        }))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
