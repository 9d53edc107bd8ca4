"""Icelite as a native Spark STREAMING SINK — the write half of the
``format("icelite")`` pair:

    spark.readStream.format("icelite").option("path", src).load()
         .drop("_commit_seq")
         .writeStream.format("icelite").option("path", dst)
         .option("checkpointLocation", ckpt).start()

is a complete exactly-once table→table CDC replication chain with ZERO
shuffles: source tasks read change files, sink tasks hash-bucket and
write their own partitions, and the driver's commit is pure metadata.
Built on Spark 4's public Python Data Source API
(``DataSourceStreamArrowWriter`` — executors hand the sink Arrow
RecordBatches; the driver gets the tasks' commit messages plus the
micro-batch id). Reference analog: the load half of the reference's
pipeline (bounded batch insert + flush, /root/reference/src/bucket/
bucket.rs:93-206), re-expressed as an ACID lake commit.

Contract (fail-loud by design):

- the target table must already exist with a ``seq_col`` (merge-on-read
  append semantics — every commit is O(batch));
- input rows are WINNER-SHAPED: the table's full schema by name
  (order free, types exact), i.e. ``__lsn`` carries the CDC sequence and
  deletes arrive as ``__deleted=true`` tombstone rows — exactly what
  ``readStream.format("icelite")`` emits and what ``apply_changes``
  produces before its merge. Raw op='I/U/D' change events should go
  through ``apply_changes`` (JVM dedup + merge), not this sink;
- schema evolution does NOT flow through the sink: a column
  added/renamed/dropped on the target mid-stream fails the batch fast
  (restart re-validates), mirroring the source's mid-stream rename
  contract; a rebucket mid-stream fails the same way;
- multiple concurrent sink queries into one table are safe (append-only
  commits always rebase) but must use distinct ``sinkId``s.

Exactly-once: the commit carries ``batch_key = {sinkId}-{batchId}``
into the table's applied-batch ledger — Structured Streaming replays a
micro-batch after a crash with the SAME batchId, and the ledger turns
the replay into a no-op (the same idempotence contract as
``apply_changes``; the sinkId defaults to a hash of the checkpoint
location, so distinct queries never collide and one query's restarts
always collide). Task retries/speculation are handled by uuid file
names in a per-query staging dir: only files named in the SUCCESSFUL
tasks' commit messages are committed; the rest is debris, deleted at
the next commit/abort.

One-winner-per-key-per-commit (the feed/preimage invariant): each task
locally collapses its rows to max-``seq_col`` per key (vectorized;
Arrow in, Arrow out). Keys spanning tasks — absent whenever the
upstream is key-partitioned, e.g. any groupBy/agg or an icelite source
partitioned by file bucket — are resolved at commit time from a
key+seq COLUMN-PRUNED read of the staged files; only files holding
losing rows are rewritten. The common path reads two thin columns and
rewrites nothing; the worst case is bounded by the micro-batch, never
the table.

Scale notes (disclosed): staging lives under the table path, so sink
tasks need the same shared filesystem/object store any lake writer
needs. Buckets are hashed in the Python worker with a bit-exact XXH64
port (functions/xxh64.py) — integer keys vectorize via numpy; string
keys hash per value. This is the TAIL-shaped path (micro-batches,
incremental); bulk backfill belongs to ``apply_changes``.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

_STAGING_DIR = "_dsw_staging"


@dataclass
class IceliteSinkCommitMessage(WriterCommitMessage):
    files: list = field(default_factory=list)  # [{path, bucket, rows}]
    rows: int = 0
    deletes: int = 0
    # write-time layout + schema: the driver-side committer is a FRESH
    # instance in a separate runner process (it cannot see the pickled
    # writer's state), and the cols-stamp in _commit_rebasing must
    # describe what the files PHYSICALLY contain
    n_buckets: int = 0
    bucket_key: str = ""
    schema_json: str = ""


class IceliteStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, options, schema: T.StructType, overwrite: bool = False):
        if overwrite:
            raise ValueError(
                "format('icelite') sink is append-only (merge-on-read "
                "delta commits); use outputMode('append')"
            )
        path = options.get("path")
        if not path:
            raise ValueError("format('icelite') sink requires .option('path', ...)")
        self.path = os.path.abspath(path)
        from etl_rust_spark.sources.icelite_source import _TableMeta

        meta = _TableMeta(self.path)
        ptr = meta.pointer(meta.current_seq())
        if not ptr.get("seq_col"):
            raise ValueError(
                "the native sink appends merge-on-read commits, which "
                "require a seq_col table (reader-side max-seq dedup)"
            )
        if ptr.get("agg_cols"):
            raise ValueError(
                "format('icelite') sink targets a last-writer-wins table; "
                "an additive (agg_cols) target would lose partials to the "
                "sink's per-commit winner collapse. Maintain additive "
                "rollups with table.merge(...) in foreachBatch instead."
            )
        if ptr.get("checks") and options.get(
            "upstreamchecked", "false"
        ).lower() != "true":
            raise ValueError(
                "the target table carries CHECK constraints "
                f"({sorted(ptr['checks'])}) which the native sink cannot "
                "evaluate (its writers are per-partition Arrow tasks, not "
                "a driver DataFrame). Replicate from a source that "
                "already enforced them and pass "
                ".option('upstreamChecked', 'true'), or ingest through "
                "apply_changes/merge which enforce checks."
            )
        table_schema = T.StructType.fromJson(ptr["schema"])
        want = {f.name: f.dataType for f in table_schema.fields}
        got = {f.name: f.dataType for f in schema.fields}
        if set(want) != set(got):
            raise ValueError(
                "input schema must match the table schema by name "
                f"(winner-shaped rows): table has {sorted(want)}, "
                f"input has {sorted(got)}. Feed raw change events "
                "through apply_changes instead."
            )
        mism = [n for n in want if want[n] != got[n]]
        if mism:
            raise ValueError(
                "input column types must match the table exactly; "
                f"mismatched: {[(n, str(got[n]), str(want[n])) for n in mism]}"
            )
        self.schema_json = json.dumps(table_schema.jsonValue())
        self.key_cols = list(ptr["key_cols"])
        self.seq_col = ptr["seq_col"]
        self.bucket_key = ptr["bucket_key"]
        self.n_buckets = int(ptr["n_buckets"])
        self.order_cols = list(ptr["order_cols"])
        self.col_order = [f.name for f in table_schema.fields]
        sink_id = options.get("sinkid")
        if not sink_id:
            ckpt = options.get("checkpointlocation", "")
            sink_id = "dsw-" + hashlib.md5(ckpt.encode()).hexdigest()[:10]
        self.sink_id = sink_id
        self.staging = os.path.join(self.path, _STAGING_DIR, self.sink_id)

    # ------------------------------------------------------------ executors
    def write(self, iterator) -> IceliteSinkCommitMessage:
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from etl_rust_spark.functions.xxh64 import spark_bucket_of

        batches = list(iterator)
        msg = IceliteSinkCommitMessage(
            n_buckets=self.n_buckets,
            bucket_key=self.bucket_key,
            schema_json=self.schema_json,
        )
        if not batches:
            return msg
        tbl = pa.Table.from_batches(batches).select(self.col_order)
        if tbl.num_rows == 0:
            return msg
        for k in (*self.key_cols, self.seq_col):
            if tbl.column(k).null_count:
                raise ValueError(f"null {k!r} in sink input (CDC keys are non-null)")
        # task-local winner collapse: max seq per key. The DUP CHECK is
        # pure Arrow — a cold python worker importing pandas costs ~5
        # CPU-s of contended startup, and the steady-state tail (one
        # winner per key per upstream commit) never has task-local dups,
        # so the fast path must not pay the import. pandas loads only
        # when a dup actually exists.
        import pyarrow.compute as pc_

        counts = (
            tbl.select(self.key_cols)
            .group_by(self.key_cols)
            .aggregate([([], "count_all")])
        )
        if pc_.max(counts.column("count_all")).as_py() > 1:
            proj = tbl.select([*self.key_cols, self.seq_col]).to_pandas()
            keep = (
                proj.groupby(self.key_cols, sort=False)[self.seq_col]
                .idxmax()
                .to_numpy()
            )
            keep.sort()
            tbl = tbl.take(pa.array(keep))
        buckets = spark_bucket_of(tbl.column(self.bucket_key), self.n_buckets)
        os.makedirs(self.staging, exist_ok=True)
        import pyarrow.compute as pc

        has_dels = "__deleted" in self.col_order
        for b in np.unique(buckets):
            sub = tbl.take(pa.array(np.nonzero(buckets == b)[0]))
            sub = sub.sort_by([(c, "ascending") for c in self.order_cols])
            fname = os.path.join(
                self.staging, f"part-{uuid.uuid4().hex}-b{int(b):05d}.parquet"
            )
            pq.write_table(sub, fname)
            dels = (
                int(pc.sum(pc.cast(sub.column("__deleted"), pa.int64())).as_py() or 0)
                if has_dels
                else 0
            )
            msg.files.append(
                {"path": fname, "bucket": int(b), "rows": sub.num_rows, "dels": dels}
            )
            msg.deletes += dels
        msg.rows = tbl.num_rows
        return msg

    # --------------------------------------------------------------- driver
    def commit(self, messages, batchId: int) -> None:
        t0 = time.monotonic()
        from etl_rust_spark.lake.format import _DATA_DIR, IceliteTable, _merge_schema

        table = IceliteTable(None, self.path)
        batch_key = f"{self.sink_id}-{batchId}"
        ptr = table.pointer()
        if table.is_applied(batch_key, ptr):
            self._clean_staging()  # replay after a post-commit crash
            return
        msgs = [m for m in messages if m is not None]
        files = [f for m in msgs for f in m.files]
        write_schema = None
        for m in msgs:
            if (m.n_buckets, m.bucket_key) != (ptr["n_buckets"], ptr["bucket_key"]):
                raise ValueError(
                    "table was rebucketed mid-stream — the batch's files "
                    "were hashed under the old layout; restart the sink query"
                )
            write_schema = T.StructType.fromJson(json.loads(m.schema_json))
        if write_schema is not None and json.dumps(write_schema.jsonValue()) != json.dumps(
            T.StructType.fromJson(ptr["schema"]).jsonValue()
        ):
            raise ValueError(
                "table schema evolved mid-stream (column add/rename/drop "
                "landed after the sink subscribed) — restart the sink "
                "query so it re-validates against the new schema"
            )
        deletes = sum(m.deletes for m in msgs)
        if files:
            files, deletes = self._resolve_cross_task_winners(files, deletes)
        commit_dir = os.path.join(
            self.path, _DATA_DIR, f"commit-{ptr['seq'] + 1:08d}-{uuid.uuid4().hex[:8]}"
        )
        if files:
            for f in files:
                dest_dir = os.path.join(commit_dir, f"__bucket={f['bucket']}")
                os.makedirs(dest_dir, exist_ok=True)
                os.rename(f["path"], os.path.join(dest_dir, os.path.basename(f["path"])))
            new_files, rows_written, per_bucket = table._scan_commit_dir(commit_dir)
            if ptr["manifests"]:
                for e in new_files:
                    e["kind"] = "delta"
        else:
            new_files, rows_written, per_bucket = [], 0, {}
        seq_stats = [
            e["stats"].get(self.seq_col, [None, None]) for e in new_files
        ]
        lsn_los = [s[0] for s in seq_stats if s[0] is not None]
        lsn_his = [s[1] for s in seq_stats if s[1] is not None]
        lineage_rec = {
            "commit_seq": ptr["seq"] + 1,
            "batch_key": batch_key,
            "source": "stream-sink",
            "n_changes": int(rows_written),
            "n_upserts": int(rows_written - deletes),
            "n_deletes": int(deletes),
            "lsn_min": int(min(lsn_los)) if lsn_los else None,
            "lsn_max": int(max(lsn_his)) if lsn_his else None,
            "touched_buckets": sorted(per_bucket),
            "files_added": len(new_files),
            "files_removed": 0,
            "rows_written": int(rows_written),
            "per_bucket_rows": {str(k): int(v) for k, v in per_bucket.items()},
            "wall_ms": round((time.monotonic() - t0) * 1000.0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        # schema passed = WRITE-TIME schema (what the files physically
        # contain; validated identical to the parent pointer's above) —
        # a RACING concurrent add is re-merged by _commit_rebasing with
        # the cols-stamp still describing the files' own columns, the
        # same path merge() takes
        schema = (
            write_schema
            if write_schema is not None
            else T.StructType.fromJson(ptr["schema"])
        )
        schema = _merge_schema(T.StructType.fromJson(ptr["schema"]), schema)
        table._commit_rebasing(
            ptr,
            schema,
            list(ptr["manifests"]),
            new_files,
            batch_key,
            lineage_rec,
            commit_dir if files else None,
        )
        self._clean_staging()

    def abort(self, messages, batchId: int) -> None:
        self._clean_staging()

    def _clean_staging(self) -> None:
        for p in glob.glob(os.path.join(self.staging, "*.parquet")):
            try:
                os.remove(p)
            except OSError:
                pass

    def _resolve_cross_task_winners(self, files: list, deletes: int):
        """Enforce one winner per key per COMMIT across tasks.

        Same-key collisions can only occur WITHIN a bucket (the key
        leads the bucket hash), so resolution is bucket-scoped: the thin
        key+seq projection of each file is read in a thread pool
        (pyarrow releases the GIL), buckets whose keys are unique —
        every bucket, whenever the upstream is key-partitioned or the
        batch spans one source commit — are untouched, and only files
        holding LOSING rows in a dirty bucket are rewritten (also in
        parallel). Work is bounded by the colliding slice of the
        micro-batch, never the batch, never the table. Ties on equal
        seq resolve deterministically by task-message order."""
        by_bucket: dict = {}
        for i, f in enumerate(files):
            by_bucket.setdefault(f["bucket"], []).append(i)
        multi = [idxs for idxs in by_bucket.values() if len(idxs) > 1]
        if not multi:
            return files, deletes
        from concurrent.futures import ThreadPoolExecutor

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        cols = [*self.key_cols, self.seq_col]
        pool = ThreadPoolExecutor(max_workers=min(16, os.cpu_count() or 4))

        def _thin(i):
            d = pq.read_table(files[i]["path"], columns=cols).to_pandas()
            d["__file"] = i
            return d

        candidates = [i for idxs in multi for i in idxs]
        thins = dict(zip(candidates, pool.map(_thin, candidates)))
        keep_by_file: dict = {}
        drop_files: set = set()
        for idxs in multi:
            allk = pd.concat([thins[i] for i in idxs], ignore_index=True)
            if not allk.duplicated(self.key_cols).any():
                continue
            allk["__row"] = allk.groupby("__file").cumcount()
            winners = allk.loc[
                allk.groupby(self.key_cols, sort=False)[self.seq_col].idxmax()
            ]
            per_file = {i: g["__row"].to_numpy() for i, g in winners.groupby("__file")}
            for i in idxs:
                keep = per_file.get(i)
                if keep is None or len(keep) == 0:
                    drop_files.add(i)
                elif len(keep) != len(thins[i]):
                    keep_by_file[i] = keep
        if not keep_by_file and not drop_files:
            return files, deletes

        def _rewrite(item):
            i, keep = item
            full = pq.read_table(files[i]["path"])
            keep = keep.copy()
            keep.sort()
            full = full.take(pa.array(keep))
            tmp = files[i]["path"] + ".rw"
            pq.write_table(full, tmp)
            os.replace(tmp, files[i]["path"])
            return i, full

        rewritten = dict(pool.map(_rewrite, keep_by_file.items()))
        pool.shutdown()
        kept_files, new_deletes = [], 0
        import pyarrow.compute as pc

        for i, f in enumerate(files):
            if i in drop_files:
                os.remove(f["path"])
                continue
            if i in rewritten:
                full = rewritten[i]
                dels = (
                    int(pc.sum(pc.cast(full.column("__deleted"), pa.int64())).as_py() or 0)
                    if "__deleted" in full.column_names
                    else 0
                )
                kept_files.append({**f, "rows": full.num_rows, "dels": dels})
            else:
                kept_files.append(f)
            new_deletes += kept_files[-1].get("dels", 0)
        return kept_files, new_deletes
