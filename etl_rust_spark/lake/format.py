"""Icelite — a from-scratch lake-table format with Iceberg semantics.

No Iceberg/Delta jars ship in this environment, and the north rule demands
an exactly-once, schema-evolving, snapshot-isolated MERGE sink. Icelite
provides exactly that surface in pure PySpark + Parquet:

- **Snapshots**: every commit writes an immutable JSON manifest
  ``_manifests/snap-<seq>.json`` via write-temp + atomic ``os.rename``.
  The current snapshot is the highest ``seq``. Readers always see a
  complete, consistent file list (ACID read isolation); time travel is
  ``read(seq=k)``.
- **Copy-on-write MERGE with bucket pruning**: data files are laid out by
  ``bucket = pmod(xxhash64(bucket_key), n_buckets)``. A merge touches only
  the buckets containing changed keys: read those files, anti-join out the
  changed keys, union the upserts, rewrite just those buckets. Untouched
  buckets carry their file entries forward unchanged. At 100 TB /
  n_buckets=4096 this bounds a micro-batch rewrite to (batch keyspread /
  4096) of the table instead of a full rewrite, and the key-hash layout
  makes the anti-join a co-partitioned shuffle on exactly the merge key.
- **Exactly-once**: the manifest carries an ``applied_batches`` ledger
  (batch_key -> commit seq). Re-delivering a micro-batch after a crash or
  checkpoint replay is a metadata-only no-op. (The reference has no such
  guarantee — a replayed batch aborts on PK violation,
  /root/reference/example/src/main.rs:489-493.)
- **Schema evolution**: the manifest stores the table schema; a merge whose
  batch carries new columns commits the union schema, and old files are
  read through it with null backfill (Spark's parquet reader fills columns
  missing from the footer with nulls).
- **Lineage**: every commit appends a per-commit, per-bucket record
  (rows, files, wall time, batch key, commit seq) to the manifest;
  ``lineage()`` exposes the full history as a DataFrame.

Single-writer-per-table is assumed (matches the reference's usage of one
pipeline per sink table, /root/reference/example/src/main.rs:690-693);
a concurrent commit loses the atomic-rename race and raises.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FORMAT_VERSION = 1
_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the same sequence number first."""


def _bucket_expr(bucket_key: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(bucket_key)), F.lit(n_buckets)).cast("int")


class IceliteTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._manifest_dir = os.path.join(self.path, _MANIFEST_DIR)
        if not os.path.isdir(self._manifest_dir):
            raise FileNotFoundError(f"not an Icelite table: {path}")

    # ---------------------------------------------------------------- create
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_cols: list[str] | tuple[str, ...] = ("conv_id", "turn_idx"),
        bucket_key: str = "conv_id",
        n_buckets: int = 32,
        order_cols: list[str] | tuple[str, ...] | None = None,
        seq_col: str | None = None,
        if_not_exists: bool = False,
    ) -> "IceliteTable":
        path = os.path.abspath(path)
        mdir = os.path.join(path, _MANIFEST_DIR)
        if os.path.isdir(mdir):
            if if_not_exists:
                return cls(spark, path)
            raise FileExistsError(f"Icelite table already exists: {path}")
        os.makedirs(mdir, exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)
        manifest = {
            "format_version": FORMAT_VERSION,
            "seq": 0,
            "parent_seq": None,
            "snapshot_id": str(uuid.uuid4()),
            "schema": schema.jsonValue(),
            "key_cols": list(key_cols),
            "bucket_key": bucket_key,
            "n_buckets": int(n_buckets),
            "order_cols": list(order_cols or key_cols),
            "seq_col": seq_col,
            "files": [],
            "applied_batches": {},
            "lineage": [],
        }
        _atomic_write_manifest(mdir, 0, manifest)
        return cls(spark, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IceliteTable":
        return cls(spark, path)

    # ------------------------------------------------------------- snapshots
    def _manifest_path(self, seq: int) -> str:
        return os.path.join(self._manifest_dir, f"snap-{seq:08d}.json")

    def current_seq(self) -> int:
        snaps = glob.glob(os.path.join(self._manifest_dir, "snap-*.json"))
        if not snaps:
            raise FileNotFoundError(f"no snapshots in {self._manifest_dir}")
        return max(int(os.path.basename(p)[5:13]) for p in snaps)

    def snapshot(self, seq: int | None = None) -> dict:
        seq = self.current_seq() if seq is None else seq
        with open(self._manifest_path(seq)) as f:
            return json.load(f)

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.snapshot()["schema"])

    # ----------------------------------------------------------------- read
    def read(self, seq: int | None = None, buckets: set[int] | None = None) -> DataFrame:
        """Snapshot-consistent read; optional bucket pruning.

        With merge-on-read delta files present, the read applies the
        last-writer-wins dedup (max seq_col per key) over base ∪ deltas —
        Iceberg v2 semantics. Compaction folds deltas back to base."""
        snap = self.snapshot(seq)
        schema = T.StructType.fromJson(snap["schema"])
        files = snap["files"]
        if buckets is not None:
            files = [f for f in files if f["bucket"] in buckets]
        if not files:
            return self.spark.createDataFrame([], schema)
        # explicit schema => old files lacking evolved columns null-backfill
        df = (
            self.spark.read.schema(schema)
            .parquet(*[f["path"] for f in files])
            .select(*[fld.name for fld in schema.fields])
        )
        has_delta = any(f.get("kind", "base") == "delta" for f in files)
        if has_delta and snap.get("seq_col"):
            df = _dedup_by_seq(df, snap["key_cols"], snap["seq_col"], schema)
        return df

    def read_keys(self, values, seq: int | None = None) -> DataFrame:
        """Point/key lookup with bucket pruning: only the data files whose
        bucket can contain the requested ``bucket_key`` values are read —
        at n_buckets=4096 a single-conversation lookup touches ~1/4096 of
        the table's files, no full scan. ``values`` is an iterable of
        bucket-key values (e.g. conv_ids)."""
        snap = self.snapshot(seq)
        n_buckets = snap["n_buckets"]
        vals = list(values)
        # bucket ids computed the same way the writer laid files out
        one = self.spark.createDataFrame(
            [(v,) for v in vals], f"{snap['bucket_key']} string"
        ).select(_bucket_expr(snap["bucket_key"], n_buckets).alias("b"))
        buckets = {int(r["b"]) for r in one.collect()}
        df = self.read(seq=seq, buckets=buckets)
        return df.filter(F.col(snap["bucket_key"]).isin(vals))

    def lineage(self) -> DataFrame:
        """Per-commit lineage ledger as a DataFrame (offsets/batch keys,
        commit seq, row counts, per-bucket row counts, wall time)."""
        snap = self.snapshot()
        lineage_schema = (
            "commit_seq long, batch_key string, source string, n_changes long, "
            "n_upserts long, n_deletes long, touched_buckets array<int>, "
            "files_added int, files_removed int, rows_written long, "
            "per_bucket_rows map<string,long>, wall_ms double, committed_at string"
        )
        cols = [
            "commit_seq", "batch_key", "source", "n_changes", "n_upserts",
            "n_deletes", "touched_buckets", "files_added", "files_removed",
            "rows_written", "per_bucket_rows", "wall_ms", "committed_at",
        ]
        rows = [tuple(r.get(c) for c in cols) for r in snap["lineage"]]
        return self.spark.createDataFrame(rows, lineage_schema)

    def applied_batches(self) -> dict:
        return self.snapshot()["applied_batches"]

    # ---------------------------------------------------------------- merge
    def merge(
        self,
        changes: DataFrame,
        batch_key: str | None = None,
        op_col: str = "op",
        source: str = "batch",
        seq_col: str | None = None,
        mode: str = "cow",
    ) -> dict | None:
        """Copy-on-write MERGE of deduplicated changes (one row per key).

        ``changes`` must contain the key columns, the payload columns
        (superset/subset of table schema — new columns evolve the schema,
        missing payload columns are null-filled), and ``op_col`` with
        'I'/'U' (upsert) or 'D' (delete).

        Three merge strategies:
        - **anti-join copy-on-write** (default): old ∖ changed-keys ∪
          upserts, touched buckets rewritten. Generic.
        - **seq-agg copy-on-write** (``seq_col`` given): old ∪ changes →
          groupBy(key) → max(struct(seq, ...)). ONE hash aggregation
          replaces both the late-data guard join and the anti-join;
          map-side partial agg collapses hot keys before the shuffle.
          Requires all change rows be upserts (deletes as tombstones).
        - **merge-on-read** (``mode="mor"``, requires seq_col): the commit
          only appends the batch winners as DELTA files — O(batch) write,
          no read/rewrite of existing data. Readers dedup base ∪ deltas by
          max seq (Iceberg v2 semantics); ``compact()`` folds deltas back
          into base files. This is what keeps ingest linear when every
          micro-batch touches every bucket (CoW write amplification is
          O(table) per batch in that regime).

        Returns the lineage record for the commit, or None when
        ``batch_key`` is already in the applied ledger (idempotent replay).
        """
        t0 = time.monotonic()
        snap = self.snapshot()
        if batch_key is not None and batch_key in snap["applied_batches"]:
            return None
        key_cols = snap["key_cols"]
        bucket_key = snap["bucket_key"]
        n_buckets = snap["n_buckets"]
        old_schema = T.StructType.fromJson(snap["schema"])

        merged_schema = _merge_schema(old_schema, changes.drop(op_col).schema)

        bexpr = _bucket_expr(bucket_key, n_buckets)
        ch = changes.withColumn("__bucket", bexpr)
        is_delete = F.col(op_col) == "D"
        if "__deleted" in ch.columns:  # tombstone-style deletes count too
            is_delete = is_delete | F.coalesce(F.col("__deleted"), F.lit(False))

        old_files = snap["files"]
        observation = None
        if mode == "mor":
            # FAST PATH: no pre-read, no stats job — batch counts ride the
            # write job via observe(); touched buckets come from the
            # written file footers. One Spark job per micro-batch.
            if seq_col is None or not snap.get("seq_col"):
                raise ValueError("merge-on-read requires a table seq_col")
            from pyspark.sql import Observation

            observation = Observation()
            ch = ch.observe(
                observation,
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.when(is_delete, 1).otherwise(0)).alias("dels"),
            )
            touched = None
            keep_files, rewrite_files = list(old_files), []
        else:
            # CoW needs the touched-bucket set BEFORE reading old files →
            # one stats pass over the (cached) batch
            ch = ch.persist()
            stats = ch.groupBy("__bucket").agg(
                F.count("*").alias("rows"),
                F.sum(F.when(is_delete, 1).otherwise(0)).alias("dels"),
            ).collect()
            touched = sorted(int(r["__bucket"]) for r in stats)
            n_changes = sum(r["rows"] for r in stats)
            n_deletes = sum(r["dels"] for r in stats)
            keep_files = [f for f in old_files if f["bucket"] not in set(touched)]
            rewrite_files = [f for f in old_files if f["bucket"] in set(touched)]

        try:

            old = None
            if rewrite_files:
                # explicit merged schema => evolved columns null-backfill
                old = (
                    self.spark.read.schema(merged_schema)
                    .parquet(*[f["path"] for f in rewrite_files])
                    .select(*[f.name for f in merged_schema.fields])
                )

            upserts = ch.filter(F.col(op_col) != "D").drop(op_col, "__bucket")
            for fld in merged_schema.fields:
                if fld.name not in upserts.columns:
                    upserts = upserts.withColumn(fld.name, F.lit(None).cast(fld.dataType))
            upserts = upserts.select(*[f.name for f in merged_schema.fields])

            if old is None:
                new_data = upserts
            elif seq_col is not None:
                # single-shuffle last-writer-wins over old ∪ new; the seq
                # column leads the struct so max() picks the newest row
                new_data = _dedup_by_seq(
                    old.unionByName(upserts), key_cols, seq_col, merged_schema
                )
            else:
                # keys are co-bucketed: this anti-join shuffles only the
                # touched slice of the table; small change-sets broadcast
                survivors = old.join(ch.select(*key_cols), on=key_cols, how="left_anti")
                new_data = survivors.unionByName(upserts)

            commit_seq = snap["seq"] + 1
            commit_dir = os.path.join(self.path, _DATA_DIR, f"commit-{commit_seq:08d}")
            # write layout: each bucket spreads over at most `spread` tasks
            # (bounded file count per bucket) while a hot conversation still
            # splits across tasks (skew-aware write); sortWithinPartitions
            # gives stable (conv_id, turn_idx) clustering inside each file
            shuffle_n = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
            n_touched = len(touched) if touched is not None else n_buckets
            spread = max(1, shuffle_n // max(1, n_touched))
            wkey = F.pmod(
                F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(spread)
            )
            (
                new_data.withColumn("__bucket", bexpr)
                .repartition(F.col("__bucket"), wkey)
                .sortWithinPartitions("__bucket", *snap["order_cols"])
                .write.partitionBy("__bucket")
                .mode("overwrite")
                .parquet(commit_dir)
            )
            new_files, rows_written, per_bucket = _scan_commit_dir(commit_dir)
            if mode == "mor":
                if old_files:
                    for f in new_files:
                        f["kind"] = "delta"
                touched = sorted(per_bucket)
                m = observation.get
                n_changes, n_deletes = int(m["rows"]), int(m["dels"] or 0)
            n_upserts = n_changes - n_deletes
        finally:
            if mode != "mor":
                ch.unpersist()

        lineage_rec = {
            "commit_seq": commit_seq,
            "batch_key": batch_key,
            "source": source,
            "n_changes": int(n_changes),
            "n_upserts": int(n_upserts),
            "n_deletes": int(n_deletes),
            "touched_buckets": touched,
            "files_added": len(new_files),
            "files_removed": len(rewrite_files),
            "rows_written": int(rows_written),
            "per_bucket_rows": {str(k): int(v) for k, v in per_bucket.items()},
            "wall_ms": round((time.monotonic() - t0) * 1000.0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        manifest = {
            "format_version": FORMAT_VERSION,
            "seq": commit_seq,
            "parent_seq": snap["seq"],
            "snapshot_id": str(uuid.uuid4()),
            "schema": merged_schema.jsonValue(),
            "key_cols": key_cols,
            "bucket_key": bucket_key,
            "n_buckets": n_buckets,
            "order_cols": snap["order_cols"],
            "seq_col": snap.get("seq_col"),
            "files": keep_files + new_files,
            "applied_batches": {
                **snap["applied_batches"],
                **({batch_key: commit_seq} if batch_key is not None else {}),
            },
            "lineage": snap["lineage"] + [lineage_rec],
        }
        _atomic_write_manifest(self._manifest_dir, commit_seq, manifest)
        return lineage_rec

    # ------------------------------------------------------------- maintain
    def compact(self) -> dict:
        """Rewrite the live file set into one file per bucket (small-file
        compaction after many micro-batch commits)."""
        snap = self.snapshot()
        df = self.read()
        commit_seq = snap["seq"] + 1
        commit_dir = os.path.join(self.path, _DATA_DIR, f"commit-{commit_seq:08d}")
        bexpr = _bucket_expr(snap["bucket_key"], snap["n_buckets"])
        (
            df.withColumn("__bucket", bexpr)
            .repartition(F.col("__bucket"))
            .sortWithinPartitions("__bucket", *snap["order_cols"])
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(commit_dir)
        )
        new_files, rows_written, per_bucket = _scan_commit_dir(commit_dir)
        manifest = {**snap}
        manifest.update(
            seq=commit_seq,
            parent_seq=snap["seq"],
            snapshot_id=str(uuid.uuid4()),
            files=new_files,
            lineage=snap["lineage"]
            + [{"commit_seq": commit_seq, "batch_key": None, "source": "compact",
                "n_changes": 0, "n_upserts": 0, "n_deletes": 0,
                "touched_buckets": sorted(per_bucket), "files_added": len(new_files),
                "files_removed": len(snap["files"]), "rows_written": int(rows_written),
                "per_bucket_rows": {str(k): int(v) for k, v in per_bucket.items()},
                "wall_ms": 0.0,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}],
        )
        _atomic_write_manifest(self._manifest_dir, commit_seq, manifest)
        return manifest

    def expire_snapshots(self, keep_last: int = 2) -> list[str]:
        """Delete data files referenced only by expired snapshots."""
        cur = self.current_seq()
        keep_seqs = set(range(max(0, cur - keep_last + 1), cur + 1))
        live: set[str] = set()
        for s in keep_seqs:
            try:
                live |= {f["path"] for f in self.snapshot(s)["files"]}
            except FileNotFoundError:
                continue
        removed = []
        for p in glob.glob(os.path.join(self.path, _DATA_DIR, "commit-*", "**", "*.parquet"), recursive=True):
            if p not in live:
                os.remove(p)
                removed.append(p)
        for s in range(0, cur):
            if s not in keep_seqs:
                mp = self._manifest_path(s)
                if os.path.exists(mp):
                    os.remove(mp)
        return removed


def _dedup_by_seq(df: DataFrame, key_cols, seq_col: str, schema: T.StructType) -> DataFrame:
    """Last-writer-wins per key by max(seq): one hash aggregation with
    map-side partial agg (shared by seq-agg merge and merge-on-read
    reads)."""
    rest = [f.name for f in schema.fields if f.name not in key_cols and f.name != seq_col]
    row = F.struct(F.col(seq_col), *[F.col(c) for c in rest]).alias("__row")
    return (
        df.groupBy(*key_cols)
        .agg(F.max(row).alias("__row"))
        .select(
            *key_cols,
            F.col(f"__row.{seq_col}").alias(seq_col),
            *[F.col(f"__row.{c}").alias(c) for c in rest],
        )
        .select(*[f.name for f in schema.fields])
    )


def _merge_schema(old: T.StructType, new: T.StructType) -> T.StructType:
    """Union schema: old columns keep position/type; new columns append.
    Type conflicts are an error (no implicit casts — matches Iceberg's
    strict evolution)."""
    by_name = {f.name: f for f in old.fields}
    fields = list(old.fields)
    for f in new.fields:
        if f.name in by_name:
            if by_name[f.name].dataType != f.dataType:
                raise TypeError(
                    f"schema evolution type conflict on '{f.name}': "
                    f"{by_name[f.name].dataType} vs {f.dataType}"
                )
        else:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)


def _scan_commit_dir(commit_dir: str):
    """List written files + row counts from parquet footers (driver-side,
    no extra Spark job)."""
    import pyarrow.parquet as pq

    files, total, per_bucket = [], 0, {}
    for p in sorted(
        glob.glob(os.path.join(commit_dir, "__bucket=*", "*.parquet"))
    ):
        bucket = int(os.path.basename(os.path.dirname(p)).split("=")[1])
        rows = pq.ParquetFile(p).metadata.num_rows
        if rows == 0:
            continue
        files.append({"path": p, "bucket": bucket, "rows": int(rows)})
        total += rows
        per_bucket[bucket] = per_bucket.get(bucket, 0) + rows
    return files, total, per_bucket


def _atomic_write_manifest(manifest_dir: str, seq: int, manifest: dict) -> None:
    final = os.path.join(manifest_dir, f"snap-{seq:08d}.json")
    if os.path.exists(final):
        raise ConcurrentCommitError(f"snapshot {seq} already committed")
    tmp = final + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.rename(tmp, final)
    except OSError as e:  # pragma: no cover
        os.unlink(tmp)
        raise ConcurrentCommitError(str(e))
