"""Icelite as a first-class Spark STREAMING SOURCE — the downstream half
of the CDC story: after the WAL→table ingest lands commits, any number of
consumers (feature pipelines, index builders, rollup jobs) tail the table
itself as a structured stream:

    spark.dataSource.register(IceliteDataSource)
    spark.readStream.format("icelite").option("path", table_path).load()

Built on Spark 4's Python Data Source API (public:
pyspark.sql.datasource.DataSourceStreamReader). Offsets are COMMIT
SEQUENCES — the table's own atomic history — so the stream is
exactly-once resumable from any checkpoint: offset {"seq": N} means
"everything through commit N has been delivered"; a restart replays
nothing and misses nothing (the same contract the reference's consumers
get from Postgres LSNs, re-expressed over the lake's commit log;
reference analog: the change-consuming side of src/etl/processor.rs).

Semantics match ``IceliteTable.read_changes``: rows are the batch WINNERS
each merge-on-read commit appended (upserts + ``__deleted`` tombstones +
``__lsn``), annotated with ``_commit_seq``. Compaction/rebucket commits
are invisible (rewrites, not changes); a copy-on-write commit in range
fails the stream fast, exactly like the batch API.

Consumer-side scale-out: ``option("shard", "i/k")`` gives consumer i of
k a disjoint slice of the feed by file bucket (bucket % k == i), pruned
at the manifest level — k parallel downstream pipelines (each with its
own checkpoint) partition the feed completely without k full scans.
``option("maxCommitsPerBatch", n)`` bounds backlog catch-up.
``option("columns", "a,b")`` projects the feed to the named columns
(+ ``_commit_seq``) — the Arrow data plane then decodes only those
parquet columns, so a narrow consumer of a wide table reads narrow.

Data-plane note (disclosed): partitions are read by pyarrow in Python
workers — the Python Data Source API's execution model — with one
partition per data file for parallelism. That is the right trade for a
TAIL consumer (incremental, small batches); bulk historical catch-up
should use the JVM-side ``read_changes`` batch API. Column resolution is
field-id aware: files written before a rename/drop are remapped through
their manifest-recorded id→name stamps, columns that postdate a file are
null-backfilled — same rules as the JVM reader (`format._read_file_groups`).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_MANIFEST_DIR = "_manifests"  # keep in sync with lake.format
_LINEAGE_DIR = "_lineage"

# lineage sources that rewrite or touch only metadata — never changes
_NON_CHANGE_SOURCES = ("compact", "rebucket", "rename", "drop",
                       "rewrite_manifests", "clone")


# --------------------------------------------------------------------------
# driver-side metadata (pure filesystem reads — no SparkSession available
# inside a DataSource, and none needed: the Icelite pointer/manifest/
# lineage files are small JSON)
# --------------------------------------------------------------------------


class _TableMeta:
    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        self.mdir = os.path.join(self.path, _MANIFEST_DIR)
        if not os.path.isdir(self.mdir):
            raise FileNotFoundError(f"not an Icelite table: {path}")

    def current_seq(self) -> int:
        snaps = glob.glob(os.path.join(self.mdir, "snap-*.json"))
        if not snaps:
            raise FileNotFoundError(f"no snapshots in {self.path}")
        return max(int(os.path.basename(p)[5:13]) for p in snaps)

    def pointer(self, seq: int) -> dict:
        with open(os.path.join(self.mdir, f"snap-{seq:08d}.json")) as f:
            return json.load(f)

    def seq_as_of(self, ts_epoch: float) -> int:
        """Latest snapshot committed at or before ``ts_epoch`` (mirror of
        IceliteTable.seq_as_of, mtime fallback for pre-stamp pointers).

        A timestamp predating the table's creation resolves to 0 (the
        full feed — snapshot 0 proves nothing was missed). But when
        ``expire_snapshots`` has removed the early history, a timestamp
        older than the OLDEST RETAINED snapshot raises: the feed cannot
        prove completeness from that instant, so the consumer must
        resync from a snapshot rather than silently receive a later
        slice."""
        best, oldest = None, None
        for p in glob.glob(os.path.join(self.mdir, "snap-*.json")):
            s = int(os.path.basename(p)[5:13])
            try:
                ptr = self.pointer(s)
            except FileNotFoundError:
                continue
            at = ptr.get("committed_at_epoch") or os.path.getmtime(p)
            if at <= ts_epoch and (best is None or s > best):
                best = s
            if oldest is None or s < oldest:
                oldest = s
        if best is not None:
            return best
        if oldest == 0:
            return 0  # table created after ts: everything follows it
        raise ValueError(
            f"no retained snapshot committed at or before epoch {ts_epoch} "
            "— the requested start predates the retention window; resync "
            "from a snapshot instead"
        )

    def manifest(self, name: str) -> list:
        with open(os.path.join(self.mdir, name)) as f:
            return json.load(f)

    def lineage_record(self, seq: int) -> dict | None:
        # mirror IceliteTable._lineage_record: the pointer names its own
        # lineage file (v3), but an EXPIRED snapshot's pointer is gone —
        # lineage records outlive expiry, so fall back to the glob
        try:
            name = self.pointer(seq).get("lineage_file")
        except FileNotFoundError:
            name = None
        cands = (
            [os.path.join(self.path, _LINEAGE_DIR, name)]
            if name
            else sorted(
                glob.glob(
                    os.path.join(self.path, _LINEAGE_DIR, f"lineage-{seq:08d}*.json")
                )
            )
        )
        for p in cands:
            if os.path.exists(p):
                with open(p) as f:
                    return json.load(f)
        return None

    def added_manifests(self, seq: int) -> list[str]:
        # mirror IceliteTable._added_manifests incl. the expired-pointer
        # glob fallback (uuid-token-strict so a losing attempt's crash
        # debris at the same seq never matches)
        try:
            ptr = self.pointer(seq)
        except FileNotFoundError:
            ptr = None
        if ptr is not None and ptr.get("added_manifests") is not None:
            return list(ptr["added_manifests"])
        if ptr is not None:
            # pre-v3 pointer: diff against the parent's manifest set
            parent = ptr.get("parent_seq")
            try:
                prev = (
                    {m["name"] for m in self.pointer(parent)["manifests"]}
                    if parent is not None
                    else set()
                )
                return [m["name"] for m in ptr["manifests"] if m["name"] not in prev]
            except FileNotFoundError:
                pass
        import re as _re

        pat = _re.compile(rf"manifest-{seq:08d}(-[0-9a-f]{{8}})?\.json")
        return sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(self.mdir, f"manifest-{seq:08d}*.json"))
            if pat.fullmatch(os.path.basename(p))
        )

    def change_commits(self, since_seq: int, until_seq: int) -> list[int]:
        """The CHANGE commits in (since, until] — lineage-record
        metadata only (no manifest reads): non-change sources are
        skipped, rollback/copy-on-write commits fail fast with the same
        messages as ``IceliteTable.read_changes``. This is the planning
        surface of the offsets-only feed (``option("offsetsOnly")``)."""
        out = []
        for s in range(since_seq + 1, until_seq + 1):
            rec = self.lineage_record(s)
            if rec is None:
                raise FileNotFoundError(f"no lineage record for commit {s}")
            if rec["source"] == "rollback":
                raise ValueError(
                    f"commit {s} is a rollback (state reverted to seq "
                    f"{rec.get('rolled_back_to')}) — a change feed cannot "
                    "express un-delivery; restart the consumer from a "
                    "snapshot at or after the rollback"
                )
            if rec["source"] in _NON_CHANGE_SOURCES:
                continue
            if rec["files_removed"] > 0:
                raise ValueError(
                    f"commit {s} is copy-on-write (rewrote files) — "
                    "streaming change reads require merge-on-read commits"
                )
            out.append(s)
        return out

    def change_files(
        self, since_seq: int, until_seq: int, shard: tuple[int, int] | None = None
    ):
        """[(path, cols_map_or_None, commit_seq)] for commits in
        (since, until] — the same selection and failure rules as
        ``IceliteTable.read_changes``.

        ``shard=(i, k)`` keeps only files whose bucket ≡ i (mod k) — pure
        manifest-metadata pruning, no data file is opened to be skipped.
        Every file belongs to exactly one shard, so k consumers with
        shards 0..k-1 partition the feed disjointly and completely."""
        out = []
        for s in self.change_commits(since_seq, until_seq):
            rec = self.lineage_record(s)
            names = self.added_manifests(s)
            if not names and rec["files_added"] > 0:
                raise ValueError(
                    f"changes for commit {s} have been expired — streaming "
                    "consumers must resume within the retention window"
                )
            for name in names:
                for e in self.manifest(name):
                    if shard is not None and e["bucket"] % shard[1] != shard[0]:
                        continue
                    out.append((e["path"], e.get("cols"), s))
        return out


@dataclass
class _FilePartition(InputPartition):
    path: str = ""
    cols: dict | None = None  # write-time id→name stamp (field-id evolution)
    commit_seq: int = 0
    # current schema as (name, field_id_or_None) in output order, plus the
    # Spark DDL so the worker can build the arrow target schema
    schema_json: str = ""
    field_ids: dict = field(default_factory=dict)
    legacy_cols: dict | None = None


@dataclass
class _WarmPartition(InputPartition):
    """Pool pre-fork partition (``option("warm", n)`` — no table): each
    partition imports the read path's modules (pyarrow, the arrow-schema
    bridge) inside a fresh Python worker and yields one row. Used by
    ``register_icelite_source(warm=...)`` to move the one-off
    interpreter spawn + import storm of the first data-source read
    (~4-6 s at 32 workers, measured) out of the first consumer's
    latency window and into session setup, where a long-lived pipeline
    pays it exactly once anyway."""

    idx: int = 0


@dataclass
class _OffsetsPartition(InputPartition):
    """Offsets-only data plane: one partition carries the whole batch's
    change-commit seqs — no data file is listed, opened, or decoded.
    Feed pipelines (`streaming/`) tail this to learn each micro-batch's
    commit range, then read the rows JVM-side via
    ``IceliteTable.read_changes`` (the 10-30x-faster bulk path); the
    full Python data plane remains for ad-hoc consumers."""

    seqs: list = field(default_factory=list)


def _read_partition_arrow(p: _FilePartition):
    """Executor-side: one parquet file → arrow batches in the CURRENT
    schema (+ _commit_seq). Field-id resolution mirrors the JVM reader:
    the file's write-time id→name stamp maps its physical columns to
    current names; columns the file predates become nulls."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    schema = T.StructType.fromJson(json.loads(p.schema_json))
    target = to_arrow_schema(schema)
    target = target.append(pa.field("_commit_seq", pa.int64()))
    cmap = p.cols or p.legacy_cols  # id→name at write time (None: current)
    # COLUMN-PRUNED read: resolve each declared field to its physical name
    # first (metadata-only), then decode exactly those columns — with a
    # projected stream (.option("columns", ...)) a wide change row never
    # leaves the parquet pages it isn't needed from
    pf = pq.ParquetFile(p.path)
    phys = set(pf.schema_arrow.names)
    src_of: dict[str, str | None] = {}
    for fld in schema.fields:
        if cmap and p.field_ids:
            src = cmap.get(str(p.field_ids.get(fld.name)))
        else:
            src = fld.name
        src_of[fld.name] = src if (src is not None and src in phys) else None
    wanted = sorted({s for s in src_of.values() if s is not None})
    if wanted:
        tbl = pq.read_table(p.path, columns=wanted)
        n = tbl.num_rows
    else:
        tbl, n = None, pf.metadata.num_rows
    arrays = []
    for fld in schema.fields:
        at = target.field(fld.name).type
        src = src_of[fld.name]
        if src is not None:
            arrays.append(tbl[src].cast(at))
        else:
            arrays.append(pa.nulls(n, type=at))
    arrays.append(pa.array([p.commit_seq] * n, type=pa.int64()))
    out = pa.table(arrays, schema=target)
    yield from out.to_batches(max_chunksize=1 << 16)


def _stream_schema(meta: _TableMeta) -> T.StructType:
    ptr = meta.pointer(meta.current_seq())
    schema = T.StructType.fromJson(ptr["schema"])
    return schema.add("_commit_seq", T.LongType(), True)


def _parse_shard(options) -> tuple[int, int] | None:
    """Parse .option("shard", "i/k") — consumer i of k, file-level bucket
    sharding (bucket % k == i). Balance is best when k divides the
    table's n_buckets; disjointness/completeness hold regardless. After a
    rebucket, a KEY may migrate shards (files keep their write-time
    bucket) — downstream consumers already order by __lsn, so per-key
    last-writer-wins is unaffected."""
    raw = options.get("shard")
    if raw is None:
        return None
    try:
        i, k = (int(x) for x in str(raw).split("/"))
    except ValueError:
        raise ValueError(f"shard must be 'i/k' (got {raw!r})") from None
    if k < 1 or not 0 <= i < k:
        raise ValueError(f"shard must satisfy 0 <= i < k (got {raw!r})")
    return (i, k)


def _partitions_for(
    meta: _TableMeta, start: int, end: int, decl: T.StructType,
    shard: tuple[int, int] | None = None,
) -> list[_FilePartition]:
    """Partitions carry the schema the STREAM DECLARED at start (minus
    _commit_seq), not the end pointer's — Spark requires every batch to
    match the analyzed schema, and a commit that evolves the table
    mid-stream must not change the stream's shape (columns added after
    start are simply not selected; a restart picks them up). Field-id
    stamps still come from the current pointer so old files resolve."""
    ptr = meta.pointer(end)
    data_fields = [f for f in decl.fields if f.name != "_commit_seq"]
    schema_json = json.dumps(T.StructType(data_fields).jsonValue())
    fids = dict(ptr.get("field_ids") or {})
    legacy = ptr.get("legacy_cols")
    # Fail fast when a declared data column no longer exists under its
    # declared NAME at the end pointer (renamed or dropped mid-stream, or
    # a batch read whose until pointer predates the name). Without this
    # guard, field_ids.get(name) is None and every file — old and new —
    # would silently null-backfill as if it predated the column, while
    # the JVM read_changes at the same seqs returns real data under the
    # new name. Null-backfill is reserved for files that genuinely
    # predate a column. Recovery: restart the stream from its checkpoint
    # so the schema is re-inferred from the current pointer.
    current_names = (
        set(fids)
        if fids
        else {f["name"] for f in ptr["schema"]["fields"]}
    )
    cur_seq = meta.current_seq()
    if cur_seq != end:
        # A recovered in-flight range (or bounded catch-up batch) can END
        # before the table's newest commits. A column the DECLARED schema
        # carries that was ADDED after `end` is legitimate there — every
        # file in the range genuinely predates it, so the per-file id
        # resolution must null-backfill, not fail. Merge the CURRENT
        # pointer's name→id map (end's mappings win on collision: ids are
        # stable across renames, and for a dropped-then-readded name the
        # in-range id is the right one) and its legacy id→write-time-name
        # stamps; only a name absent from BOTH pointers is a true
        # mid-stream rename/drop.
        now = meta.pointer(cur_seq)
        now_fids = now.get("field_ids") or {}
        for name, fid in now_fids.items():
            fids.setdefault(name, fid)
        now_legacy = now.get("legacy_cols")
        if now_legacy:
            merged = dict(now_legacy)
            merged.update(legacy or {})
            legacy = merged
        current_names |= (
            set(now_fids)
            if now_fids
            else {f["name"] for f in now["schema"]["fields"]}
        )
    for fld in data_fields:
        if fld.name not in current_names:
            raise ValueError(
                f"column '{fld.name}' in the declared schema does not exist "
                f"in the table at commit {end} (renamed or dropped "
                "mid-stream?) — restart the stream from its checkpoint to "
                "re-infer the current schema"
            )
    return [
        _FilePartition(
            path=path, cols=cols, commit_seq=seq, schema_json=schema_json,
            field_ids=fids, legacy_cols=legacy,
        )
        for path, cols, seq in meta.change_files(start, end, shard)
    ]


def _epoch(val: str) -> float:
    """Timestamp option value: epoch seconds, or an ISO date/datetime
    interpreted as UTC (the session convention)."""
    try:
        return float(val)
    except ValueError:
        import calendar as _cal
        import datetime as _dt

        d = _dt.datetime.fromisoformat(val)
        return _cal.timegm(d.utctimetuple()) + d.microsecond / 1e6


def _opt(options, *keys):
    for k in keys:
        v = options.get(k)
        if v is not None:
            return v
    return None


def _is_offsets_only(options) -> bool:
    v = _opt(options, "offsetsonly", "offsetsOnly")
    return v is not None and str(v).lower() == "true"


def _since_seq(options, meta: "_TableMeta") -> int:
    """Resolve the consumer's start: ``sinceSeq`` (a commit sequence) or
    ``sinceTimestamp`` (epoch seconds / ISO-UTC — the Kafka
    startingOffsetsByTimestamp analog, resolved through the snapshot
    commit clock: changes committed AFTER the latest snapshot at-or-
    before the timestamp). Mutually exclusive."""
    seq = _opt(options, "sinceseq", "sinceSeq")
    ts = _opt(options, "sincetimestamp", "sinceTimestamp")
    if seq is not None and ts is not None:
        raise ValueError("pass sinceSeq OR sinceTimestamp, not both")
    if ts is not None:
        return meta.seq_as_of(_epoch(ts))
    return int(seq) if seq is not None else 0


class _IceliteStreamReader(DataSourceStreamReader):
    """Streaming reader with bounded admission: ``maxCommitsPerBatch``
    clamps how many table commits one micro-batch may span — the B1/B2
    backpressure analog (reference: bounded enqueue + size-triggered
    flush, src/bucket/bucket.rs:93-100,198-206). Without it a consumer
    resuming after long downtime would get EVERY missed commit in a
    single micro-batch (thousands of one-file partitions, one giant
    downstream state commit).

    The Python Data Source API has no admission-control hook (latestOffset
    takes no start), so the clamp base is tracked driver-side: seeded from
    ``sinceSeq`` at construction (Spark calls latestOffset BEFORE
    initialOffset on a fresh start — observed on 4.1), then advanced by
    ``partitions``/``commit``. On a checkpoint restart the base is
    re-learned before the first latestOffset: MicroBatchExecution
    re-commits the last committed offset to the source on recovery
    (observed: first post-restart latestOffset already sees the
    checkpointed seq), and a WAL-recovered in-flight batch teaches it via
    ``partitions``. Result: every micro-batch, including the first after
    a restart, spans at most ``maxCommitsPerBatch`` commits."""

    def __init__(self, options, decl: T.StructType):
        path = options.get("path")
        if not path:
            raise ValueError("icelite source requires .option('path', <table>)")
        self.meta = _TableMeta(path)
        self.decl = decl
        self.start_seq = _since_seq(options, self.meta)
        mcb = options.get("maxcommitsperbatch", options.get("maxCommitsPerBatch"))
        self.max_commits = int(mcb) if mcb is not None else None
        self.shard = _parse_shard(options)
        self.offsets_only = _is_offsets_only(options)
        if self.max_commits is not None and self.max_commits < 1:
            raise ValueError("maxCommitsPerBatch must be >= 1")
        self._base: int | None = self.start_seq  # highest seq planned/committed

    def _learn_base(self, seq: int) -> None:
        self._base = seq if self._base is None else max(self._base, seq)

    def initialOffset(self) -> dict:
        self._base = self.start_seq
        return {"seq": self.start_seq}

    def latestOffset(self) -> dict:
        cur = self.meta.current_seq()
        if self.max_commits is None or self._base is None:
            return {"seq": cur}
        return {"seq": min(cur, self._base + self.max_commits)}

    def partitions(self, start: dict, end: dict):
        self._learn_base(int(end["seq"]))
        if self.offsets_only:
            seqs = self.meta.change_commits(int(start["seq"]), int(end["seq"]))
            return [_OffsetsPartition(seqs=seqs)]
        parts = _partitions_for(
            self.meta, int(start["seq"]), int(end["seq"]), self.decl, self.shard
        )
        # Spark requires at least the ability to plan an empty batch
        return parts or [_FilePartition(path="", commit_seq=-1)]

    def read(self, partition):
        if isinstance(partition, _OffsetsPartition):
            return iter([(s,) for s in partition.seqs])
        if partition.commit_seq < 0 or not partition.path:
            return iter(())  # planned-empty batch
        return _read_partition_arrow(partition)

    def commit(self, end: dict) -> None:
        # checkpoint offsets are the durable state; track the clamp base
        self._learn_base(int(end["seq"]))


class _WarmReader(DataSourceReader):
    def __init__(self, n: int):
        self.n = max(1, int(n))

    def partitions(self):
        return [_WarmPartition(idx=i) for i in range(self.n)]

    def read(self, partition):
        import pyarrow.parquet  # noqa: F401 — pre-import the data plane
        from pyspark.sql.pandas.types import to_arrow_schema  # noqa: F401

        yield (partition.idx,)


class _IceliteBatchReader(DataSourceReader):
    """Batch twin: ``spark.read.format("icelite")`` is the SAME change
    feed over a fixed range (options sinceSeq/untilSeq, defaults 0→
    current) — consistent semantics with the stream. Full live-state
    reads belong to the JVM-side ``IceliteTable.read()``."""

    def __init__(self, options, decl: T.StructType):
        path = options.get("path")
        if not path:
            raise ValueError("icelite source requires .option('path', <table>)")
        self.meta = _TableMeta(path)
        self.decl = decl
        self.since = _since_seq(options, self.meta)
        until = options.get("untilseq", options.get("untilSeq"))
        until_ts = _opt(options, "untiltimestamp", "untilTimestamp")
        if until is not None and until_ts is not None:
            raise ValueError("pass untilSeq OR untilTimestamp, not both")
        if until_ts is not None:
            self.until = self.meta.seq_as_of(_epoch(until_ts))
        else:
            self.until = (
                int(until) if until is not None else self.meta.current_seq()
            )
        self.shard = _parse_shard(options)
        self.offsets_only = _is_offsets_only(options)

    def partitions(self):
        if self.offsets_only:
            seqs = self.meta.change_commits(self.since, self.until)
            return [_OffsetsPartition(seqs=seqs)]
        parts = _partitions_for(
            self.meta, self.since, self.until, self.decl, self.shard
        )
        return parts or [_FilePartition(path="", commit_seq=-1)]

    def read(self, partition):
        if isinstance(partition, _OffsetsPartition):
            return iter([(s,) for s in partition.seqs])
        if partition.commit_seq < 0 or not partition.path:
            return iter(())
        return _read_partition_arrow(partition)


class IceliteDataSource(DataSource):
    """``format("icelite")`` — change-feed source over an Icelite table
    (batch and streaming reads) and exactly-once streaming SINK (see
    sources/icelite_sink.py for the write contract)."""

    @classmethod
    def name(cls) -> str:
        return "icelite"

    def schema(self):
        if self.options.get("warm") is not None:
            return T.StructType([T.StructField("x", T.LongType(), True)])
        if _is_offsets_only(self.options):
            # offsets-only feed: one LONG column, one row per change
            # commit in each batch's range — the control plane the JVM
            # fast-path feed pipelines tail (rows via read_changes)
            _TableMeta(self.options.get("path", ""))  # same fail-fast
            return T.StructType(
                [T.StructField("_commit_seq", T.LongType(), True)]
            )
        full = _stream_schema(_TableMeta(self.options.get("path", "")))
        cols = self.options.get("columns")
        if not cols:
            return full
        # COLUMN PROJECTION: .option("columns", "a,b") declares a subset
        # stream — partitions ship only these fields and the Arrow reader
        # decodes only their parquet columns (a rollup over two columns of
        # a wide transcript table reads two columns, not the texts).
        # _commit_seq always rides along. Same fail-fast rule as the full
        # stream when a projected column is later renamed/dropped.
        want = [c.strip() for c in str(cols).split(",") if c.strip()]
        by_name = {f.name: f for f in full.fields}
        missing = [c for c in want if c not in by_name]
        if missing:
            raise ValueError(
                f"columns option names {missing} not in the table schema "
                f"({sorted(n for n in by_name if n != '_commit_seq')})"
            )
        fields = [by_name[c] for c in want]
        if "_commit_seq" not in want:
            fields.append(by_name["_commit_seq"])
        return T.StructType(fields)

    def reader(self, schema) -> DataSourceReader:
        if self.options.get("warm") is not None:
            return _WarmReader(int(self.options["warm"]))
        return _IceliteBatchReader(self.options, schema)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _IceliteStreamReader(self.options, schema)

    def streamWriter(self, schema, overwrite: bool):
        from etl_rust_spark.sources.icelite_sink import IceliteStreamWriter

        return IceliteStreamWriter(self.options, schema, overwrite)


def register_icelite_source(spark, warm: bool | None = None) -> None:
    """Register ``format("icelite")`` on this session (idempotent) and
    pre-fork its Python worker pool once per session.

    The first Python-data-source read of a session pays a one-off
    interpreter spawn + concurrent import storm across the worker pool
    (measured ~4-6 s at local[32]) — latency a long-lived consumer
    amortizes but the FIRST micro-batch otherwise eats. Registration is
    the natural setup point, so a tiny tableless warm read (one row per
    core, importing the data-plane modules) runs here, guarded by a
    session tag so repeated registration stays cheap. Disable with
    ``warm=False`` or ``spark.conf.set("spark.icelite.warmOnRegister",
    "false")`` (e.g. short-lived metadata-only CLI invocations)."""
    spark.dataSource.register(IceliteDataSource)
    if warm is None:
        warm = (
            spark.conf.get("spark.icelite.warmOnRegister", "true").lower()
            == "true"
        )
    tag = "spark.icelite.__pool_warmed"
    if warm and spark.conf.get(tag, "") != "1":
        spark.conf.set(tag, "1")
        try:
            n = int(spark.sparkContext.defaultParallelism)
        except Exception:
            n = 8
        (
            spark.read.format("icelite")
            .option("warm", str(max(2, min(n, 64))))
            .load()
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
