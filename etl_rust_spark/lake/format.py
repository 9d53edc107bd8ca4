"""Icelite — a from-scratch lake-table format with Iceberg semantics.

No Iceberg/Delta jars ship in this environment, and the north rule demands
an exactly-once, schema-evolving, snapshot-isolated MERGE sink. Icelite
provides exactly that surface in pure PySpark + Parquet.

Metadata layout (v2 — split manifests, the Iceberg manifest-list shape;
v1 was one monolithic JSON that grew O(files + commits) per commit):

- ``_manifests/snap-<seq>.json`` — a SMALL pointer: schema + table config
  + the list of manifest files making up the snapshot + a bounded
  applied-batches tail. Committed via hard-link (``os.link``), so a
  concurrent writer deterministically fails with EEXIST instead of
  silently overwriting (POSIX ``rename`` clobbers).
- ``_manifests/manifest-<seq>.json`` — the file entries ADDED at commit
  <seq> (path, bucket, rows, kind). Immutable; unchanged manifests carry
  forward by reference, so per-commit metadata cost is O(files added),
  not O(table files). Compaction folds all manifests into one.
- ``_manifests/applied-*.json`` — immutable archive chunks of the
  exactly-once batch-key ledger. The pointer carries only the last
  ≤ ``_TAIL_MAX`` keys inline; a full tail flushes to a new chunk
  (O(_TAIL_MAX) write), and chunks merge when there are > ``_TAIL_MAX``
  of them (amortized O(total/_TAIL_MAX²) per commit) — the ledger never
  rides inside every snapshot again.
- ``_lineage/lineage-<seq>.json`` — one JSON record per commit: a real
  append-only lineage TABLE (``lineage()`` reads the directory as a
  DataFrame), not a list embedded in the manifest.
- ``_manifests/branch-<name>/snap-*.json`` (+ sibling
  ``_lineage/branch-<name>/``) — a NAMED BRANCH's own pointer chain
  (Iceberg branch refs): forked by hard-linking a main snapshot, extended
  by the same commit machinery (manifest/archive/data names stay in the
  shared namespace, collision-free via uuid tokens), published by
  ``fast_forward`` (per-commit pointer links). Every branch chain is a
  live GC root for ``remove_orphans``/``expire_snapshots``.

Table semantics (unchanged from v1):

- **Snapshots**: readers resolve the highest pointer; time travel is
  ``read(seq=k)``. Every referenced file set is complete and immutable
  (ACID read isolation).
- **Copy-on-write MERGE with bucket pruning**: data files are laid out by
  ``bucket = pmod(xxhash64(bucket_key), n_buckets)``; a merge rewrites
  only the touched buckets' files and filters their manifests, untouched
  manifests carry forward untouched.
- **Merge-on-read**: ``mode="mor"`` appends the batch winners as DELTA
  files — O(batch) write; readers dedup base ∪ deltas by max seq
  (Iceberg v2 semantics); ``compact()`` folds deltas back into base.
- **Exactly-once**: re-delivering a ``batch_key`` already in the ledger
  is a metadata-only no-op. (The reference has no such guarantee — a
  replayed batch aborts on PK violation,
  /root/reference/example/src/main.rs:489-493.)
- **Schema evolution**: the pointer stores the table schema; a merge
  whose batch carries new columns commits the union schema, and old
  files null-backfill through it.

Concurrency (round 3 — Iceberg-style optimistic retry): the hard-link
pointer race still decides the winner, but the loser now REBASES instead
of dying when its changes commute with the winner's:

- **append-only commits** (merge-on-read ingest — the streaming path)
  touch no existing manifest, so they rebase onto any winner: re-point
  the data dir at the next sequence, re-merge the schema, re-roll the
  ledger, link again.
- **rewrite commits** (compaction; copy-on-write merge) rebase iff every
  manifest they consumed is still present in the winner's snapshot —
  i.e. the winner only appended. A compaction racing the ingest writer
  (the realistic maintenance scenario) therefore succeeds; two writers
  rewriting the same buckets is a true conflict and raises.
- correctness of the interleaving relies on reader-side max-seq dedup
  (base ∪ delta), so rebase requires the table to carry a ``seq_col``;
  tables without one keep strict single-writer fail-fast semantics.

Every attempt uses collision-free names (uuid token in the commit data
dir, manifest, ledger-chunk, and lineage files), so two pre-link writers
can never overwrite each other's in-flight metadata; a rebasing loser
removes its superseded attempt's files (only a crash leaves orphans,
which stay unreferenced).
"""

from __future__ import annotations

import calendar
import datetime as _dt
import glob
import json
import os
import re
import time
import uuid
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

FORMAT_VERSION = 3  # v3: field-id column tracking (rename/drop evolution)
_MANIFEST_DIR = "_manifests"
_LINEAGE_DIR = "_lineage"
_DATA_DIR = "data"
_TAIL_MAX = 64  # applied-ledger keys kept inline in the pointer

LINEAGE_SCHEMA = (
    "commit_seq long, batch_key string, source string, n_changes long, "
    "n_upserts long, n_deletes long, lsn_min long, lsn_max long, "
    "touched_buckets array<int>, "
    "files_added int, files_removed int, rows_written long, "
    "per_bucket_rows map<string,long>, wall_ms double, committed_at string, "
    "rolled_back_to long, rolled_back_from long"
)


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the same sequence number first."""


class CheckViolationError(ValueError):
    """A table CHECK constraint rejected incoming (or existing) rows.

    Carries ``violations``: {check_name: row_count} for every failed
    check, so a pipeline's error handler can report per-rule counts
    without parsing the message."""

    def __init__(self, context: str, violations: dict):
        self.violations = dict(violations)
        detail = ", ".join(f"{n}: {c} rows" for n, c in sorted(violations.items()))
        super().__init__(
            f"CHECK constraint violation in {context} — {detail}. "
            "Fix the data upstream (or route expected bad rows through "
            "ChangelogIngest quarantine rules); drop_check() removes the "
            "constraint itself."
        )


def _enforce_checks(df, checks: dict, context: str) -> None:
    """Count violations of every CHECK over ``df`` in ONE aggregation
    pass and raise if any. SQL semantics: a NULL predicate result is a
    PASS (only rows where the expression IS FALSE violate), matching
    ANSI CHECK / Delta constraints."""
    aggs = []
    for name, expr in checks.items():
        try:
            cond = F.coalesce(F.expr(expr), F.lit(True))
        except Exception as e:  # unparsable expr (should not survive add_check)
            raise ValueError(f"CHECK {name!r} failed to parse: {expr!r} ({e})")
        aggs.append(F.sum(F.when(~cond, 1).otherwise(0)).alias(name))
    try:
        row = df.agg(*aggs).collect()[0]
    except CheckViolationError:
        raise
    except Exception as e:
        # a check referencing a column this schema no longer resolves —
        # fail loud with the actionable fix instead of a bare analyzer error
        raise ValueError(
            f"CHECK constraints could not be evaluated in {context} "
            f"({e}); if a checked column was renamed or dropped, "
            "drop_check() the stale constraint and re-add it"
        )
    bad = {n: int(row[n]) for n in checks if row[n]}
    if bad:
        raise CheckViolationError(context, bad)


def _bucket_expr(bucket_key: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(bucket_key)), F.lit(n_buckets)).cast("int")


def _local_bucket_of_values(uniq: list, dt, n_buckets: int) -> dict | None:
    """Driver-side ``pmod(xxhash64(v), n_buckets)`` for literal values of
    the bucket-key column — the same bit-exact XXH64 port the native sink
    buckets rows with (functions/xxh64.py; differential-tested against
    ``F.xxhash64`` in tests). Returns None when the column type or a
    value's Python type is outside the proven domain, so the caller runs
    the typed Spark job instead — never guesses."""
    try:
        import numpy as np

        from etl_rust_spark.functions.xxh64 import (
            xxh64_bytes,
            xxh64_ints,
            xxh64_longs,
        )

        if not uniq:
            return {}
        if isinstance(dt, T.StringType):
            if not all(isinstance(v, str) for v in uniq):
                return None
            h = np.fromiter(
                (xxh64_bytes(v.encode("utf-8")) for v in uniq),
                dtype=np.uint64,
                count=len(uniq),
            )
        elif isinstance(dt, T.LongType):
            if not all(
                isinstance(v, int)
                and not isinstance(v, bool)
                and -(2**63) <= v < 2**63
                for v in uniq
            ):
                return None
            h = xxh64_longs(np.array(uniq, dtype=np.int64))
        elif isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
            lim = {"integer": 31, "short": 15, "byte": 7}[dt.typeName()]
            if not all(
                isinstance(v, int)
                and not isinstance(v, bool)
                and -(2**lim) <= v < 2**lim
                for v in uniq
            ):
                return None
            h = xxh64_ints(np.array(uniq, dtype=np.int64))
        elif isinstance(dt, T.BooleanType):
            if not all(isinstance(v, bool) for v in uniq):
                return None
            h = xxh64_ints(np.array([int(v) for v in uniq], dtype=np.int64))
        else:
            return None
        b = (h.view(np.int64) % np.int64(n_buckets)).astype(np.int64)
        return {v: int(x) for v, x in zip(uniq, b)}
    except Exception:  # stay conservative: let the typed job decide
        return None


def _local_path(p: str) -> str:
    """input_file_name() URIs → plain filesystem paths."""
    if p.startswith("file:"):
        return unquote(urlparse(p).path)
    return p


# --------------------------------------------------------------------------
# per-file column stats (Iceberg-style data skipping)
# --------------------------------------------------------------------------

def _stat_supported(dt: T.DataType) -> bool:
    """Types with a JSON-storable, order-preserving min/max (the
    ``_stat_expr`` domain) — kept as a pure type predicate so metadata-
    only callers (the native sink's commit runner has no SparkSession)
    never construct a Column."""
    return isinstance(
        dt,
        (
            T.TimestampType,
            T.TimestampNTZType,
            T.DateType,
            T.IntegralType,
            T.FloatType,
            T.DoubleType,
            T.StringType,
            T.BooleanType,
        ),
    )


def _stat_expr(field: T.StructField):
    """JSON-storable, order-preserving min/max representation per type:
    timestamps → epoch micros (session is UTC-pinned, see session.py, so
    NTZ wall clocks normalize consistently), dates → epoch days, numerics
    and short strings raw. Returns None for unsupported types (no stats)."""
    if not _stat_supported(field.dataType):
        return None
    c = F.col(field.name)
    dt = field.dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(c.cast("timestamp"))
    if isinstance(dt, T.DateType):
        return F.unix_date(c)
    return c


def _footer_stats_entry(path: str, stat_names: tuple) -> dict:
    """One file's manifest entry fields, from its parquet footer only.

    Raw physical statistics land directly in the stored-stat domain of
    ``_stat_expr``: INT64 TIMESTAMP_MICROS → epoch micros, DATE (int32)
    → epoch days, numerics/bools pass through, UTF-8 byte arrays decode
    to str. Columns whose stats are absent, INT96 (legacy timestamps,
    parquet writes no stats), NaN-polluted floats, or non-UTF8 binaries
    record ``[None, None]`` — ``_file_may_match`` treats that as
    unprunable, never wrong. Runs on executors for large commits, so it
    must stay module-level and self-importing."""
    import math

    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    lo_all: dict = {}
    hi_all: dict = {}
    nulls_all: dict = {}
    bad: set = set()
    bad_nulls: set = set()
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        if rg.num_rows == 0:
            continue
        for i in range(rg.num_columns):
            c = rg.column(i)
            name = c.path_in_schema
            st = c.statistics
            # null counts: EVERY column (one small int each, no manifest
            # bloat), independent of min/max validity — an all-null
            # column has no min/max but an exact null count, and a
            # NaN-polluted float still counts its nulls exactly
            if name not in bad_nulls and st is not None and st.has_null_count:
                nulls_all[name] = nulls_all.get(name, 0) + int(st.null_count)
            else:
                bad_nulls.add(name)
                nulls_all.pop(name, None)
            if name not in stat_names or name in bad:
                continue
            if st is None or not st.has_min_max or c.physical_type == "INT96":
                bad.add(name)
                continue
            if c.physical_type == "BYTE_ARRAY":
                lo, hi = st.min, st.max  # logical view: str for UTF8
                if not isinstance(lo, str) or not isinstance(hi, str):
                    bad.add(name)
                    continue
            else:
                lo, hi = st.min_raw, st.max_raw
                if isinstance(lo, float) and (math.isnan(lo) or math.isnan(hi)):
                    bad.add(name)
                    continue
            if name in lo_all:
                lo_all[name] = min(lo_all[name], lo)
                hi_all[name] = max(hi_all[name], hi)
            else:
                lo_all[name], hi_all[name] = lo, hi
    return {
        "path": path,
        "rows": md.num_rows,
        "bytes": os.path.getsize(path),
        "stats": {
            n: [None, None] if n in bad or n not in lo_all else [lo_all[n], hi_all[n]]
            for n in stat_names
        },
        # exact per-column null counts (column absent = unknown) — the
        # metadata tier of count_live(col=...) / completeness profiling
        "nulls": {n: v for n, v in nulls_all.items()},
    }


def _norm_stat_value(v, dtype: T.DataType):
    """Normalize a user predicate value into the stored-stat domain."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        if isinstance(v, str):
            v = _dt.datetime.fromisoformat(v)
        if isinstance(v, _dt.datetime):
            return calendar.timegm(v.utctimetuple()) * 1_000_000 + v.microsecond
        return int(v)
    if isinstance(dtype, T.DateType):
        if isinstance(v, str):
            v = _dt.date.fromisoformat(v)
        if isinstance(v, _dt.date):
            return (v - _dt.date(1970, 1, 1)).days
        return int(v)
    return v


def _file_may_match(
    entry: dict, conds: list, schema_by_name: dict, bucket_key: str | None = None
) -> bool:
    """Conservative stats check: False only when a file's [min, max] range
    PROVABLY excludes every row satisfying the ANDed conditions. Missing
    stats, null stats (all-null column), or uncomparable types are never
    skippable (include the file) — the ADVICE-r02 read_keys null guard."""
    stats = entry.get("stats") or {}
    for col, op, val in conds:
        rng = stats.get(col)
        if rng is None:
            # legacy (pre-v3) manifests carried only the bucket key's range
            if col == bucket_key and "kmin" in entry:
                rng = [entry.get("kmin"), entry.get("kmax")]
            else:
                continue
        lo, hi = rng
        if lo is None or hi is None:
            continue
        dtype = schema_by_name.get(col)
        try:
            if op == "between":
                a, b = (_norm_stat_value(x, dtype) for x in val)
                if hi < a or lo > b:
                    return False
            elif op == "in":
                # skippable only when EVERY requested value misses the range
                vs = [_norm_stat_value(x, dtype) for x in val]
                if vs and all(v < lo or v > hi for v in vs):
                    return False
            else:
                v = _norm_stat_value(val, dtype)
                if (
                    (op == "=" and (v < lo or v > hi))
                    or (op == "<" and lo >= v)
                    or (op == "<=" and lo > v)
                    or (op == ">" and hi <= v)
                    or (op == ">=" and hi < v)
                ):
                    return False
        except TypeError:
            continue  # incomparable value vs stored stat: don't skip
    return True


_OPS = {
    "=": lambda c, v: c == F.lit(v),
    "<": lambda c, v: c < F.lit(v),
    "<=": lambda c, v: c <= F.lit(v),
    ">": lambda c, v: c > F.lit(v),
    ">=": lambda c, v: c >= F.lit(v),
    "between": lambda c, v: c.between(F.lit(v[0]), F.lit(v[1])),
    "in": lambda c, v: c.isin(list(v)),
}


def _where_groups(conds: list) -> list:
    """Normalize a ``where`` spec to DNF groups (the pyarrow ``filters``
    convention): a list of (col, op, val) tuples is ONE AND-group; a
    list of such lists is an OR of AND-groups. Returns list of groups."""
    if not conds:
        return []
    if all(
        isinstance(g, (list, tuple)) and len(g) > 0
        and isinstance(g[0], (list, tuple))
        for g in conds
    ):
        return [list(g) for g in conds]
    return [list(conds)]


def _where_filter(conds: list):
    """The EXACT Spark predicate for a `where` spec (stats pruning is a
    superset; this filter makes results exact). Accepts both the AND
    form and the DNF (list-of-lists) form."""
    out = None
    for group in _where_groups(conds):
        pred = None
        for col, op, val in group:
            if op not in _OPS:
                raise ValueError(
                    f"unsupported where op: {op!r} (use {sorted(_OPS)})"
                )
            p = _OPS[op](F.col(col), val)
            pred = p if pred is None else (pred & p)
        if pred is not None:
            out = pred if out is None else (out | pred)
    return out


# --------------------------------------------------------------------------
# field-id column tracking (Iceberg-style rename/drop schema evolution)
#
# Every column carries a stable integer field id (pointer ``field_ids``:
# current name → id). Data files keep their write-time column names; each
# manifest entry records the id→name map in force when the file was
# written (``cols``). Reads resolve file columns BY ID: a renamed column's
# old files feed the new name via alias, a dropped column is simply never
# selected, and a re-used name gets a FRESH id so stale data from before
# the drop can never resurface. Tables created before v3 synthesize ids on
# their first rename/drop; ``legacy_cols`` pins the original names for
# files written before synthesis (names never changed before that moment,
# so one pinned map covers them all).
# Ref (semantics only): Iceberg table spec, "Schemas and Data Types" —
# name mapping by field id. /root/reference has no schema-evolving store;
# this is engine capability beyond the reference (SURVEY §7).
# --------------------------------------------------------------------------


def _file_cols(entry: dict, legacy_cols: dict | None) -> dict | None:
    """The id→name map in force when this file was written (None: the
    table has never renamed/dropped, names are current)."""
    return entry.get("cols") or legacy_cols


def _file_all_match(entry: dict, conds: list, schema_by_name: dict) -> bool:
    """Containment proof (the dual of ``_file_may_match``): True only
    when a file's [min, max] stats PROVE every NON-NULL row satisfies
    ALL the ANDed conditions. Missing/null stats, string columns
    (parquet may truncate string bounds — safe for exclusion, unsafe as
    a containment witness), or uncomparable types are never provable."""
    stats = entry.get("stats") or {}
    for col, op, val in conds:
        dtype = schema_by_name.get(col)
        if isinstance(dtype, T.StringType):
            return False
        rng = stats.get(col)
        if rng is None:
            return False
        lo, hi = rng
        if lo is None or hi is None:
            return False
        try:
            if op == "between":
                a, b = (_norm_stat_value(x, dtype) for x in val)
                if lo < a or hi > b:
                    return False
            elif op == "in":
                vs = [_norm_stat_value(x, dtype) for x in val]
                if not (lo == hi and lo in vs):
                    return False
            else:
                v = _norm_stat_value(val, dtype)
                if (
                    (op == "=" and not (lo == hi == v))
                    or (op == "<" and not hi < v)
                    or (op == "<=" and not hi <= v)
                    or (op == ">" and not lo > v)
                    or (op == ">=" and not lo >= v)
                ):
                    return False
        except TypeError:
            return False
    return True


def _write_time_name(entry: dict, legacy_cols, col: str, col_id):
    """``col``'s name at the time this file was written (stats and the
    physical parquet columns are keyed by it), or None when the file
    predates the column entirely."""
    cmap = _file_cols(entry, legacy_cols)
    if cmap is None or col_id is None:
        return col
    return cmap.get(col_id)


def _group_conds(conds: list, cmap: dict | None, fids: dict | None, by_name: dict):
    """Rewrite pruning conditions to a file group's write-time column
    names. Returns (conds, by_name, absent): ``absent`` means some
    predicate column did not exist when the group's files were written —
    every value there is NULL, and NULL satisfies none of the supported
    ops (=/</<=/>/>=/between/in), so the whole group is provably skippable."""
    if cmap is None or fids is None:
        return conds, by_name, False
    out, names = [], {}
    for col, op, val in conds:
        fid = fids.get(col)
        w = cmap.get(str(fid)) if fid is not None else None
        if w is None:
            return [], {}, True
        out.append((w, op, val))
        names[w] = by_name.get(col)
    return out, names, False


class IceliteTable:
    def __init__(self, spark: SparkSession, path: str, branch: str | None = None):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._manifest_dir = os.path.join(self.path, _MANIFEST_DIR)
        self._main_lineage_dir = os.path.join(self.path, _LINEAGE_DIR)
        if not os.path.isdir(self._manifest_dir):
            raise FileNotFoundError(f"not an Icelite table: {path}")
        # Named branches (Iceberg refs): a branch is its own pointer chain
        # under _manifests/branch-<name>/ (and a sibling lineage dir),
        # forked by hard-linking a main snapshot. Data files, manifest
        # files and ledger archives stay in the SHARED namespace (all
        # branch commits flow through _commit_rebasing, whose uuid tokens
        # make names collision-free across chains), so forking is O(1)
        # and publishing is pointer hard-links — never a data copy.
        self.branch = branch
        if branch is None:
            self._snap_dir = self._manifest_dir
            self._lineage_dir = self._main_lineage_dir
        else:
            _check_branch_name(branch)
            self._snap_dir = os.path.join(self._manifest_dir, f"branch-{branch}")
            self._lineage_dir = os.path.join(
                self._main_lineage_dir, f"branch-{branch}"
            )
            if not os.path.isdir(self._snap_dir):
                raise FileNotFoundError(
                    f"no branch {branch!r} on {path} (create_branch first)"
                )
        # immutable-file caches (manifests and ledger archives never change
        # once written, so a long-lived writer resolves each exactly once)
        self._manifest_cache: dict[str, list] = {}
        self._archive_cache: dict[str, dict] = {}

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
        agg_cols: dict | None = None,
    ) -> "IceliteTable":
        """``agg_cols={"col": "sum"|"min"|"max"}`` declares an ADDITIVE
        table (SummingMergeTree semantics): merges append per-key partial
        rows in O(delta) and reads/compactions fold the partials with the
        declared combine fn per column (``_fold_agg``); all other payload
        columns stay last-writer-wins by ``seq_col``. Requires ``seq_col``
        and ``mode="mor"`` merges; deletes are not supported (accumulate-
        only, like the ClickHouse/Druid rollup engines). This is what
        makes a continuously-maintained downstream rollup O(delta) per
        micro-batch instead of read-modify-write — and exact under ANY
        micro-batch segmentation of the change feed."""
        path = os.path.abspath(path)
        mdir = os.path.join(path, _MANIFEST_DIR)
        if os.path.isdir(mdir):
            if if_not_exists:
                return cls(spark, path)
            raise FileExistsError(f"Icelite table already exists: {path}")
        if agg_cols:
            if seq_col is None:
                raise ValueError(
                    "agg_cols requires a seq_col (non-agg payload columns "
                    "resolve last-writer-wins by it)"
                )
            agg_cols = {str(c): str(fn) for c, fn in agg_cols.items()}
            by_name = {f.name: f.dataType for f in schema.fields}
            reserved = set(key_cols) | {bucket_key, seq_col} | set(
                order_cols or key_cols
            )
            for c, fn in agg_cols.items():
                if fn not in _AGG_FNS:
                    raise ValueError(
                        f"agg_cols[{c!r}]={fn!r}: supported fns are {_AGG_FNS}"
                    )
                if c not in by_name:
                    raise ValueError(f"agg_cols column {c!r} not in schema")
                if c in reserved:
                    raise ValueError(
                        f"agg_cols column {c!r} is a key/bucket/order/seq "
                        "column — identity columns cannot accumulate"
                    )
                if fn == "sum" and not isinstance(
                    by_name[c], (T.LongType, T.DoubleType, T.DecimalType)
                ):
                    raise ValueError(
                        f"agg_cols sum column {c!r} must be long, double or "
                        f"decimal (got {by_name[c].simpleString()}) — narrow "
                        "integer partial sums overflow silently"
                    )
        os.makedirs(mdir, exist_ok=True)
        os.makedirs(os.path.join(path, _LINEAGE_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)
        pointer = {
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
            "agg_cols": dict(agg_cols) if agg_cols else None,
            # stable per-column field ids (rename/drop evolution, v3)
            "field_ids": {f.name: i for i, f in enumerate(schema.fields)},
            "next_field_id": len(schema.fields),
            "manifests": [],        # [{name, buckets, n_files}]
            "applied_tail": {},     # batch_key -> commit seq (≤ _TAIL_MAX)
            "applied_archives": [],  # immutable chunk file names
            "applied_count": 0,
            "committed_at_epoch": time.time(),
        }
        _commit_pointer(mdir, 0, pointer)
        return cls(spark, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IceliteTable":
        return cls(spark, path)

    # ------------------------------------------------------------- snapshots
    def _pointer_path(self, seq: int) -> str:
        return os.path.join(self._snap_dir, f"snap-{seq:08d}.json")

    def current_seq(self) -> int:
        snaps = glob.glob(os.path.join(self._snap_dir, "snap-*.json"))
        if not snaps:
            raise FileNotFoundError(f"no snapshots in {self._snap_dir}")
        return max(int(os.path.basename(p)[5:13]) for p in snaps)

    def pointer(self, seq: int | None = None) -> dict:
        """The raw (small) snapshot pointer — O(manifest count), never
        materializes file lists or the ledger. On a branch handle, seqs
        BEFORE the fork resolve against main's chain (shared history)."""
        seq = self.current_seq() if seq is None else seq
        try:
            with open(self._pointer_path(seq)) as f:
                return json.load(f)
        except FileNotFoundError:
            if self.branch is not None:
                with open(
                    os.path.join(self._manifest_dir, f"snap-{seq:08d}.json")
                ) as f:
                    return json.load(f)
            raise

    def _read_manifest(self, name: str) -> list:
        if name not in self._manifest_cache:
            with open(os.path.join(self._manifest_dir, name)) as f:
                self._manifest_cache[name] = json.load(f)
        return self._manifest_cache[name]

    def _read_archive(self, name: str) -> dict:
        if name not in self._archive_cache:
            with open(os.path.join(self._manifest_dir, name)) as f:
                self._archive_cache[name] = json.load(f)
        return self._archive_cache[name]

    def _files(self, pointer: dict) -> list:
        out: list = []
        for m in pointer["manifests"]:
            out.extend(self._read_manifest(m["name"]))
        return out

    def snapshot(self, seq: int | None = None) -> dict:
        """Resolved snapshot view: pointer fields + materialized ``files``
        and ``applied_batches`` (compatibility surface; hot paths use
        ``pointer()``/``is_applied()`` and never materialize these)."""
        ptr = self.pointer(seq)
        snap = dict(ptr)
        snap["files"] = self._files(ptr)
        snap["applied_batches"] = self._applied(ptr)
        return snap

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.pointer()["schema"])

    def describe(self) -> dict:
        """Table health report from METADATA only (no data read): file/
        row/byte totals, file-size distribution, per-bucket balance,
        delta backlog, snapshot and ledger counts — the numbers a
        compaction/rebucket/expiry decision needs. O(files) driver-side;
        file bytes come from the manifests (recorded at commit from the
        footer pass; pre-r4 manifests fall back to a stat() call).
        ``n_file_rows`` counts physical rows (pre max-seq dedup under
        merge-on-read)."""
        ptr = self.pointer()
        files = self._files(ptr)
        sizes = [
            f.get("bytes")
            or (os.path.getsize(f["path"]) if os.path.exists(f["path"]) else 0)
            for f in files
        ]
        per_bucket: dict = {}
        n_delta = 0
        for f in files:
            per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
            if f.get("kind", "base") == "delta":
                n_delta += 1
        snaps = len(glob.glob(os.path.join(self._manifest_dir, "snap-*.json")))
        return {
            "seq": ptr["seq"],
            "n_files": len(files),
            "n_delta_files": n_delta,
            "n_file_rows": sum(f["rows"] for f in files),
            "total_bytes": sum(sizes),
            "max_file_bytes": max(sizes, default=0),
            "avg_file_bytes": int(sum(sizes) / len(sizes)) if sizes else 0,
            "n_buckets": ptr["n_buckets"],
            "buckets_with_files": len(per_bucket),
            "max_files_per_bucket": max(per_bucket.values(), default=0),
            "n_snapshots": snaps,
            "applied_batches": ptr.get("applied_count", 0),
            "n_manifests": len(ptr["manifests"]),
            "agg_cols": ptr.get("agg_cols"),
            "checks": ptr.get("checks") or {},
            # smallest since_seq a change-feed consumer can resume from
            "earliest_changes_seq": self.earliest_changes_seq(),
            # exact live rows when metadata alone proves it (delta-free,
            # tombstone-free-proven snapshot); None = needs count_live()
            "live_rows_exact": self.count_live(allow_scan=False),
        }

    def count_live(
        self,
        col: str | None = None,
        seq: int | None = None,
        as_of=None,
        tag: str | None = None,
        detail: bool = False,
        allow_scan: bool = True,
    ):
        """Exact LIVE-row count — the ``SELECT count(*)`` fast path;
        with ``col``, the ``SELECT count(col)`` (non-null) twin.

        Iceberg answers counts from manifest row counts without touching
        data (public semantics; the reference pays a full collection scan
        for the same number, src/etl/processor.rs:99). Adapted to
        merge-on-read, three tiers — every tier exact, cheapest proof
        wins per file:

        - **metadata** — base files in delta-free buckets whose per-file
          ``__deleted`` stats prove zero tombstones (``max=false``), or
          any file when the snapshot schema has no ``__deleted`` column
          at all: count = the manifest's ``rows``, no file opened. The
          steady post-compaction state (tombstones folded by retention)
          lands here entirely — O(manifests) driver-side, ZERO Spark
          jobs, at 100 TB the difference between instant and an
          O(table) scan.
        - **tombstone scan** — base files that MAY hold tombstones
          (``max=true``, or pre-stat manifests with no ``__deleted``
          entry): a schema-projected scan of ONLY the boolean column
          (RLE-encoded pages, ~KB per file regardless of row width)
          subtracts them. Files physically missing the column project
          NULL → live.
        - **dedup scan** — buckets holding delta files need max-seq
          version resolution; they route through ``read(buckets=...)``
          (which also folds additive tables), filtered live.

        ``col`` counts non-null live values (the completeness probe):
        the metadata tier additionally needs the column's exact footer
        null count (harvested per write-time name since r5g; older
        manifests route to the scan tier), and the scan tier becomes a
        field-id-resolved projection of ``col`` + ``__deleted``. Files
        predating the column contribute zero from metadata.

        Time-travel via ``seq``/``as_of``/``tag`` exactly like ``read``.
        ``detail=True`` returns the tier breakdown instead of the bare
        int. ``allow_scan=False`` returns None instead of paying any
        scan tier (``describe()`` uses it to stay metadata-only).
        Predicate counts go through ``count_where``."""
        if sum(x is not None for x in (seq, as_of, tag)) > 1:
            raise ValueError("pass at most one of seq / as_of / tag")
        if as_of is not None:
            seq = self.seq_as_of(as_of)
        if tag is not None:
            found = self.tags().get(tag)
            if found is None:
                raise FileNotFoundError(f"no tag {tag!r}")
            seq = found
        ptr = self.pointer(seq)
        pinned = ptr["seq"]  # one snapshot for all three tiers
        files = self._files(ptr)
        schema = T.StructType.fromJson(ptr["schema"])
        has_del_col = any(f.name == "__deleted" for f in schema.fields)
        fld = None
        if col is not None:
            fld = next((f for f in schema.fields if f.name == col), None)
            if fld is None:
                raise ValueError(f"no column {col!r} in the table schema")
        fids = ptr.get("field_ids")
        legacy = ptr.get("legacy_cols")
        col_id = str(fids.get(col)) if (fids and col is not None) else None
        delta_buckets = {
            f["bucket"] for f in files if f.get("kind", "base") == "delta"
        }
        meta_rows, n_meta = 0, 0
        tomb_files: list = []
        for f in files:
            if f["bucket"] in delta_buckets:
                continue
            st = (f.get("stats") or {}).get("__deleted")
            tomb_free = not has_del_col or (st is not None and st[1] is False)
            if col is None:
                if tomb_free:
                    meta_rows += int(f["rows"])
                    n_meta += 1
                else:
                    tomb_files.append(f)
                continue
            # count(col): non-null live values — needs the tombstone
            # proof (tombstones are physical rows) AND an exact footer
            # null count for the column's WRITE-TIME name
            w = _write_time_name(f, legacy, col, col_id)
            if w is None:  # file predates the column: all-null for it
                n_meta += 1
                continue
            nn = (f.get("nulls") or {}).get(w)
            if tomb_free and nn is not None:
                meta_rows += int(f["rows"]) - int(nn)
                n_meta += 1
            else:
                tomb_files.append(f)
        if not allow_scan and (tomb_files or delta_buckets):
            return None  # metadata alone cannot prove this snapshot
        scanned_live = 0
        if tomb_files:
            if self.spark is None:
                raise ValueError(
                    "count_live needs a SparkSession when tombstone/delta "
                    "scans are required (metadata alone cannot prove the "
                    "count for this snapshot)"
                )
            if col is None:
                proj = T.StructType(
                    [T.StructField("__deleted", T.BooleanType(), True)]
                )
                df = self.spark.read.schema(proj).parquet(
                    *[f["path"] for f in tomb_files]
                )
            else:
                # field-id-resolved narrow scan (renamed columns read
                # their real values; see min_max)
                proj = [T.StructField(col, fld.dataType, True)]
                if has_del_col:
                    proj.append(
                        T.StructField("__deleted", T.BooleanType(), True)
                    )
                df = self._read_file_groups(tomb_files, T.StructType(proj), ptr)
            if has_del_col and "__deleted" in df.columns:
                df = df.filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
            scanned_live = int(
                df.count() if col is None else df.agg(F.count(col)).first()[0]
            )
        dedup_live = 0
        if delta_buckets:
            if self.spark is None:
                raise ValueError(
                    "count_live needs a SparkSession when tombstone/delta "
                    "scans are required (metadata alone cannot prove the "
                    "count for this snapshot)"
                )
            df = self.read(seq=pinned, buckets=delta_buckets)
            if "__deleted" in df.columns:
                df = df.filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
            dedup_live = int(
                df.count() if col is None else df.agg(F.count(col)).first()[0]
            )
        total = meta_rows + scanned_live + dedup_live
        if not detail:
            return total
        return {
            "count": total,
            "column": col,
            "seq": pinned,
            "metadata_files": n_meta,
            "metadata_rows": meta_rows,
            "tombstone_scan_files": len(tomb_files),
            "tombstone_scan_live": scanned_live,
            "dedup_scan_buckets": len(delta_buckets),
            "dedup_scan_live": dedup_live,
        }

    def count_where(
        self,
        where: list,
        seq: int | None = None,
        as_of=None,
        tag: str | None = None,
        detail: bool = False,
    ):
        """Exact count of LIVE rows matching ``where`` (one AND group of
        ``(col, op, value)`` conditions, the ``read(where=...)`` ops) —
        Iceberg's planFiles+residual move turned into a count: every
        file pays the cheapest sufficient proof.

        Per file in a delta-free bucket:

        - **excluded** — stats (plus hash-bucket pruning for =/IN on the
          bucket key) prove no row matches: contributes 0, never opened.
        - **contained** — the file is tombstone-free AND its stats prove
          every non-null row matches ALL conditions
          (``_file_all_match``; strings never prove containment): count
          from metadata. NULLs satisfy no condition, so a single-column
          predicate counts ``rows − nulls[col]``; multi-column
          predicates count ``rows`` only when every predicate column
          has a recorded null count of zero (per-column null counts
          cannot bound the union of null rows otherwise).
        - **residual** — a field-id-resolved projection of just the
          predicate columns (+ ``__deleted``), filtered live ∧ where.

        Buckets holding delta files route through
        ``read(where=...)``'s max-seq resolution. On a time- or
        z-clustered table (``order_cols``/``zorder``), range counts land
        almost entirely in the excluded/contained tiers — O(manifests)
        instead of O(table)."""
        if not where or not isinstance(where[0], tuple):
            raise ValueError(
                "count_where takes one AND group: [(col, op, value), ...]"
            )
        if sum(x is not None for x in (seq, as_of, tag)) > 1:
            raise ValueError("pass at most one of seq / as_of / tag")
        if as_of is not None:
            seq = self.seq_as_of(as_of)
        if tag is not None:
            found = self.tags().get(tag)
            if found is None:
                raise FileNotFoundError(f"no tag {tag!r}")
            seq = found
        ptr = self.pointer(seq)
        pinned = ptr["seq"]
        schema = T.StructType.fromJson(ptr["schema"])
        by_name = {f.name: f.dataType for f in schema.fields}
        for c, _, _ in where:
            if c not in by_name:
                raise ValueError(f"no column {c!r} in the table schema")
        has_del_col = "__deleted" in by_name
        fids = ptr.get("field_ids")
        legacy = ptr.get("legacy_cols")
        files = self._files(ptr)
        delta_buckets = {
            f["bucket"] for f in files if f.get("kind", "base") == "delta"
        }
        # hash-bucket pruning for =/IN on the bucket key (exclusion only)
        bk = ptr["bucket_key"]
        eq_vals = [
            v
            for col, op, val in where
            if col == bk and op in ("=", "in")
            for v in ([val] if op == "=" else list(val))
        ]
        val2b = (
            self._bucket_of_values(eq_vals, ptr, by_name) if eq_vals else {}
        )
        allowed = self._group_bucket_set(where, bk, val2b)

        contained_rows, n_contained, n_excluded = 0, 0, 0
        scan_files: list = []
        cache: dict = {}
        single_col = where[0][0] if len(where) == 1 else None
        for f in files:
            if f["bucket"] in delta_buckets:
                continue
            if allowed is not None and f["bucket"] not in allowed:
                n_excluded += 1
                continue
            cmap = _file_cols(f, legacy)
            key = tuple(sorted(cmap.items())) if (cmap and fids) else None
            if key not in cache:
                g_conds, g_names, absent = _group_conds(
                    where, dict(key) if key else None, fids, by_name
                )
                gbk = bk
                if key is not None:
                    gbk = dict(key).get(str(fids.get(bk))) or bk
                cache[key] = (g_conds, g_names, absent, gbk)
            g_conds, g_names, absent, gbk = cache[key]
            if absent:  # file predates a predicate column: all-NULL there
                n_excluded += 1
                continue
            if not _file_may_match(f, g_conds, g_names, gbk):
                n_excluded += 1
                continue
            dstat = (f.get("stats") or {}).get("__deleted")
            tomb_free = not has_del_col or (
                dstat is not None and dstat[1] is False
            )
            if tomb_free and _file_all_match(f, g_conds, g_names):
                nulls = f.get("nulls") or {}
                if single_col is not None:
                    w = g_conds[0][0]
                    nn = nulls.get(w)
                    if nn is not None:
                        contained_rows += int(f["rows"]) - int(nn)
                        n_contained += 1
                        continue
                elif all(nulls.get(w) == 0 for w, _, _ in g_conds):
                    contained_rows += int(f["rows"])
                    n_contained += 1
                    continue
            scan_files.append(f)

        pred = _where_filter(where)
        scanned = 0
        if scan_files:
            if self.spark is None:
                raise ValueError(
                    "count_where needs a SparkSession when residual scans "
                    "are required"
                )
            proj = [
                T.StructField(c, by_name[c], True)
                for c in dict.fromkeys(c for c, _, _ in where)
            ]
            if has_del_col:
                proj.append(T.StructField("__deleted", T.BooleanType(), True))
            df = self._read_file_groups(scan_files, T.StructType(proj), ptr)
            if has_del_col:
                df = df.filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
            scanned = int(df.filter(pred).count())
        dedup = 0
        if delta_buckets:
            if self.spark is None:
                raise ValueError(
                    "count_where needs a SparkSession when residual scans "
                    "are required"
                )
            df = self.read(seq=pinned, buckets=delta_buckets, where=where)
            if "__deleted" in df.columns:
                df = df.filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
            dedup = int(df.count())
        total = contained_rows + scanned + dedup
        if not detail:
            return total
        return {
            "count": total,
            "seq": pinned,
            "excluded_files": n_excluded,
            "contained_files": n_contained,
            "contained_rows": contained_rows,
            "residual_scan_files": len(scan_files),
            "residual_scan_rows": scanned,
            "dedup_scan_buckets": len(delta_buckets),
            "dedup_scan_rows": dedup,
        }

    def min_max(
        self,
        col: str,
        seq: int | None = None,
        as_of=None,
        tag: str | None = None,
        detail: bool = False,
    ):
        """Exact live-row ``(min, max)`` of a column — the watermark
        query (``SELECT min(ts), max(ts)``), metadata-first like
        ``count_live`` and exact by the same tier discipline:

        - **metadata** — base files in delta-free buckets, PROVEN
          tombstone-free (``__deleted`` stats ``max=false``, or no
          ``__deleted`` in the snapshot schema), with recorded non-null
          stats for ``col``: the manifest [min, max] IS the file's
          live range (delta-free ⇒ one live version per key; parquet
          stats skip nulls). Strings never use this tier — parquet
          writers may TRUNCATE string min/max (lower/raise the bound:
          conservative for pruning, wrong as an exact answer).
        - **scan** — files with tombstones, absent/NaN-wide stats, or a
          string column: a projection of only ``col`` (+ ``__deleted``
          where stored), filtered live.
        - **dedup scan** — buckets holding delta files route through
          ``read(buckets=...)``, filtered live.

        Stored stats live in the footer's raw domain (timestamps =
        epoch micros, dates = epoch days); results convert back to
        Python values matching a collected Spark aggregate. Returns
        ``(None, None)`` for an empty/all-null column."""
        if sum(x is not None for x in (seq, as_of, tag)) > 1:
            raise ValueError("pass at most one of seq / as_of / tag")
        if as_of is not None:
            seq = self.seq_as_of(as_of)
        if tag is not None:
            found = self.tags().get(tag)
            if found is None:
                raise FileNotFoundError(f"no tag {tag!r}")
            seq = found
        ptr = self.pointer(seq)
        pinned = ptr["seq"]
        schema = T.StructType.fromJson(ptr["schema"])
        fld = next((f for f in schema.fields if f.name == col), None)
        if fld is None:
            raise ValueError(f"no column {col!r} in the table schema")
        has_del_col = any(f.name == "__deleted" for f in schema.fields)
        stat_ok = _stat_supported(fld.dataType) and not isinstance(
            fld.dataType, T.StringType
        )

        def _from_stored(v):
            if isinstance(fld.dataType, (T.TimestampType, T.TimestampNTZType)):
                return _dt.datetime(1970, 1, 1) + _dt.timedelta(
                    microseconds=int(v)
                )
            if isinstance(fld.dataType, T.DateType):
                return _dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))
            return v

        files = self._files(ptr)
        delta_buckets = {
            f["bucket"] for f in files if f.get("kind", "base") == "delta"
        }
        # stats are keyed by WRITE-TIME column names — resolve the
        # requested column's name per file through the field-id map, or
        # a renamed column's pre-rename files would silently fall out of
        # the metadata tier AND null out in a raw projection scan
        fids = ptr.get("field_ids")
        legacy = ptr.get("legacy_cols")
        col_id = str(fids.get(col)) if fids else None
        lo = hi = None
        n_meta = 0
        scan_files: list = []
        for f in files:
            if f["bucket"] in delta_buckets:
                continue
            dstat = (f.get("stats") or {}).get("__deleted")
            tomb_free = not has_del_col or (
                dstat is not None and dstat[1] is False
            )
            w = _write_time_name(f, legacy, col, col_id)
            if w is None:
                # file predates the column entirely: every row is NULL
                # for it — nothing to fold, regardless of tombstones
                n_meta += 1
                continue
            cstat = (f.get("stats") or {}).get(w) if stat_ok else None
            if tomb_free and cstat is not None and cstat[0] is not None:
                a, b = _from_stored(cstat[0]), _from_stored(cstat[1])
                lo = a if lo is None or a < lo else lo
                hi = b if hi is None or b > hi else hi
                n_meta += 1
            else:
                scan_files.append(f)

        def _fold(vals):
            nonlocal lo, hi
            a, b = vals
            if a is not None:
                lo = a if lo is None or a < lo else lo
            if b is not None:
                hi = b if hi is None or b > hi else hi

        n_scanned = len(scan_files)
        if scan_files:
            if self.spark is None:
                raise ValueError(
                    "min_max needs a SparkSession when scans are required"
                )
            # narrow field-id-resolved scan: _read_file_groups aliases
            # each file's write-time names to current ones, so renamed
            # columns read their real values (a raw projection by the
            # current name would silently null pre-rename files)
            proj = [T.StructField(col, fld.dataType, True)]
            if has_del_col:
                proj.append(T.StructField("__deleted", T.BooleanType(), True))
            df = self._read_file_groups(scan_files, T.StructType(proj), ptr)
            if has_del_col:
                df = df.filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
            row = df.agg(F.min(col).alias("a"), F.max(col).alias("b")).first()
            _fold((row["a"], row["b"]))
        if delta_buckets:
            if self.spark is None:
                raise ValueError(
                    "min_max needs a SparkSession when scans are required"
                )
            df = self.read(seq=pinned, buckets=delta_buckets)
            if "__deleted" in df.columns:
                df = df.filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
            row = df.agg(F.min(col).alias("a"), F.max(col).alias("b")).first()
            _fold((row["a"], row["b"]))
        if not detail:
            return (lo, hi)
        return {
            "min": lo,
            "max": hi,
            "seq": pinned,
            "metadata_files": n_meta,
            "scan_files": n_scanned,
            "dedup_scan_buckets": len(delta_buckets),
        }

    def fsck(self, deep: bool = False) -> dict:
        """Lake integrity check (read-only fsck) — metadata ↔ filesystem
        consistency for every RETAINED snapshot, main and branches: the
        verify step of the backup/restore story (clone → restore →
        fsck) and the what-did-that-crash-leave diagnostic.

        Checks: every snapshot pointer parses and carries the v1 keys;
        every manifest and ledger-archive chunk a retained pointer
        references exists and parses; every data file any retained
        snapshot references exists with its recorded byte size (size
        drift = truncation/corruption); the CURRENT snapshot has no
        duplicate live paths and no bucket id outside [0, n_buckets);
        every retained commit has its lineage record (warning — expiry
        can outlive pre-v3 lineage). ``deep=True`` additionally opens
        every CURRENT-snapshot parquet footer and compares physical row
        counts against the manifest (catches silent corruption that
        preserved the size). Metadata checks are O(retained metadata);
        deep is O(current files) footer reads, driver-side like the
        rest of the metadata layer (it is a diagnostic, not a hot
        path). Returns {ok, errors, warnings, checked} and never
        raises on findings."""
        errors: list[str] = []
        warnings: list[str] = []
        checked = {"snapshots": 0, "manifests": 0, "files": 0,
                   "archives": 0, "footers": 0}
        snap_paths = sorted(
            glob.glob(os.path.join(self._manifest_dir, "snap-*.json"))
        ) + sorted(
            glob.glob(
                os.path.join(self._manifest_dir, "branch-*", "snap-*.json")
            )
        )
        seen_meta: set[str] = set()
        seen_files: dict[str, tuple] = {}
        for sp in snap_paths:
            label = os.path.relpath(sp, self._manifest_dir)
            try:
                with open(sp) as f:
                    ptr = json.load(f)
            except (OSError, ValueError) as e:
                errors.append(f"{label}: unreadable pointer ({e})")
                continue
            checked["snapshots"] += 1
            missing = [
                k for k in ("seq", "schema", "key_cols", "bucket_key",
                            "n_buckets", "manifests", "applied_tail",
                            "applied_archives")
                if k not in ptr
            ]
            if missing:
                errors.append(f"{label}: pointer missing keys {missing}")
                continue
            for name in ptr["applied_archives"]:
                if name in seen_meta:
                    continue
                seen_meta.add(name)
                ap = os.path.join(self._manifest_dir, name)
                try:
                    with open(ap) as f:
                        json.load(f)
                    checked["archives"] += 1
                except (OSError, ValueError) as e:
                    errors.append(
                        f"{label}: ledger archive {name} unreadable ({e})"
                    )
            for m in ptr["manifests"]:
                name = m["name"]
                first_ref = name not in seen_meta
                seen_meta.add(name)
                try:
                    entries = self._read_manifest(name)
                except (OSError, ValueError) as e:
                    if first_ref:  # report each broken manifest once
                        errors.append(
                            f"{label}: manifest {name} unreadable ({e})"
                        )
                    continue
                if first_ref:
                    checked["manifests"] += 1
                for e in entries:
                    key = e["path"]
                    if key in seen_files:
                        continue
                    seen_files[key] = (label, e)
                    if not os.path.exists(key):
                        errors.append(f"{label}: data file missing {key}")
                        continue
                    checked["files"] += 1
                    want = e.get("bytes")
                    got = os.path.getsize(key)
                    if want is not None and got != want:
                        errors.append(
                            f"{label}: size drift {key}: manifest {want} "
                            f"bytes, filesystem {got}"
                        )
        # CURRENT snapshot structural checks (+ per-commit lineage);
        # a broken current manifest was already reported above — degrade
        # to the metadata findings instead of raising out of a checker
        try:
            cur = self.pointer()
            live, paths = self._files(cur), set()
            for e in live:
                if e["path"] in paths:
                    errors.append(f"current: duplicate live path {e['path']}")
                paths.add(e["path"])
                if not (0 <= e["bucket"] < cur["n_buckets"]):
                    errors.append(
                        f"current: bucket {e['bucket']} out of range "
                        f"for n_buckets={cur['n_buckets']} ({e['path']})"
                    )
            # declared-layout ↔ schema consistency: corruption the file
            # checks can't see (a hand-edited/restored pointer whose
            # layout or constraints reference columns the schema no
            # longer carries would fail at the NEXT write — surface it
            # at fsck time instead)
            names = [f["name"] for f in cur["schema"]["fields"]]
            nameset = set(names)
            for role, cols in (
                ("key_cols", cur["key_cols"]),
                ("order_cols", cur.get("order_cols") or []),
                ("zorder", cur.get("zorder") or []),
                ("bucket_key", [cur["bucket_key"]]),
                ("seq_col", [cur["seq_col"]] if cur.get("seq_col") else []),
                ("agg_cols", list(cur.get("agg_cols") or {})),
            ):
                for c in cols:
                    if c not in nameset:
                        errors.append(
                            f"current: {role} references missing "
                            f"column {c!r}"
                        )
            if cur["bucket_key"] not in cur["key_cols"]:
                errors.append(
                    f"current: bucket_key {cur['bucket_key']!r} is not "
                    "a key column"
                )
            for c, fn in (cur.get("agg_cols") or {}).items():
                if fn not in _AGG_FNS:
                    errors.append(
                        f"current: agg_cols[{c!r}] has unknown fold "
                        f"fn {fn!r}"
                    )
                if c in cur["key_cols"]:
                    errors.append(
                        f"current: agg_cols column {c!r} is a key column"
                    )
            fids = cur.get("field_ids")
            if fids is not None:
                if sorted(fids) != sorted(names):
                    errors.append(
                        "current: field_ids keys != schema columns "
                        f"(only in field_ids: {sorted(set(fids) - nameset)}, "
                        f"only in schema: {sorted(nameset - set(fids))})"
                    )
                if len(set(fids.values())) != len(fids):
                    errors.append("current: duplicate field ids")
                nxt = cur.get("next_field_id")
                if fids and (nxt is None or nxt <= max(fids.values())):
                    errors.append(
                        f"current: next_field_id {nxt} not past the "
                        f"max assigned id {max(fids.values())} — the "
                        "next added column would collide"
                    )
            if self.spark is not None:
                schema_t = T.StructType.fromJson(cur["schema"])
                empty = self.spark.createDataFrame([], schema_t)
                for cname, cexpr in (cur.get("checks") or {}).items():
                    try:
                        empty.filter(F.expr(cexpr)).count()
                    except Exception:
                        errors.append(
                            f"current: CHECK {cname!r} ({cexpr!r}) does "
                            "not resolve against the schema"
                        )
            for s in range(1, cur["seq"] + 1):
                if not os.path.exists(self._pointer_path(s)):
                    continue  # expired snapshot: no lineage expected
                if self._lineage_record(s) is None:
                    warnings.append(f"lineage record missing for commit {s}")
            if deep:
                try:
                    import pyarrow.parquet as pq
                except ImportError:  # diagnostic only: degrade, don't fail
                    warnings.append("deep skipped: pyarrow unavailable")
                else:
                    for e in live:
                        if not os.path.exists(e["path"]):
                            continue  # already reported above
                        try:
                            got_rows = pq.ParquetFile(
                                e["path"]
                            ).metadata.num_rows
                        except Exception as ex:
                            errors.append(
                                f"deep: unreadable parquet {e['path']} ({ex})"
                            )
                            continue
                        checked["footers"] += 1
                        if got_rows != e["rows"]:
                            errors.append(
                                f"deep: row drift {e['path']}: manifest "
                                f"{e['rows']} rows, footer {got_rows}"
                            )
        except FileNotFoundError as e:
            errors.append(f"current pointer unresolvable: {e}")
        except (OSError, ValueError) as e:
            errors.append(f"current snapshot unresolvable: {e}")
        return {
            "ok": not errors,
            "errors": errors,
            "warnings": warnings,
            "checked": checked,
        }

    # ------------------------------------------------- field-id resolution
    @staticmethod
    def _assigned_field_ids(ptr: dict, schema: T.StructType):
        """(field_ids, next_id) the child pointer of ``ptr`` carrying
        ``schema`` will hold: parent ids plus fresh ids for appended
        columns. (None, None) when the table predates id tracking and no
        rename/drop has synthesized ids — reads then resolve by name,
        which is correct because names have never changed."""
        fids = ptr.get("field_ids")
        if fids is None:
            return None, None
        fids = dict(fids)
        nxt = int(ptr.get("next_field_id", len(fids)))
        for f in schema.fields:
            if f.name not in fids:
                fids[f.name] = nxt
                nxt += 1
        return fids, nxt

    @staticmethod
    def _synthesized_evo(ptr: dict, schema: T.StructType):
        """Field-id state for the FIRST rename/drop on a pre-v3 table:
        synthesize ids positionally and pin the pre-evolution names in
        ``legacy_cols`` (covers every file written before stamping)."""
        if ptr.get("field_ids") is not None:
            return (
                dict(ptr["field_ids"]),
                int(ptr.get("next_field_id", len(ptr["field_ids"]))),
                ptr.get("legacy_cols"),
            )
        fids = {f.name: i for i, f in enumerate(schema.fields)}
        legacy = {str(i): n for n, i in fids.items()}
        return fids, len(fids), legacy

    def _read_file_groups(
        self, files: list, schema: T.StructType, ptr: dict
    ) -> DataFrame:
        """Read a set of manifest file entries normalized to the CURRENT
        schema. Files are grouped by their write-time id→name map; each
        group is scanned with the names it was written under (so a stale
        same-named column from before a drop+re-add is never read),
        aliased to current names by field id, null-backfilled for columns
        that postdate it, and unioned. Tables that never renamed/dropped
        collapse to a single plain scan — the pre-v3 fast path."""
        fids = ptr.get("field_ids")
        legacy = ptr.get("legacy_cols")
        names = [f.name for f in schema.fields]
        groups: dict = {}
        order: list = []
        for f in files:
            cmap = _file_cols(f, legacy)
            key = tuple(sorted(cmap.items())) if (cmap and fids) else None
            if key not in groups:
                groups[key] = []
                order.append(key)
            groups[key].append(f["path"])
        parts = []
        for key in order:
            paths = groups[key]
            if key is None:
                part = (
                    self.spark.read.schema(schema).parquet(*paths).select(*names)
                )
            else:
                cmap = dict(key)
                rf, alias, missing = [], [], []
                for fld in schema.fields:
                    w = cmap.get(str(fids.get(fld.name)))
                    if w is None:
                        missing.append(fld)
                    else:
                        rf.append(T.StructField(w, fld.dataType, True))
                        alias.append((w, fld.name))
                part = (
                    self.spark.read.schema(T.StructType(rf))
                    .parquet(*paths)
                    .select(
                        *[F.col(w).alias(c) for w, c in alias],
                        *[
                            F.lit(None).cast(fld.dataType).alias(fld.name)
                            for fld in missing
                        ],
                    )
                    .select(*names)
                )
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _bucket_of_values(self, values: list, ptr: dict, by_name: dict) -> dict:
        """value → hash bucket for literals of the bucket key, computed
        with the key's REAL type exactly like the writer laid files out.
        Common key types (string/long/int/short/byte/boolean) hash
        DRIVER-SIDE through the bit-exact XXH64 port the native sink
        already uses (functions/xxh64.py, differential-tested against
        ``F.xxhash64``) — zero Spark jobs on the point-read path
        (measured r6: the 1-row typed job cost 0.34 s warm and 2.5 s in
        a long-lived session). Other types fall back to one tiny local
        job. Returns {} when the values can't be typed (caller falls
        back to stats-only pruning)."""
        uniq = list(dict.fromkeys(values))
        local = _local_bucket_of_values(
            uniq, by_name.get(ptr["bucket_key"]), ptr["n_buckets"]
        )
        if local is not None:
            return local
        try:
            fld = T.StructType([
                T.StructField("__i", T.LongType()),
                T.StructField(ptr["bucket_key"], by_name[ptr["bucket_key"]]),
            ])
            rows = (
                self.spark.createDataFrame(
                    [(i, v) for i, v in enumerate(uniq)], fld
                )
                .select(
                    "__i",
                    _bucket_expr(ptr["bucket_key"], ptr["n_buckets"]).alias("b"),
                )
                .collect()
            )
        except Exception:  # untypeable literal: never skip on a guess
            return {}
        by_i = {int(r["__i"]): int(r["b"]) for r in rows}
        return {uniq[i]: b for i, b in by_i.items()}

    @staticmethod
    def _group_bucket_set(group: list, bucket_key: str, val2b: dict):
        """Allowed buckets for one AND-group: intersection over its
        equality/IN conditions on the bucket key (None = unrestricted).
        Safe under merge-on-read — every version of a key hashes to the
        same bucket, so a file in another bucket holds no version of any
        matching key."""
        allowed = None
        for col, op, val in group:
            if col != bucket_key or op not in ("=", "in"):
                continue
            vs = [val] if op == "=" else list(val)
            if any(v not in val2b for v in vs):
                continue  # untyped literal: this cond can't restrict
            bs = {val2b[v] for v in vs}
            allowed = bs if allowed is None else (allowed & bs)
        return allowed

    def _prune_files(
        self, files: list, conds: list, by_name: dict, ptr: dict
    ) -> list:
        """Stats-prune manifest entries against ANDed conditions on
        CURRENT column names, translating each condition to every file's
        write-time names by field id (stats are stored under write-time
        names). A file written before a predicate column existed is
        provably all-NULL there and is skipped."""
        fids = ptr.get("field_ids")
        legacy = ptr.get("legacy_cols")
        cache: dict = {}
        kept = []
        for f in files:
            cmap = _file_cols(f, legacy)
            key = tuple(sorted(cmap.items())) if (cmap and fids) else None
            if key not in cache:
                g_conds, g_names, absent = _group_conds(
                    conds, dict(key) if key else None, fids, by_name
                )
                bk = ptr["bucket_key"]
                if key is not None:
                    bk = dict(key).get(str(fids.get(bk))) or bk
                cache[key] = (g_conds, g_names, absent, bk)
            g_conds, g_names, absent, bk = cache[key]
            if absent:
                continue
            if _file_may_match(f, g_conds, g_names, bk):
                kept.append(f)
        return kept

    def seq_as_of(self, ts) -> int:
        """Time travel by TIMESTAMP (Iceberg's ``FOR SYSTEM_TIME AS OF``):
        the latest snapshot committed at or before ``ts`` (datetime
        treated as UTC, or epoch seconds). Pre-r3 pointers without a
        commit stamp fall back to pointer-file mtime."""
        if isinstance(ts, _dt.datetime):
            ts = calendar.timegm(ts.utctimetuple()) + ts.microsecond / 1e6
        best = None
        for p in glob.glob(os.path.join(self._manifest_dir, "snap-*.json")):
            s = int(os.path.basename(p)[5:13])
            try:
                ptr = self.pointer(s)
            except FileNotFoundError:
                continue
            at = ptr.get("committed_at_epoch") or os.path.getmtime(p)
            if at <= ts and (best is None or s > best):
                best = s
        if best is None:
            raise ValueError(f"no snapshot committed at or before {ts}")
        return best

    # ---------------------------------------------------------------- ledger
    def _applied(self, pointer: dict) -> dict:
        out: dict = {}
        for name in pointer["applied_archives"]:
            out.update(self._read_archive(name))
        out.update(pointer["applied_tail"])
        return out

    def is_applied(self, batch_key: str, pointer: dict | None = None) -> bool:
        """O(1) amortized exactly-once check: the inline tail, then cached
        immutable archive chunks."""
        ptr = pointer or self.pointer()
        if batch_key in ptr["applied_tail"]:
            return True
        return any(
            batch_key in self._read_archive(name)
            for name in ptr["applied_archives"]
        )

    def applied_batches(self) -> dict:
        return self._applied(self.pointer())

    def _roll_ledger(
        self, ptr: dict, batch_key: str | None, commit_seq: int, tok: str = ""
    ):
        """New (tail, archives) after this commit. A full tail flushes to a
        new immutable chunk; too many chunks merge into one — per-commit
        cost is O(1) amortized, and the pointer stays ≤ _TAIL_MAX keys.
        ``tok`` makes chunk names collision-free across racing writers."""
        tail = dict(ptr["applied_tail"])
        archives = list(ptr["applied_archives"])
        written: list[str] = []
        if batch_key is not None:
            tail[batch_key] = commit_seq
        if len(tail) > _TAIL_MAX:
            name = f"applied-{commit_seq:08d}{tok}.json"
            _write_json(os.path.join(self._manifest_dir, name), tail)
            archives.append(name)
            written.append(name)
            tail = {}
            if len(archives) > _TAIL_MAX:
                merged: dict = {}
                for n in archives:
                    merged.update(self._read_archive(n))
                name = f"applied-{commit_seq:08d}{tok}-merged.json"
                _write_json(os.path.join(self._manifest_dir, name), merged)
                written.append(name)
                archives = [name]
        return tail, archives, written

    # ----------------------------------------------------------------- read
    def read(
        self,
        seq: int | None = None,
        buckets: set[int] | None = None,
        where: list | None = None,
        as_of=None,
        tag: str | None = None,
    ) -> DataFrame:
        """Snapshot-consistent read; optional bucket pruning and
        predicate-driven FILE pruning.

        ``where`` is a list of ``(col, op, value)`` conditions (ops: = < <=
        > >= between in — value a 2-tuple for between, an iterable for
        in), ANDed — or, pyarrow-``filters``-style, a list of such lists
        forming an OR of AND-groups (DNF); a file is then skipped only
        when every group provably excludes it. Files whose
        per-column [min, max] manifest stats provably exclude the predicate
        are dropped BEFORE ``spark.read.parquet`` — the Iceberg
        manifest-pruning move; the exact predicate is then applied as a
        normal filter, so pruning only ever removes whole files that
        contain no matching rows.

        Correctness under merge-on-read: when delta files are present,
        stats pruning is restricted to the KEY columns (all versions of a
        key share its key values, so a file whose key range excludes the
        predicate holds no version of any matching key and dropping it
        cannot change the max-seq dedup). Non-key predicates would be
        unsafe there — a skipped file could hold the NEWER version of a
        key whose older version matches — so they prune only delta-free
        snapshots (pure CoW/compacted: exactly one live version per key)
        and otherwise just filter.

        With merge-on-read delta files present, the read applies the
        last-writer-wins dedup (max seq_col per key) over base ∪ deltas —
        Iceberg v2 semantics. Compaction folds deltas back to base.

        Tombstones are NOT filtered here: a key whose winner is a delete
        surfaces as one row flagged ``__deleted=true`` (payload null).
        This is deliberate — the flag is the cross-batch late-data guard
        and downstream CDC consumers need to see it. Final-state views
        filter it (``operators.apply.read_transcripts``); ad-hoc readers
        must too.

        ``as_of`` time-travels by timestamp (``seq_as_of``); ``seq``
        time-travels by snapshot id; ``tag`` resolves a named pin
        (``tag_snapshot``) — pass at most one."""
        if sum(x is not None for x in (seq, as_of, tag)) > 1:
            raise ValueError("pass at most one of seq / as_of / tag")
        if as_of is not None:
            seq = self.seq_as_of(as_of)
        if tag is not None:
            found = self.tags().get(tag)
            if found is None:
                raise FileNotFoundError(f"no tag {tag!r}")
            seq = found
        ptr = self.pointer(seq)
        schema = T.StructType.fromJson(ptr["schema"])
        files = self._files(ptr)
        if buckets is not None:
            files = [f for f in files if f["bucket"] in buckets]
        has_delta = any(f.get("kind", "base") == "delta" for f in files)
        pred = _where_filter(where) if where else None
        if where:
            # DNF pruning: a file is skippable only when EVERY OR-group's
            # prunable (under MoR: key-column) conditions exclude it. A
            # group whose prunable subset is empty may match any file, so
            # no file can be excluded at all — fall through to the exact
            # filter. Restricting a group to a subset of its conditions
            # only WEAKENS it (more files survive), so this stays
            # conservative under merge-on-read exactly like the AND path.
            key_cols = {ptr["bucket_key"], *ptr["key_cols"]}
            groups, ok = [], True
            for g in _where_groups(where):
                pg = [c for c in g if (not has_delta) or c[0] in key_cols]
                if not pg:
                    ok = False
                    break
                groups.append(pg)
            if ok and groups:
                by_name = {f.name: f.dataType for f in schema.fields}
                # hash-bucket pruning for =/IN on the bucket key (the
                # read_keys move, applied to where=): works even when
                # per-file stats are wide (post-compaction hash-mixed
                # files), and is MoR-safe — a key's versions never leave
                # its bucket. One tiny typed job for all literals.
                bk = ptr["bucket_key"]
                eq_vals = [
                    v
                    for g in groups
                    for col, op, val in g
                    if col == bk and op in ("=", "in")
                    for v in ([val] if op == "=" else list(val))
                ]
                val2b = (
                    self._bucket_of_values(eq_vals, ptr, by_name)
                    if eq_vals
                    else {}
                )
                survivors: set[int] = set()
                for g in groups:
                    allowed = self._group_bucket_set(g, bk, val2b)
                    cand = (
                        files
                        if allowed is None
                        else [f for f in files if f["bucket"] in allowed]
                    )
                    survivors.update(
                        id(f) for f in self._prune_files(cand, g, by_name, ptr)
                    )
                files = [f for f in files if id(f) in survivors]
        if not files:
            return self.spark.createDataFrame([], schema)
        df = self._read_file_groups(files, schema, ptr)
        has_delta = any(f.get("kind", "base") == "delta" for f in files)
        if has_delta and ptr.get("seq_col"):
            df = _resolve_versions(df, ptr, schema)
        return df.filter(pred) if pred is not None else df

    def read_keys(self, values, seq: int | None = None) -> DataFrame:
        """Point/key lookup with two-level pruning: (1) bucket pruning —
        only files in the requested keys' hash buckets; (2) data skipping —
        within a bucket, only files whose [kmin, kmax] key range can
        contain a requested value (per-file stats collected at commit
        time; files are sorted by the order columns so ranges are tight).
        At n_buckets=4096 a single-conversation lookup touches ~1/4096 of
        the table's files, then usually ONE file of that bucket."""
        ptr = self.pointer(seq)
        n_buckets = ptr["n_buckets"]
        vals = list(values)
        schema = T.StructType.fromJson(ptr["schema"])
        by_name = {f.name: f.dataType for f in schema.fields}
        # bucket ids computed the same way the writer laid files out —
        # with the key's REAL type (xxhash64 of a stringified value would
        # hash into the wrong buckets for non-string keys); common types
        # hash driver-side (_local_bucket_of_values), others via one tiny
        # typed job
        val2b = self._bucket_of_values(vals, ptr, by_name)
        if val2b and all(v in val2b for v in vals):
            buckets = set(val2b.values())
        else:
            key_field = T.StructType(
                [T.StructField(ptr["bucket_key"], by_name[ptr["bucket_key"]])]
            )
            one = self.spark.createDataFrame(
                [(v,) for v in vals], key_field
            ).select(_bucket_expr(ptr["bucket_key"], n_buckets).alias("b"))
            buckets = {int(r["b"]) for r in one.collect()}
        files = [f for f in self._files(ptr) if f["bucket"] in buckets]
        # a file survives when ANY requested value may fall in its key
        # range (OR over values, so ANDed _file_may_match can't express
        # it): one _prune_files pass per value — each pass translates the
        # condition per cols-group ONCE and normalizes the value against
        # the key's real dtype (timestamp/date keys prune via their
        # epoch-encoded stats); null/missing stats never skip
        survivors: set[int] = set()
        for v in vals:
            survivors.update(
                id(f)
                for f in self._prune_files(
                    files, [(ptr["bucket_key"], "=", v)], by_name, ptr
                )
            )
        pruned = [f for f in files if id(f) in survivors]
        if not pruned:
            return self.spark.createDataFrame([], schema)
        df = self._read_file_groups(pruned, schema, ptr)
        # the skipped files cannot hold these keys, so max-LSN dedup over
        # the pruned subset is still last-writer-correct per key
        has_delta = any(f.get("kind", "base") == "delta" for f in pruned)
        if has_delta and ptr.get("seq_col"):
            df = _resolve_versions(df, ptr, schema)
        return df.filter(F.col(ptr["bucket_key"]).isin(vals))

    def files_df(self, seq: int | None = None) -> DataFrame:
        """The snapshot's live FILE inventory as a DataFrame — Iceberg's
        ``<table>.files`` metadata table: one row per data file (path,
        bucket, kind, rows, bytes, the per-column min/max stats as a
        JSON string, the write-time field-id map). Pure metadata (the
        pointer + manifests already in hand), no data I/O — the surface
        an ops notebook uses to see skew, delta backlog, or stats
        coverage before deciding a maintenance action; ``describe()``
        is its scalar summary."""
        ptr = self.pointer(seq)
        rows = [
            (
                e["path"],
                int(e["bucket"]),
                e.get("kind", "base"),
                int(e["rows"]),
                int(e.get("bytes") or 0),
                json.dumps(e.get("stats"), sort_keys=True)
                if e.get("stats") is not None else None,
                json.dumps(e.get("cols"), sort_keys=True)
                if e.get("cols") is not None else None,
            )
            for e in self._files(ptr)
        ]
        return self.spark.createDataFrame(
            rows,
            "path string, bucket int, kind string, rows long, bytes long, "
            "stats string, cols string",
        )

    def snapshots_df(self) -> DataFrame:
        """Retained snapshot history as a DataFrame — Iceberg's
        ``<table>.snapshots`` / Delta's DESCRIBE HISTORY: one row per
        retained pointer (seq, parent, snapshot id, commit wall clock,
        live file/manifest counts, schema width). Complements
        ``lineage()`` (which records what each commit CHANGED and
        outlives expiry); this reads what each snapshot IS while its
        pointer is retained."""
        rows = []
        for p in sorted(glob.glob(os.path.join(self._snap_dir, "snap-*.json"))):
            s = int(os.path.basename(p)[5:13])
            try:
                ptr = self.pointer(s)
            except FileNotFoundError:
                continue
            rows.append((
                s,
                ptr.get("parent_seq"),
                ptr.get("snapshot_id"),
                float(ptr.get("committed_at_epoch") or os.path.getmtime(p)),
                int(sum(m["n_files"] for m in ptr["manifests"])),
                len(ptr["manifests"]),
                len(ptr["schema"].get("fields", [])),
            ))
        return self.spark.createDataFrame(
            rows,
            "seq long, parent_seq long, snapshot_id string, "
            "committed_at_epoch double, n_files long, n_manifests int, "
            "n_columns int",
        )

    def lineage(self) -> DataFrame:
        """Per-commit lineage ledger as a DataFrame, read from the
        append-only ``_lineage`` table (one JSON record per commit) —
        offsets/batch keys, commit seq, row counts, per-bucket row counts,
        wall time. Uncommitted orphans (crash between lineage write and
        pointer link) are filtered by commit_seq."""
        cur = self.current_seq()
        lineage_dirs = [self._lineage_dir]
        snap_dirs = [self._snap_dir]
        if self.branch is not None:  # pre-fork history lives in main's dirs
            lineage_dirs.append(self._main_lineage_dir)
            snap_dirs.append(self._manifest_dir)
        paths = sorted(
            p
            for d in lineage_dirs
            for p in glob.glob(os.path.join(d, "lineage-*.json"))
        )
        # at seqs whose pointer records its own lineage file (v3), admit
        # ONLY that file — a losing attempt's debris at the same seq would
        # otherwise appear as a duplicate lineage row until orphan GC runs.
        # Expired seqs (pointer gone) keep every candidate (legacy view).
        # On a branch handle, the BRANCH's pointer wins at overlapping
        # seqs (snap_dirs order), so a diverged main commit's lineage at
        # the same seq is excluded from the branch's view.
        recorded: dict[int, str] = {}
        for sd in snap_dirs:
            for sp in glob.glob(os.path.join(sd, "snap-*.json")):
                try:
                    with open(sp) as f:
                        p2 = json.load(f)
                except FileNotFoundError:
                    continue
                if p2.get("lineage_file") is not None:
                    recorded.setdefault(int(p2["seq"]), p2["lineage_file"])
        paths = [
            p
            for p in paths
            if (s := int(os.path.basename(p)[8:16])) not in recorded
            or os.path.basename(p) == recorded[s]
        ]
        if not paths:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return (
            self.spark.read.schema(LINEAGE_SCHEMA)
            .json(paths)
            .filter(F.col("commit_seq") <= cur)
        )

    # ---------------------------------------------------------------- merge
    def merge(
        self,
        changes: DataFrame,
        batch_key: str | None = None,
        op_col: str = "op",
        source: str = "batch",
        seq_col: str | None = None,
        mode: str = "cow",
        stage_as: str | None = None,
    ) -> dict | None:
        """MERGE of deduplicated changes (one row per key).

        ``changes`` must contain the key columns, the payload columns
        (superset/subset of table schema — new columns evolve the schema,
        missing payload columns are null-filled), and ``op_col`` with
        'I'/'U' (upsert) or 'D' (delete).

        Three merge strategies:
        - **anti-join copy-on-write** (default): old ∖ changed-keys ∪
          upserts, touched buckets rewritten. Generic; handles raw
          op='D' deletes.
        - **seq-agg copy-on-write** (``seq_col`` given): old ∪ changes →
          groupBy(key) → max(struct(seq, ...)). ONE hash aggregation
          replaces both the late-data guard join and the anti-join;
          map-side partial agg collapses hot keys before the shuffle.
          Deletes MUST arrive as ``__deleted`` tombstone rows (raw 'D'
          rows raise — they would otherwise be silently dropped).
        - **merge-on-read** (``mode="mor"``, requires seq_col): the commit
          only appends the batch winners as DELTA files — O(batch) write,
          no read/rewrite of existing data. Readers dedup base ∪ deltas by
          max seq (Iceberg v2 semantics); ``compact()`` folds deltas back
          into base files. This is what keeps ingest linear when every
          micro-batch touches every bucket (CoW write amplification is
          O(table) per batch in that regime). Same tombstone rule.

        ``stage_as="name"`` is WRITE-AUDIT-PUBLISH (Iceberg's wap.id
        pattern): the batch is fully written and deduplicated but the
        snapshot pointer does NOT advance — main readers cannot see it.
        ``read_staged(name)`` shows the table as if published (audit
        view); ``publish_staged(name)`` makes it live atomically (with
        the normal optimistic rebase over commits that landed since);
        ``drop_staged(name)`` discards data and metadata. Requires
        ``mode="mor"`` (append-only commits rebase unconditionally, so a
        stale staged batch can always publish). The exactly-once batch
        key enters the ledger at PUBLISH time, so a re-delivered batch
        that was staged-then-dropped is not falsely deduplicated.

        Returns the lineage record for the commit, or None when
        ``batch_key`` is already in the applied ledger (idempotent replay).
        """
        t0 = time.monotonic()
        if stage_as is not None:
            self._require_main("stage_as (use a branch commit instead)")
            if mode != "mor":
                raise ValueError(
                    "stage_as requires mode='mor' (append-only commits); "
                    "a staged CoW rewrite could not rebase over commits that "
                    "land during the audit"
                )
            if os.path.exists(self._staged_path(stage_as)):
                raise ValueError(
                    f"a staged commit named {stage_as!r} already exists — "
                    "publish_staged or drop_staged it first (silently "
                    "replacing it would orphan the earlier batch's data)"
                )
        ptr = self.pointer()
        if batch_key is not None and self.is_applied(batch_key, ptr):
            return None
        if ptr.get("agg_cols"):
            if mode != "mor":
                raise ValueError(
                    "additive (agg_cols) tables are merge-on-read only: "
                    "accumulation is a pure O(delta) append folded on "
                    "read/compact; a CoW rewrite would have to fold at "
                    "write time and is never O(batch)"
                )
            if "__deleted" in changes.columns:
                raise ValueError(
                    "additive (agg_cols) tables are accumulate-only — "
                    "deletes are not supported (a tombstone cannot express "
                    "'subtract the partials so far'; write a compensating "
                    "negative partial instead)"
                )
        key_cols = ptr["key_cols"]
        bucket_key = ptr["bucket_key"]
        n_buckets = ptr["n_buckets"]
        old_schema = T.StructType.fromJson(ptr["schema"])

        merged_schema = _merge_schema(old_schema, changes.drop(op_col).schema)

        bexpr = _bucket_expr(bucket_key, n_buckets)
        ch = changes.withColumn("__bucket", bexpr)
        has_tombstones = "__deleted" in ch.columns
        is_delete = F.col(op_col) == "D"
        if has_tombstones:  # tombstone-style deletes count too
            is_delete = is_delete | F.coalesce(F.col("__deleted"), F.lit(False))
            # a raw op='D' row ALONGSIDE a tombstone column folds into the
            # tombstone form (apply_changes' convention) — the upsert
            # filter below would otherwise silently drop it, losing the
            # delete while lineage still counted it
            ch = ch.withColumn(
                "__deleted",
                F.coalesce(F.col("__deleted"), F.lit(False))
                | (F.col(op_col) == "D"),
            ).withColumn(
                op_col,
                F.when(F.col(op_col) == "D", F.lit("U")).otherwise(F.col(op_col)),
            )

        checks = ptr.get("checks") or {}
        if checks:
            # writer-side CHECK enforcement (Delta-constraint semantics):
            # every incoming LIVE row must satisfy every check — deletes/
            # tombstones are exempt (removing a bad row is always legal).
            # Columns the batch doesn't carry are aligned as NULL (the
            # same alignment merge itself applies), and NULL passes (ANSI
            # CHECK). One extra aggregation pass, paid only when checks
            # exist; a violation fails the batch BEFORE any file is
            # written, so the table and ledger are untouched.
            probe = ch.filter(~is_delete)
            for f in merged_schema.fields:
                if f.name not in probe.columns:
                    probe = probe.withColumn(f.name, F.lit(None).cast(f.dataType))
            _enforce_checks(probe, checks, f"merge(source={source!r})")

        old_manifests = ptr["manifests"]
        observation = None
        ch_persisted = False
        if mode == "mor" or not old_manifests:
            # FAST PATH: no pre-read, no stats job — batch counts ride the
            # write job via observe(); touched buckets come from the
            # distributed post-write stats scan. One data pass per batch.
            # Besides every MoR commit, this also covers the BOOTSTRAP
            # CoW commit (empty table): with no old manifests there is
            # nothing to rewrite, so the touched-bucket pre-pass (a
            # persist + full stats aggregation of the batch) buys
            # nothing — an initial load is write-only either way (r6:
            # saves one full pass per table on e.g. the 15-table
            # migration workload).
            if mode == "mor" and (seq_col is None or not ptr.get("seq_col")):
                raise ValueError("merge-on-read requires a table seq_col")
            if seq_col is not None and not has_tombstones:
                # seq-agg dedup would silently drop raw 'D' rows; cheap
                # existence probe ONLY on this cold path — apply_changes
                # always supplies tombstones, so ingest never pays it
                if not ch.filter(is_delete).isEmpty():
                    if ptr.get("agg_cols"):
                        raise ValueError(
                            "additive (agg_cols) tables are accumulate-only "
                            "— op='D' deletes are not supported; write a "
                            "compensating negative partial instead"
                        )
                    raise ValueError(
                        "merge-on-read got op='D' rows without a __deleted "
                        "tombstone column — they would be silently dropped. "
                        "Convert deletes to tombstones (apply_changes does this)."
                    )
            from pyspark.sql import Observation

            observation = Observation()
            obs_aggs = [
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.when(is_delete, 1).otherwise(0)).alias("dels"),
            ]
            if seq_col is not None:
                # source-offset range (the changelog's own coordinates) —
                # rides the write job, costs nothing extra
                obs_aggs.append(F.min(seq_col).alias("lsn_min"))
                obs_aggs.append(F.max(seq_col).alias("lsn_max"))
            ch = ch.observe(observation, *obs_aggs)
            touched = None
            keep_manifests, rewrite_files = list(old_manifests), []
        elif seq_col is not None:
            # Populated CoW, seq-agg strategy: the batch feeds the write
            # job exactly ONCE (old ∪ upserts → max-seq agg), so the
            # full-batch persist that used to feed the stats pre-pass
            # bought nothing but a cache build (r6; guide §5 — measured
            # 1.0-2.6 s vs 0.8-0.9 s per 1M-row batch, and at scale it
            # spills the whole batch to disk). The touched-bucket set —
            # needed BEFORE old files are selected — comes from a NARROW
            # distinct pass (column-pruned through the upstream plan);
            # the row/delete/lsn counts ride the write job via observe()
            # exactly like the MoR/bootstrap fast path.
            if not has_tombstones:
                # seq-agg dedup would silently drop raw 'D' rows; cheap
                # existence probe, same rule as the fast path above
                # (apply_changes always supplies tombstones, so the
                # ingest path never pays it)
                if not ch.filter(is_delete).isEmpty():
                    raise ValueError(
                        "seq-agg merge got op='D' rows without a __deleted "
                        "tombstone column — they would be silently dropped. "
                        "Convert deletes to tombstones (apply_changes does "
                        "this) or use the anti-join path (seq_col=None)."
                    )
            touched = sorted(
                int(r[0])
                for r in ch.select("__bucket").distinct().collect()
            )
            from pyspark.sql import Observation

            observation = Observation()
            ch = ch.observe(
                observation,
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.when(is_delete, 1).otherwise(0)).alias("dels"),
                F.min(seq_col).alias("lsn_min"),
                F.max(seq_col).alias("lsn_max"),
            )
            keep_manifests, rewrite_files = self._filter_manifests(
                ptr, set(touched), ptr["seq"] + 1
            )
        else:
            # anti-join CoW (no seq_col): the batch is consumed TWICE in
            # the write job (upserts ∪ the anti-join's key probe), so
            # caching it is load-bearing — one stats pass over the
            # cached batch gives touched buckets + counts
            ch = ch.persist()
            ch_persisted = True
            stats = ch.groupBy("__bucket").agg(
                F.count("*").alias("rows"),
                F.sum(F.when(is_delete, 1).otherwise(0)).alias("dels"),
            ).collect()
            touched = sorted(int(r["__bucket"]) for r in stats)
            n_changes = sum(r["rows"] for r in stats)
            n_deletes = sum(r["dels"] for r in stats)
            lsn_min = lsn_max = None
            keep_manifests, rewrite_files = self._filter_manifests(
                ptr, set(touched), ptr["seq"] + 1
            )

        try:

            old = None
            if rewrite_files:
                # field-id-resolved read; evolved columns null-backfill
                old = self._read_file_groups(rewrite_files, merged_schema, ptr)

            upserts = ch.filter(F.col(op_col) != "D").drop(op_col, "__bucket")
            have = set(upserts.columns)
            # missing columns null-fill; present columns cast to the merged
            # type (no-op when equal; widens a narrower batch column)
            upserts = upserts.select(
                *[
                    (
                        F.col(f.name).cast(f.dataType)
                        if f.name in have
                        else F.lit(None).cast(f.dataType)
                    ).alias(f.name)
                    for f in merged_schema.fields
                ]
            )

            if old is None:
                new_data = upserts
            elif seq_col is not None:
                # single-shuffle last-writer-wins over old ∪ new; the seq
                # column leads the struct so max() picks the newest row.
                # upserts LEADS the union so the plan (and the write
                # action) binds to the BATCH's SparkSession: inside
                # foreachBatch that is the micro-batch's wrapped session,
                # where the observe() metrics listener is registered —
                # rooting the write on `old`'s (outer) session leaves the
                # observation's promise never completed and
                # observation.get blocking forever (union order does not
                # affect a groupBy+max result)
                new_data = _dedup_by_seq(
                    upserts.unionByName(old), key_cols, seq_col, merged_schema
                )
            else:
                # keys are co-bucketed: this anti-join shuffles only the
                # touched slice of the table; small change-sets broadcast
                survivors = old.join(ch.select(*key_cols), on=key_cols, how="left_anti")
                new_data = survivors.unionByName(upserts)

            commit_seq = ptr["seq"] + 1
            # uuid suffix: two racing writers can never write into (or
            # overwrite-mode clobber) the same data dir; a rebase renames
            # the dir to the winning sequence
            commit_dir = os.path.join(
                self.path,
                _DATA_DIR,
                f"commit-{commit_seq:08d}-{uuid.uuid4().hex[:8]}",
            )
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
                .sortWithinPartitions("__bucket", *ptr["order_cols"])
                .write.partitionBy("__bucket")
                .mode("overwrite")
                .parquet(commit_dir)
            )
            new_files, rows_written, per_bucket = self._scan_commit_dir(commit_dir)
            if observation is not None:
                # additive tables mark even the FIRST commit delta: a batch
                # may legitimately carry several partials of one key, and
                # only delta files trigger the read-side fold; a bootstrap
                # CoW commit's files stay kind=base
                if mode == "mor" and (old_manifests or ptr.get("agg_cols")):
                    for f in new_files:
                        f["kind"] = "delta"
                if touched is None:
                    # fast paths learn the touched set from the write
                    # itself; populated CoW (observe + narrow pre-pass)
                    # keeps its PRE-write set — that is what the batch
                    # touched, even if an old winner kept a bucket's file
                    touched = sorted(per_bucket)
                try:
                    m = observation.get
                    n_changes, n_deletes = int(m["rows"]), int(m["dels"] or 0)
                    lsn_min = m["lsn_min"] if seq_col is not None else None
                    lsn_max = m["lsn_max"] if seq_col is not None else None
                except Exception:
                    # a statically-empty batch folds the observe node out
                    # of the plan entirely (no tasks ran, nothing written)
                    n_changes, n_deletes = int(rows_written), 0
                    lsn_min = lsn_max = None
            n_upserts = n_changes - n_deletes
        finally:
            if ch_persisted:
                ch.unpersist()

        lineage_rec = {
            "commit_seq": commit_seq,
            "batch_key": batch_key,
            "source": source,
            "n_changes": int(n_changes),
            "n_upserts": int(n_upserts),
            "n_deletes": int(n_deletes),
            "lsn_min": int(lsn_min) if lsn_min is not None else None,
            "lsn_max": int(lsn_max) if lsn_max is not None else None,
            "touched_buckets": touched,
            "files_added": len(new_files),
            "files_removed": len(rewrite_files),
            "rows_written": int(rows_written),
            "per_bucket_rows": {str(k): int(v) for k, v in per_bucket.items()},
            "wall_ms": round((time.monotonic() - t0) * 1000.0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        if stage_as is not None:
            # WAP: everything is written; only the pointer advance is
            # deferred to publish_staged(). Files are forced to delta so
            # the audit/publish read always applies max-seq dedup even
            # against rows that land in OTHER commits mid-audit.
            for f in new_files:
                f["kind"] = "delta"
            fids, _ = self._assigned_field_ids(ptr, merged_schema)
            if fids is not None:
                cmap = {str(fids[f.name]): f.name for f in merged_schema.fields}
                for f in new_files:
                    f["cols"] = cmap
            staged = {
                "name": stage_as,
                "parent_seq": ptr["seq"],
                "schema": merged_schema.jsonValue(),
                "files": new_files,
                "batch_key": batch_key,
                "lineage": lineage_rec,
                "commit_dir": commit_dir,
                "staged_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                # layout in force at stage time: read_staged/publish_staged
                # raise when a rebucket or rename/drop (or a conflicting
                # concurrent column add) lands during the audit window —
                # the files' bucket ids and field-id stamps would be stale
                # (ADVICE r03 #3)
                "n_buckets": ptr["n_buckets"],
                "bucket_key": ptr["bucket_key"],
                "field_ids": fids,
            }
            # EXCLUSIVE create (hard-link, like the pointer commit): the
            # earlier exists() check is only the fast path — two writers
            # racing the same stage name both pass it, and os.replace
            # would silently clobber the first batch (CLAUDE.md in-flight
            # naming invariant). The loser cleans up its own data dir.
            sp = self._staged_path(stage_as)
            tmp = sp + f".{uuid.uuid4().hex}.tmp"
            with open(tmp, "w") as fh:
                json.dump(staged, fh)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp, sp)
            except FileExistsError:
                import shutil

                shutil.rmtree(commit_dir, ignore_errors=True)
                raise ValueError(
                    f"a staged commit named {stage_as!r} already exists — "
                    "publish_staged or drop_staged it first"
                )
            finally:
                os.unlink(tmp)
            return lineage_rec
        return self._commit_rebasing(
            ptr, merged_schema, keep_manifests, new_files,
            batch_key, lineage_rec, commit_dir,
        )

    # ------------------------------------------------- write-audit-publish
    def _staged_path(self, name: str) -> str:
        if not re.fullmatch(r"[A-Za-z0-9_.-]+", name):
            raise ValueError(f"invalid staged-commit name: {name!r}")
        return os.path.join(self._manifest_dir, f"staged-{name}.json")

    def _load_staged(self, name: str) -> dict:
        p = self._staged_path(name)
        if not os.path.exists(p):
            raise FileNotFoundError(f"no staged commit named {name!r}")
        with open(p) as f:
            st = json.load(f)
        prev = st.get("prev_commit_dir")
        if (
            prev
            and st.get("commit_dir")
            and not os.path.isdir(st["commit_dir"])
            and os.path.isdir(prev)
        ):
            # crash between the re-home intent and the rename: the data
            # still lives in the previous dir — resolve against it
            st = {
                **st,
                "files": [
                    dict(f, path=f["path"].replace(st["commit_dir"], prev, 1))
                    for f in st["files"]
                ],
                "commit_dir": prev,
            }
        return st

    def list_staged(self) -> list[str]:
        return sorted(
            os.path.basename(p)[len("staged-"):-len(".json")]
            for p in glob.glob(os.path.join(self._manifest_dir, "staged-*.json"))
        )

    def _check_staged_layout(self, st: dict, ptr: dict) -> None:
        """Raise when the table's bucket layout or field-id assignment
        moved under a staged commit during its (possibly long) audit
        window: a rebucket leaves the staged files' per-file bucket ids
        computed under the old layout (bucket pruning would silently skip
        matching keys), and a rename/drop — or a concurrent column add
        that claimed the id the staged batch stamped on ITS new column —
        leaves the files' id→name stamps remapping to the wrong columns.
        Same contract as the mid-race guards in ``_commit_rebasing``,
        extended to the audit window (ADVICE r03 #3). Pre-r4 staged JSONs
        carry no layout record and skip the check."""
        if "n_buckets" in st and (
            st["n_buckets"] != ptr["n_buckets"]
            or st["bucket_key"] != ptr["bucket_key"]
        ):
            raise ConcurrentCommitError(
                "bucket layout changed (rebucket) while this commit was "
                "staged — its files were bucketed under the old layout; "
                "drop_staged and re-process the batch"
            )
        st_fids = st.get("field_ids")
        if st_fids is not None:
            cur_fids, _ = self._assigned_field_ids(
                ptr,
                _merge_schema(
                    T.StructType.fromJson(ptr["schema"]),
                    T.StructType.fromJson(st["schema"]),
                ),
            )
            if cur_fids is not None and any(
                cur_fids.get(n) != i for n, i in st_fids.items()
            ):
                raise ConcurrentCommitError(
                    "column rename/drop (or a conflicting concurrent column "
                    "add) landed while this commit was staged — its files' "
                    "field-id stamps no longer match the table; drop_staged "
                    "and re-process the batch"
                )

    def read_staged(self, name: str) -> DataFrame:
        """The AUDIT view: the table exactly as it would look if the
        staged commit published right now — current live files plus the
        staged delta, max-seq dedup across both. Quality gates run here
        (row counts, PII scans, schema checks) before any reader can see
        the batch."""
        st = self._load_staged(name)
        ptr = self.pointer()
        self._check_staged_layout(st, ptr)
        schema = _merge_schema(
            T.StructType.fromJson(ptr["schema"]),
            T.StructType.fromJson(st["schema"]),
        )
        files = self._files(ptr) + st["files"]
        if not files:
            return self.spark.createDataFrame([], schema)
        # resolve with the ids the staged files were STAMPED with: a
        # staged batch that adds a column carries an id the live pointer
        # doesn't hold yet — resolving with the bare pointer would
        # null-backfill exactly the new column the audit wants to
        # validate (ADVICE r03 #2). _check_staged_layout just proved this
        # assignment matches the stamps.
        fids, nxt = self._assigned_field_ids(ptr, schema)
        rptr = ptr if fids is None else {**ptr, "field_ids": fids, "next_field_id": nxt}
        df = self._read_file_groups(files, schema, rptr)
        if ptr.get("seq_col"):
            df = _resolve_versions(df, ptr, schema)
        return df

    def publish_staged(self, name: str) -> dict | None:
        """Atomically promote a staged commit to the live table — the
        normal optimistic commit, rebasing over anything that landed
        during the audit (staged commits are append-only deltas, which
        rebase unconditionally). The batch key enters the exactly-once
        ledger HERE. Returns the lineage record, or None when a
        concurrent writer already applied the same batch key (the staged
        data is then dropped as a duplicate)."""
        st = self._load_staged(name)
        ptr = self.pointer()
        if st["batch_key"] is not None and self.is_applied(st["batch_key"], ptr):
            # either a concurrent writer applied the same batch (our data
            # was never committed — drop it), or OUR OWN earlier publish
            # crashed between the pointer link and the marker removal (the
            # data dir is live table data — drop_staged's liveness guard
            # keeps it and clears only the marker)
            self.drop_staged(name)
            return None
        self._check_staged_layout(st, ptr)
        schema = _merge_schema(
            T.StructType.fromJson(ptr["schema"]),
            T.StructType.fromJson(st["schema"]),
        )
        files = st["files"]
        commit_dir = st["commit_dir"]

        def _persist_rehome(new_dir: str, new_files: list, prev_dir: str) -> None:
            # called BEFORE each rename: record the new paths AND the
            # previous dir, so a crash on either side of the rename
            # leaves a resolvable staged commit (_load_staged falls back
            # to prev_commit_dir when the recorded dir doesn't exist yet)
            _write_json(
                self._staged_path(name),
                {**st, "files": new_files, "commit_dir": new_dir,
                 "prev_commit_dir": prev_dir},
            )

        if ptr["seq"] != st["parent_seq"] and commit_dir and files:
            # data-dir name encodes the commit seq (read_changes recovers
            # _commit_seq from it) — re-home to the publish-time target
            new_dir = os.path.join(
                self.path, _DATA_DIR,
                f"commit-{ptr['seq'] + 1:08d}-{uuid.uuid4().hex[:8]}",
            )
            moved = [
                dict(f, path=f["path"].replace(commit_dir, new_dir, 1))
                for f in files
            ]
            _persist_rehome(new_dir, moved, commit_dir)
            os.rename(commit_dir, new_dir)
            files, commit_dir = moved, new_dir
            st = {**st, "files": files, "commit_dir": commit_dir,
                  "parent_seq": ptr["seq"]}
        rec = {**st["lineage"], "source": st["lineage"]["source"] + "+published"}
        out = self._commit_rebasing(
            ptr, schema, list(ptr["manifests"]), files,
            st["batch_key"], rec, commit_dir, on_rehome=_persist_rehome,
        )
        if out is None:
            # a concurrent writer applied the same batch key mid-retry:
            # OUR staged data was never committed — drop the (possibly
            # re-homed; on_rehome persisted the current dir) data dir
            # eagerly instead of leaving it to remove_orphans' grace scan
            # (ADVICE r03 #5)
            import shutil

            st2 = self._load_staged(name)
            if st2.get("commit_dir") and not self._dir_is_live(st2["commit_dir"]):
                shutil.rmtree(st2["commit_dir"], ignore_errors=True)
        os.remove(self._staged_path(name))
        return out

    def _dir_is_live(self, commit_dir: str) -> bool:
        """True when any retained snapshot's manifests reference a file
        under ``commit_dir`` — i.e. the dir holds COMMITTED table data. A
        staged marker can outlive its own publish (crash between the
        pointer hard-link and the marker removal); deleting the dir then
        would destroy live, manifest-referenced data (ADVICE r03 #1)."""
        prefix = commit_dir.rstrip(os.sep) + os.sep
        checked: set = set()
        snaps = sorted(
            (
                int(os.path.basename(p)[5:13])
                for p in glob.glob(os.path.join(self._manifest_dir, "snap-*.json"))
            ),
            reverse=True,  # newest first: a published dir is usually current
        )
        for s in snaps:
            try:
                ptr = self.pointer(s)
            except FileNotFoundError:
                continue
            for m in ptr["manifests"]:
                if m["name"] in checked:
                    continue
                checked.add(m["name"])
                if any(
                    e["path"].startswith(prefix)
                    for e in self._read_manifest(m["name"])
                ):
                    return True
        return False

    def clear_staged_marker(self, name: str) -> None:
        """Remove ONLY the staged JSON, leaving data untouched — the
        recovery move when the batch key is already in the applied ledger
        (the publish's pointer link landed; the crash hit before the
        marker removal, so the staged dir IS live table data)."""
        os.remove(self._staged_path(name))

    def drop_staged(self, name: str) -> None:
        """Discard a staged commit: its data dir and metadata vanish (the
        audit REJECTED the batch — on re-delivery the batch key is still
        unapplied, so the corrected batch processes normally). Refuses to
        delete a dir any snapshot's manifests reference — a crash between
        a publish's pointer link and its marker removal leaves a stale
        marker pointing at LIVE data (ADVICE r03 #1); only the marker is
        cleared then."""
        st = self._load_staged(name)
        import shutil

        if st.get("commit_dir") and not self._dir_is_live(st["commit_dir"]):
            shutil.rmtree(st["commit_dir"], ignore_errors=True)
        os.remove(self._staged_path(name))

    def _write_manifest_file(self, name: str, entries: list) -> dict:
        """Write one immutable manifest chunk; return its pointer entry
        (name + bucket summary, so CoW can skip untouched manifests
        without opening them)."""
        _write_json(os.path.join(self._manifest_dir, name), entries)
        self._manifest_cache[name] = entries
        return {
            "name": name,
            "buckets": sorted({e["bucket"] for e in entries}),
            "n_files": len(entries),
        }

    def _commit(
        self,
        parent_ptr: dict,
        commit_seq: int,
        schema: T.StructType,
        manifests: list,
        batch_key: str | None,
        lineage_rec: dict,
        tok: str = "",
        ptr_overrides: dict | None = None,
    ) -> list[str]:
        """Write lineage + ledger chunks (unreferenced until the pointer
        lands), then hard-link the pointer — the single atomic commit
        point. A crash before the link leaves only orphans. Returns the
        aux file paths written by THIS attempt so a rebasing loser can
        remove them."""
        lineage_path = os.path.join(
            self._lineage_dir, f"lineage-{commit_seq:08d}{tok}.json"
        )
        _write_json(lineage_path, lineage_rec)
        tail, archives, chunks = self._roll_ledger(
            parent_ptr, batch_key, commit_seq, tok
        )
        aux = [lineage_path] + [
            os.path.join(self._manifest_dir, n) for n in chunks
        ]
        fids, next_id = self._assigned_field_ids(parent_ptr, schema)
        pointer = {
            "format_version": FORMAT_VERSION,
            # the winner's OWN aux files, recorded in the atomic pointer:
            # crash debris from a losing attempt at the same seq (same
            # glob pattern, different uuid token) can then never be
            # mistaken for this commit's lineage/manifests
            "lineage_file": os.path.basename(lineage_path),
            "seq": commit_seq,
            "parent_seq": parent_ptr["seq"],
            "snapshot_id": str(uuid.uuid4()),
            "schema": schema.jsonValue(),
            "key_cols": parent_ptr["key_cols"],
            "bucket_key": parent_ptr["bucket_key"],
            "n_buckets": parent_ptr["n_buckets"],
            "order_cols": parent_ptr["order_cols"],
            "seq_col": parent_ptr.get("seq_col"),
            "agg_cols": parent_ptr.get("agg_cols"),
            "field_ids": fids,
            "next_field_id": next_id,
            "legacy_cols": parent_ptr.get("legacy_cols"),
            "zorder": parent_ptr.get("zorder"),
            "zorder_files_per_bucket": parent_ptr.get("zorder_files_per_bucket"),
            "checks": parent_ptr.get("checks"),
            "manifests": manifests,
            "applied_tail": tail,
            "applied_archives": archives,
            "applied_count": parent_ptr["applied_count"]
            + (1 if batch_key is not None else 0),
            "committed_at_epoch": time.time(),
        }
        pointer.update(ptr_overrides or {})
        _commit_pointer(self._snap_dir, commit_seq, pointer)
        return aux

    def _commit_rebasing(
        self,
        parent_ptr: dict,
        schema: T.StructType,
        keep_manifests: list,
        new_files: list,
        batch_key: str | None,
        lineage_rec: dict,
        commit_dir: str | None,
        max_retries: int = 5,
        ptr_overrides: dict | None = None,
        on_rehome=None,
    ) -> dict | None:
        """Optimistic-concurrency commit (the Iceberg retry loop): attempt
        the hard-link; on losing the race, rebase onto the winner's
        snapshot and retry when the two commits commute.

        Commutes when: (a) every manifest this commit consumed (filtered
        or removed) is still present in the winner's snapshot — an
        append-only commit consumes none, so it always passes; a rewrite
        (compaction) passes unless the winner also rewrote the same
        manifests — and (b) the table has a ``seq_col``, because
        correctness of interleaved append+rewrite relies on reader-side
        max-seq dedup. Anything else raises ``ConcurrentCommitError``
        (true conflict).

        The rebase re-merges the schema over the winner's (preserving
        both sides' evolution), re-rolls the exactly-once ledger, renames
        the data dir to the new sequence, and removes the superseded
        attempt's aux files. Returns the committed lineage record, or
        None when a concurrent writer already applied ``batch_key``."""
        parent_names = {m["name"] for m in parent_ptr["manifests"]}
        keep_names = {m["name"] for m in keep_manifests}
        consumed = parent_names - keep_names
        rewritten = [m for m in keep_manifests if m["name"] not in parent_names]
        ptr = parent_ptr
        new_files = list(new_files)
        # write-time identity of the new files: the parquet bytes carry the
        # ENTRY schema's column names forever — a rebase may re-merge
        # ``schema`` with a winner's evolution (rename/drop/add), but the
        # id→name stamp must keep mapping the files' OWN column names to
        # the ids they carry data for (stable id when the field survives a
        # rename; the re-assigned id when the name is new or re-added)
        write_names = [f.name for f in schema.fields]
        parent_fids_entry = dict(parent_ptr.get("field_ids") or {})
        for attempt in range(max_retries + 1):
            commit_seq = ptr["seq"] + 1
            tok = f"-{uuid.uuid4().hex[:8]}"
            aux: list[str] = []
            manifests = [
                m for m in ptr["manifests"] if m["name"] not in consumed
            ] + list(rewritten)
            added_names: list[str] = []
            if new_files:
                # stamp the write-time id→name map (field-id evolution).
                # Recomputed per attempt, but always against WRITE-TIME
                # names: a field that survives (possibly renamed by a
                # racing winner) keeps its stable parent id; a name the
                # parent didn't track (our new column, or one whose id a
                # winner retired mid-race) takes the attempt's assignment.
                fids, _ = self._assigned_field_ids(ptr, schema)
                if fids is not None:
                    cur_ids = set(fids.values())
                    cmap = {}
                    for n in write_names:
                        x = parent_fids_entry.get(n)
                        if x is not None and x in cur_ids:
                            cmap[str(x)] = n
                        elif n in fids:
                            cmap[str(fids[n])] = n
                    for f in new_files:
                        f["cols"] = cmap
                name = f"manifest-{commit_seq:08d}{tok}.json"
                manifests.append(self._write_manifest_file(name, new_files))
                aux.append(os.path.join(self._manifest_dir, name))
                added_names.append(name)
            rec = {**lineage_rec, "commit_seq": commit_seq}
            try:
                aux += self._commit(
                    ptr, commit_seq, schema, manifests, batch_key, rec, tok,
                    {"added_manifests": added_names, **(ptr_overrides or {})},
                )
                return rec
            except ConcurrentCommitError:
                for p in aux:  # this attempt's files are unreferenced
                    if os.path.exists(p):
                        os.remove(p)
                    self._manifest_cache.pop(os.path.basename(p), None)
                    self._archive_cache.pop(os.path.basename(p), None)
                if attempt == max_retries:
                    raise
                new_ptr = self.pointer()
                if batch_key is not None and self.is_applied(batch_key, new_ptr):
                    return None  # winner applied the same batch: no-op replay
                present = {m["name"] for m in new_ptr["manifests"]}
                if not ptr.get("seq_col") or not consumed <= present:
                    raise ConcurrentCommitError(
                        f"concurrent commit at seq {commit_seq} conflicts: "
                        + (
                            "winner rewrote manifests this commit consumed"
                            if not consumed <= present
                            else "table has no seq_col (no reader-side "
                            "dedup), so interleaving is unsafe"
                        )
                    )
                if (
                    new_ptr["n_buckets"] != parent_ptr["n_buckets"]
                    or new_ptr["bucket_key"] != parent_ptr["bucket_key"]
                ):
                    raise ConcurrentCommitError(
                        "winner changed the bucket layout (rebucket) mid-race"
                        " — this commit's files were bucketed under the old "
                        "layout and would corrupt bucket pruning; re-read the"
                        " table and recompute the batch"
                    )
                old_fids = parent_ptr.get("field_ids")
                win_fids = new_ptr.get("field_ids")
                if old_fids is not None and win_fids is not None:
                    inv_win = {v: k for k, v in win_fids.items()}
                    if any(
                        fid not in inv_win or inv_win[fid] != n
                        for n, fid in old_fids.items()
                    ):
                        raise ConcurrentCommitError(
                            "winner renamed or dropped columns mid-race — a "
                            "by-name schema re-merge would resurrect the old "
                            "names; re-read the table and recompute the batch"
                        )
                schema = _merge_schema(
                    T.StructType.fromJson(new_ptr["schema"]), schema
                )
                if new_files and new_ptr["manifests"]:
                    # interleaving relies on reader-side max-seq dedup:
                    # once a winner's files exist, OUR files must be
                    # deltas (two racing FIRST commits would otherwise
                    # both land as 'base' and readers would skip dedup)
                    for f in new_files:
                        f["kind"] = "delta"
                if new_files and commit_dir:
                    # the dir name encodes the commit seq (read_changes
                    # recovers _commit_seq from it) — re-home it. The
                    # caller's intent persists BEFORE the rename (WAP):
                    # a crash at any instant leaves either the old dir +
                    # recorded prev, or the new dir + recorded paths —
                    # _load_staged recovers both.
                    new_dir = os.path.join(
                        self.path,
                        _DATA_DIR,
                        f"commit-{new_ptr['seq'] + 1:08d}-{uuid.uuid4().hex[:8]}",
                    )
                    if on_rehome is not None:
                        on_rehome(
                            new_dir,
                            [
                                dict(f, path=f["path"].replace(commit_dir, new_dir, 1))
                                for f in new_files
                            ],
                            commit_dir,
                        )
                    os.rename(commit_dir, new_dir)
                    for f in new_files:
                        f["path"] = f["path"].replace(commit_dir, new_dir, 1)
                    commit_dir = new_dir
                ptr = new_ptr

    def _stat_fields(self, df_schema: T.StructType) -> list[T.StructField]:
        """Columns to collect per-file min/max for: the key/bucket/order/seq
        columns (pruned by ``read_keys``/key predicates) plus every numeric,
        timestamp, and date column (pruned by ``read(where=...)``). Long
        free-text string columns outside the key set are skipped — their
        stats would bloat the JSON manifests for no pruning value."""
        ptr = self.pointer()
        keyish = {ptr["bucket_key"], *ptr["key_cols"], *ptr["order_cols"]}
        if ptr.get("seq_col"):
            keyish.add(ptr["seq_col"])
        out = []
        for f in df_schema.fields:
            if f.name == "__bucket":
                continue
            rangy = isinstance(
                f.dataType,
                (T.NumericType, T.TimestampType, T.TimestampNTZType, T.DateType),
            ) and not isinstance(f.dataType, T.DecimalType)
            # __deleted's [min, max] proves a file tombstone-free
            # (max=False) — the key to metadata-only count_live; two
            # booleans per file in the manifest JSON
            if (
                f.name in keyish or rangy or f.name == "__deleted"
            ) and _stat_supported(f.dataType):
                out.append(f)
        return out

    def _footer_stat_names(self, sample_path: str) -> tuple:
        """Stat-column names for a freshly written commit dir, derived
        from one file's parquet (arrow) schema — same selection rule as
        ``_stat_fields``; nested/exotic arrow types simply carry no
        stats."""
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_type

        fields = []
        for f in pq.read_schema(sample_path):
            try:
                fields.append(T.StructField(f.name, from_arrow_type(f.type), True))
            except Exception:
                continue
        return tuple(f.name for f in self._stat_fields(T.StructType(fields)))

    def _scan_commit_dir(self, commit_dir: str):
        """Per-file stats for a freshly written commit dir, harvested from
        the parquet FOOTERS — the just-written files' row-group statistics
        already hold min/max per column, so the commit path never re-reads
        data pages (r3's re-scan of every commit's output doubled write
        amplification and cost the ingest headline; VERDICT r03 #1).
        Collects min/max per stat column (key/order/seq/ts/numeric) —
        Iceberg-style data-skipping stats, used by ``read_keys`` and
        ``read(where=...)`` to prune files before the parquet scan (files
        are written sorted by the order columns, so key ranges per file
        are tight). Small commits read footers serially on the driver
        (sub-ms per footer, no job overhead); large commits fan the file
        list out as an RDD — valid ONLY when executors share the
        driver's filesystem (local[*], or a shared mount declared via
        ``spark.etl_rust_spark.sharedFs=true``), because the tasks open
        driver-visible paths. On a real multi-node cluster over
        node-local paths the harvest stays serial driver-side (footers
        are metadata-sized; a genuine object-store deployment would read
        them through the store's client instead).

        A commit dir with no part files (statically-empty batch) is
        genuinely empty; any OTHER footer-read failure propagates and
        aborts the commit BEFORE the pointer lands — swallowing it would
        record zero files while the batch key enters the ledger, silently
        dropping the batch (ADVICE r02)."""
        bucket_key = self.pointer()["bucket_key"]
        part_files = sorted(
            glob.glob(os.path.join(commit_dir, "**", "*.parquet"), recursive=True)
        )
        if not part_files:
            return [], 0, {}
        stat_names = self._footer_stat_names(part_files[0])
        # spark=None: the native streaming sink commits from a data-source
        # runner process with no SparkSession — footers harvest serially
        # (sub-ms each; a sink micro-batch is file-count-bounded anyway)
        shared_fs = self.spark is not None and (self.spark.conf.get(
            "spark.master", ""
        ).startswith("local") or (
            self.spark.conf.get("spark.etl_rust_spark.sharedFs", "false").lower()
            == "true"
        ))
        if shared_fs and len(part_files) > 64:
            n_slices = min(
                len(part_files),
                int(self.spark.conf.get("spark.sql.shuffle.partitions")),
            )
            entries = (
                self.spark.sparkContext.parallelize(part_files, n_slices)
                .map(lambda p: _footer_stats_entry(p, stat_names))
                .collect()
            )
            entries.sort(key=lambda e: e["path"])
        else:
            entries = [_footer_stats_entry(p, stat_names) for p in part_files]
        files, total, per_bucket = [], 0, {}
        for e in entries:
            n = int(e["rows"])
            if n == 0:
                continue
            m = re.search(r"__bucket=(\d+)", e["path"])
            if m is None:
                raise ValueError(
                    f"part file outside a __bucket= partition dir: {e['path']}"
                )
            b = int(m.group(1))
            stats = e["stats"]
            files.append(
                {
                    "path": e["path"],
                    "bucket": b,
                    "rows": n,
                    "bytes": e["bytes"],
                    # kmin/kmax kept for pointer-format back-compat
                    "kmin": stats.get(bucket_key, [None, None])[0],
                    "kmax": stats.get(bucket_key, [None, None])[1],
                    "stats": stats,
                    "nulls": e.get("nulls") or {},
                }
            )
            total += n
            per_bucket[b] = per_bucket.get(b, 0) + n
        return files, total, per_bucket

    def earliest_changes_seq(self) -> int:
        """The smallest ``since_seq`` a change-feed consumer can still
        resume from: ``read_changes(s)`` succeeds for every s at or
        above it. Retention moves it forward — a data commit whose
        per-commit manifests compaction folded and ``expire_snapshots``
        reclaimed is no longer individually replayable, and a rollback
        commit is a hard feed barrier (un-delivery is inexpressible) —
        so a consumer that fell behind compares its checkpoint against
        this BEFORE resuming, instead of discovering the 'changes
        expired' error mid-stream. O(commits) metadata walk, newest to
        oldest, no data I/O."""
        cur = self.current_seq()
        earliest = cur
        for s in range(cur, 0, -1):
            rec = self._lineage_record(s)
            if rec is None or rec["source"] == "rollback":
                break  # expired history / feed barrier: cannot span s
            if rec["source"] in (
                "compact", "rebucket", "rename", "drop",
                "rewrite_manifests", "clone"
            ):
                earliest = s - 1
                continue
            if rec["files_removed"] > 0:
                break  # copy-on-write commit: no per-file feed across it
            if rec["files_added"] > 0:
                names = self._added_manifests(s)
                if not names or not all(
                    os.path.exists(os.path.join(self._manifest_dir, n))
                    for n in names
                ):
                    break  # this commit's changes have been expired
            earliest = s - 1
        return earliest

    def read_changes(
        self,
        since_seq: int,
        until_seq: int | None = None,
        shard: tuple[int, int] | None = None,
    ) -> DataFrame:
        """Incremental change feed: the rows COMMITTED by snapshots
        (since_seq, until_seq] — the downstream-consumer API (a feature
        engine or index builder tails the table without rescanning it).

        ``shard=(i, k)`` keeps only files whose bucket ≡ i (mod k) —
        manifest-metadata pruning mirroring the icelite source's
        ``option("shard", "i/k")``, so a sharded feed consumer's JVM
        fast path reads exactly its slice.

        Reads ONLY the data files those commits added (pure manifest
        arithmetic, no diffing of row sets), annotated with
        ``_commit_seq``. Rows include ``__deleted`` tombstones and the
        ``__lsn`` guard column, so the feed is itself a replayable
        changelog. Exact for merge-on-read tables (each commit's files
        ARE the batch winners); compaction commits are skipped (they
        rewrite, not change); a copy-on-write commit in the range raises
        — its files mix changed rows with carried-over survivors, so no
        per-file change feed exists (use mode='mor' for tables with
        incremental consumers). Retention note: keep_last on
        expire_snapshots bounds how far back a consumer may resume.

        Additive (``agg_cols``) tables: each row is a per-key PARTIAL —
        the feed replays to table state by folding (sum/min/max), not by
        last-writer-wins; a downstream accumulator merges each batch
        into its own additive table and the fold composes exactly."""
        until = self.current_seq() if until_seq is None else until_seq
        entries, seqs = [], []
        for s in range(since_seq + 1, until + 1):
            rec = self._lineage_record(s)
            if rec is None:
                raise FileNotFoundError(f"no lineage record for commit {s}")
            if rec["source"] == "rollback":
                raise ValueError(
                    f"commit {s} is a rollback (state reverted to seq "
                    f"{rec.get('rolled_back_to')}) — a change feed cannot "
                    "express un-delivery; incremental consumers must "
                    "re-sync from a snapshot at or after the rollback"
                )
            if rec["source"] in (
                "compact", "rebucket", "rename", "drop",
                "rewrite_manifests", "clone"
            ):
                continue  # rewrites / metadata-only: not changes
            if rec["files_removed"] > 0:
                raise ValueError(
                    f"commit {s} is copy-on-write (rewrote files) — "
                    "incremental change reads require merge-on-read commits"
                )
            names = self._added_manifests(s)
            if not names:
                if rec["files_added"] > 0:
                    raise ValueError(
                        f"changes for commit {s} have been expired "
                        "(compaction folded them and expire_snapshots "
                        "removed the originals) — incremental consumers "
                        "must resume within the retention window"
                    )
                continue  # commit added no files (all-duplicate batch)
            for name in names:
                ents = self._read_manifest(name)
                if shard is not None:
                    ents = [
                        e for e in ents
                        if e["bucket"] % shard[1] == shard[0]
                    ]
                entries.extend(ents)
            seqs.append(s)
        until_ptr = self.pointer(until)
        schema = T.StructType.fromJson(until_ptr["schema"])
        if not entries:
            out = self.spark.createDataFrame([], schema)
            return out.withColumn("_commit_seq", F.lit(None).cast("long"))
        df = self._read_file_groups(entries, schema, until_ptr)
        # commit seq recovered from the data layout (data/commit-<seq>[-tok]/)
        return df.withColumn(
            "_commit_seq",
            F.regexp_extract(F.input_file_name(), r"commit-(\d{8})", 1).cast("long"),
        )

    def read_changes_with_preimage(
        self, since_seq: int, until_seq: int | None = None
    ) -> DataFrame:
        """The change feed with BEFORE-images (Debezium's ``before`` /
        Delta CDF's ``update_preimage``, public semantics): every change
        row additionally carries ``_before`` — a struct of the key's
        winning state BEFORE this commit applied (NULL on first
        appearance; a tombstone state appears as ``__deleted=true``).
        Downstream diff/audit consumers read old and new in one row
        instead of self-joining the feed.

        Before-state is exact under late data: the previous winner is
        max-by-``seq_col`` over everything delivered at EARLIER commits
        (base snapshot at ``since_seq`` ∪ feed), so a late lower-LSN
        change correctly shows the state that beat it. One lag-style
        window per KEY ordered by commit seq (feeds deliver one winner
        per key per commit, so the frame is well-defined); per-key
        histories are bounded, partitions scale with key count — the
        same granularity argument as the transition-matrix op. Requires
        ``seq_col`` (as the feed itself does under MoR)."""
        until = self.current_seq() if until_seq is None else until_seq
        ptr = self.pointer(until)
        if not ptr.get("seq_col"):
            raise ValueError("read_changes_with_preimage requires a seq_col table")
        if ptr.get("agg_cols"):
            raise ValueError(
                "read_changes_with_preimage is undefined for additive "
                "(agg_cols) tables — a key's pre-state is a FOLD over all "
                "earlier partials, not a single previous winner; diff two "
                "folded snapshots (read(seq=a) vs read(seq=b)) instead"
            )
        keys, seq_col = ptr["key_cols"], ptr["seq_col"]
        schema = T.StructType.fromJson(ptr["schema"])
        payload = [f.name for f in schema.fields if f.name not in keys]
        feed = self.read_changes(since_seq, until)
        base = self.read(seq=since_seq).withColumn(
            "_commit_seq", F.lit(since_seq).cast("long")
        )
        # Align the base snapshot (schema at since_seq) to the feed's
        # schema (at until): a column ADDED inside the window is
        # null-filled in the base (mirroring merge's upsert column
        # alignment), one RENAMED inside it is resolved through its
        # field id so before-state survives the rename, and one DROPPED
        # inside it is projected away. A bare unionByName would throw
        # AnalysisException on any of these (ADVICE r04).
        ids_until = ptr.get("field_ids") or {}
        try:
            ids_since = (
                self.pointer(since_seq).get("field_ids") or {}
                if since_seq > 0
                else {}
            )
        except FileNotFoundError:
            ids_since = {}
        id_to_since_name = {v: k for k, v in ids_since.items()}
        base_cols = set(base.columns)
        feed_types = {f.name: f.dataType for f in feed.schema.fields}

        def _base_col(name):
            if name in base_cols:
                return F.col(name).alias(name)
            old = id_to_since_name.get(ids_until.get(name))
            if old is not None and old in base_cols:
                return F.col(old).cast(feed_types[name]).alias(name)
            return F.lit(None).cast(feed_types[name]).alias(name)

        base = base.select([_base_col(c) for c in feed.columns])
        both = base.unionByName(feed)
        w = (
            Window.partitionBy(*keys)
            .orderBy("_commit_seq")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        # running winner over earlier commits: struct max is ordered by
        # its FIRST field, so seq_col leads — the same max-by trick as
        # the merge dedup
        prev = F.max(
            F.struct(F.col(seq_col).alias(seq_col), *[F.col(c) for c in payload if c != seq_col])
        ).over(w)
        return (
            both.withColumn("_before", prev)
            .filter(F.col("_commit_seq") > F.lit(since_seq))
        )

    def _added_manifests(self, s: int) -> list[str]:
        """Names of the DATA manifest(s) written by commit ``s``. The
        committed pointer records its own manifests (``added_manifests``,
        v3) — the authoritative source, immune to crash debris from a
        LOSING attempt at the same seq (same glob pattern, different uuid
        token). Pre-v3 pointers fall back to the glob."""
        try:
            recorded = self.pointer(s).get("added_manifests")
        except FileNotFoundError:
            recorded = None
        if recorded is not None:
            return list(recorded)
        pat = re.compile(rf"manifest-{s:08d}(-[0-9a-f]{{8}})?\.json")
        return sorted(
            os.path.basename(p)
            for p in glob.glob(
                os.path.join(self._manifest_dir, f"manifest-{s:08d}*.json")
            )
            if pat.fullmatch(os.path.basename(p))
        )

    def _lineage_record(self, s: int) -> dict | None:
        """The lineage record the WINNING commit at seq ``s`` wrote —
        resolved through the pointer's own ``lineage_file`` (v3) so an
        aborted attempt's orphan lineage can never be read in its place;
        glob fallback for pre-v3 pointers."""
        try:
            rec_name = self.pointer(s).get("lineage_file")
        except FileNotFoundError:
            rec_name = None
        if rec_name is not None:
            for d in (self._lineage_dir, self._main_lineage_dir):
                p = os.path.join(d, rec_name)
                if os.path.exists(p):
                    with open(p) as f:
                        return json.load(f)
            return None
        cands = sorted(
            glob.glob(os.path.join(self._lineage_dir, f"lineage-{s:08d}*.json"))
        )
        if not cands:
            return None
        with open(cands[0]) as f:
            return json.load(f)

    # ------------------------------------------------------------- maintain
    def _filter_manifests(
        self,
        ptr: dict,
        tset: set[int],
        commit_seq: int,
        only_deltas: bool = False,
    ):
        """Drop ``tset`` buckets' entries from the manifest list: untouched
        manifests carry forward by reference; intersecting ones are
        rewritten filtered. ``only_deltas`` restricts the drop to
        delta-kind entries (minor compaction: base files survive in
        place). Returns (kept manifests, removed file entries).
        Shared by CoW merge and partial/minor compaction."""
        def _goes(e: dict) -> bool:
            return e["bucket"] in tset and (
                not only_deltas or e.get("kind", "base") == "delta"
            )

        keep, removed = [], []
        tok = uuid.uuid4().hex[:8]  # collision-free across racing writers
        for i, m in enumerate(ptr["manifests"]):
            if tset & set(m["buckets"]):
                entries = self._read_manifest(m["name"])
                gone = [e for e in entries if _goes(e)]
                if not gone:
                    keep.append(m)
                    continue
                removed.extend(gone)
                survivors = [e for e in entries if not _goes(e)]
                if survivors:
                    keep.append(
                        self._write_manifest_file(
                            f"manifest-{commit_seq:08d}-r{i:04d}-{tok}.json",
                            survivors,
                        )
                    )
            else:
                keep.append(m)
        return keep, removed

    def _zorder_key(self, df: DataFrame, cols: list[str]):
        """Morton (bit-interleaved) sort key over ``cols`` — multi-column
        file clustering so min/max stats prune on EVERY z-ordered column,
        not just the leading sort column (the Iceberg/Delta OPTIMIZE
        ZORDER move; public technique, Morton 1966). Each column is
        scaled to 16 bits against its global [min, max] (one tiny agg —
        2 values/column on the driver), then bits interleave JVM-side
        (pure codegen shifts/ors; no Python in the row path)."""
        exprs = []
        for c in cols:
            fld = next(f for f in df.schema.fields if f.name == c)
            e = _stat_expr(fld)
            if e is None or isinstance(fld.dataType, (T.StringType, T.BooleanType)):
                raise ValueError(f"zorder column must be numeric/temporal: {c}")
            exprs.append(e.cast("double"))
        bounds = df.agg(
            *[F.min(e).alias(f"lo{i}") for i, e in enumerate(exprs)],
            *[F.max(e).alias(f"hi{i}") for i, e in enumerate(exprs)],
        ).collect()[0]
        quant = []
        for i, e in enumerate(exprs):
            lo = float(bounds[f"lo{i}"] if bounds[f"lo{i}"] is not None else 0.0)
            hi = float(bounds[f"hi{i}"] if bounds[f"hi{i}"] is not None else 0.0)
            span = (hi - lo) or 1.0
            q = F.least(
                F.lit(65535),
                F.greatest(F.lit(0), ((e - F.lit(lo)) / F.lit(span) * 65535).cast("int")),
            )
            quant.append(F.coalesce(q, F.lit(0)).cast("long"))
        n = len(quant)
        z = F.lit(0).cast("long")
        for b in range(16):
            for i, q in enumerate(quant):
                bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
                z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
        return z

    def compact(
        self,
        min_files_per_bucket: int | None = None,
        zorder: list[str] | None = None,
        files_per_bucket: int | None = None,
    ) -> dict:
        """Small-file compaction after many micro-batch commits.

        Default: rewrite the whole live file set into one file per bucket
        and fold ALL manifests into one (metadata compaction rides data
        compaction). ``min_files_per_bucket``: PARTIAL compaction — only
        buckets holding more than that many files are rewritten; at 100 TB
        this is the only affordable policy (whole-table compaction is an
        O(table) job; partial compaction is O(hot buckets), and MoR dedup
        is per-key so compacting a bucket subset is always safe).

        ``zorder`` persists: once a compaction z-orders, later plain
        ``compact()`` calls keep the clustered layout (pointer
        ``zorder``/``zorder_files_per_bucket``) — otherwise the nightly
        maintenance job would silently destroy the clustering the
        expensive OPTIMIZE run paid for. Pass ``zorder=[]`` to clear.

        ``files_per_bucket`` WITHOUT zorder splits each compacted bucket
        into ~that many files, range-partitioned on the ORDER columns
        (each file covers a tight, disjoint key range, so per-file stats
        keep point lookups at ~one file per bucket). One file per bucket
        — the default — is right until buckets outgrow a single file; at
        100 TB a 64-bucket table compacts to multi-GB files and the split
        is the knob that caps file size without a full rebucket."""
        self._require_main("compact")
        ptr = self.pointer()
        split = files_per_bucket  # explicit request (pre-default capture)
        if zorder is None:
            zorder = ptr.get("zorder") or None
            if files_per_bucket is None:
                files_per_bucket = ptr.get("zorder_files_per_bucket") or 4
        elif not zorder:  # explicit [] clears the persisted layout
            zorder = None
        if files_per_bucket is None:
            files_per_bucket = 4
        schema = T.StructType.fromJson(ptr["schema"])
        commit_seq = ptr["seq"] + 1
        if min_files_per_bucket is not None:
            per_bucket_files: dict[int, int] = {}
            for f in self._files(ptr):
                per_bucket_files[f["bucket"]] = per_bucket_files.get(f["bucket"], 0) + 1
            target = {b for b, n in per_bucket_files.items() if n > min_files_per_bucket}
            if not target:
                return self.snapshot()
            df = self.read(buckets=target)
            keep_manifests, removed = self._filter_manifests(ptr, target, commit_seq)
        else:
            target = None
            df = self.read()
            keep_manifests = []
            removed = self._files(ptr)
        commit_dir = os.path.join(
            self.path, _DATA_DIR, f"commit-{commit_seq:08d}-{uuid.uuid4().hex[:8]}"
        )
        bexpr = _bucket_expr(ptr["bucket_key"], ptr["n_buckets"])
        if zorder:
            # z-ordered layout: several files per bucket, each covering a
            # tight morton range, so read(where=...) prunes on every
            # z-ordered column (stats per file stay exact — they're
            # collected from the written rows, whatever the order)
            zkey = self._zorder_key(df, list(zorder))
            n_parts = max(1, len(target or range(ptr["n_buckets"]))) * max(
                1, int(files_per_bucket)
            )
            writer = (
                df.withColumn("__bucket", bexpr)
                .withColumn("__z", zkey)
                .repartitionByRange(n_parts, F.col("__bucket"), F.col("__z"))
                .sortWithinPartitions("__bucket", "__z")
                .drop("__z")
            )
        elif split and int(split) > 1:
            # plain (non-zorder) multi-file layout: range-partition on
            # (bucket, order cols) so each file holds a contiguous slice
            # of its bucket's key space — stats stay tight, point lookups
            # still prune to ~one file. partitionBy re-splits any sampled
            # range that straddles a bucket boundary.
            n_parts = max(1, len(target or range(ptr["n_buckets"]))) * int(split)
            writer = (
                df.withColumn("__bucket", bexpr)
                .repartitionByRange(
                    n_parts,
                    F.col("__bucket"),
                    *[F.col(c) for c in ptr["order_cols"]],
                )
                .sortWithinPartitions("__bucket", *ptr["order_cols"])
            )
        else:
            writer = (
                df.withColumn("__bucket", bexpr)
                .repartition(F.col("__bucket"))
                .sortWithinPartitions("__bucket", *ptr["order_cols"])
            )
        (
            writer.write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(commit_dir)
        )
        new_files, rows_written, per_bucket = self._scan_commit_dir(commit_dir)
        lineage_rec = {
            "commit_seq": commit_seq, "batch_key": None, "source": "compact",
            "n_changes": 0, "n_upserts": 0, "n_deletes": 0,
            "touched_buckets": sorted(per_bucket), "files_added": len(new_files),
            "files_removed": len(removed), "rows_written": int(rows_written),
            "per_bucket_rows": {str(k): int(v) for k, v in per_bucket.items()},
            "wall_ms": 0.0,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._commit_rebasing(
            ptr, schema, keep_manifests, new_files, None, lineage_rec, commit_dir,
            ptr_overrides={
                "zorder": list(zorder) if zorder else None,
                "zorder_files_per_bucket": int(files_per_bucket) if zorder else None,
            },
        )
        return self.snapshot()

    def compact_deltas(self, min_delta_files_per_bucket: int = 4) -> dict:
        """MINOR compaction (the LSM move; Hudi's log-file compaction
        analog): fold each over-fragmented bucket's DELTA files into one
        fresh delta file per bucket — base files are never read or
        rewritten. Write amplification is bounded by the bucket's DELTA
        bytes, not its total bytes: at 100 TB a hot bucket is typically
        one large sorted base file plus a trickle of small micro-batch
        deltas, and full partial compaction (``compact(min_files_per_
        bucket=...)``) would rewrite the giant base just to fold the
        trickle. This folds only the trickle.

        Exactness: read-time resolution is per-key max-seq last-writer-
        wins (or the declared additive fold) over base ∪ deltas, and both
        resolutions are associative — collapsing the delta rows of a key
        to their local winner (or combined partial) first cannot change
        the global winner against the untouched base. Tombstone winners
        are KEPT in the folded output (they may shadow base rows).
        Commits as ``source='compact'`` with ``minor=true`` in lineage,
        so every change-feed consumer skips it like any compaction;
        rebases over concurrent appends (their manifests are untouched).
        Reference analog: the reference's sink has no file layout to
        maintain (Postgres upserts, example/src/main.rs:305-622)."""
        self._require_main("compact_deltas")
        t0 = time.monotonic()
        ptr = self.pointer()
        if not ptr.get("seq_col"):
            raise ValueError("compact_deltas requires a seq_col table")
        schema = T.StructType.fromJson(ptr["schema"])
        commit_seq = ptr["seq"] + 1
        per_bucket: dict[int, int] = {}
        for f in self._files(ptr):
            if f.get("kind", "base") == "delta":
                per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
        target = {
            b for b, n in per_bucket.items() if n > min_delta_files_per_bucket
        }
        if not target:
            return self.snapshot()
        keep_manifests, removed = self._filter_manifests(
            ptr, target, commit_seq, only_deltas=True
        )
        df = self._read_file_groups(removed, schema, ptr)
        df = _resolve_versions(df, ptr, schema)
        commit_dir = os.path.join(
            self.path, _DATA_DIR, f"commit-{commit_seq:08d}-{uuid.uuid4().hex[:8]}"
        )
        bexpr = _bucket_expr(ptr["bucket_key"], ptr["n_buckets"])
        (
            df.withColumn("__bucket", bexpr)
            .repartition(F.col("__bucket"))
            .sortWithinPartitions("__bucket", *ptr["order_cols"])
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(commit_dir)
        )
        new_files, rows_written, per_bucket_rows = self._scan_commit_dir(commit_dir)
        for f in new_files:
            f["kind"] = "delta"  # folded winners still resolve against base
        lineage_rec = {
            "commit_seq": commit_seq, "batch_key": None, "source": "compact",
            "minor": True,
            "n_changes": 0, "n_upserts": 0, "n_deletes": 0,
            "touched_buckets": sorted(per_bucket_rows),
            "files_added": len(new_files),
            "files_removed": len(removed), "rows_written": int(rows_written),
            "per_bucket_rows": {
                str(k): int(v) for k, v in per_bucket_rows.items()
            },
            "wall_ms": round((time.monotonic() - t0) * 1000.0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._commit_rebasing(
            ptr, schema, keep_manifests, new_files, None, lineage_rec,
            commit_dir,
        )
        return self.snapshot()

    def rewrite_manifests(self, target_files_per_manifest: int = 4096) -> dict:
        """Metadata-only manifest consolidation — Iceberg's
        ``rewrite_manifests`` procedure re-expressed over the pointer
        model: fold the accumulated per-commit manifest chunks into few
        large ones WITHOUT touching a single data file. An append-heavy
        merge-on-read table gains one manifest per commit; every read
        opens them all and every commit re-lists them in the pointer, so
        metadata work creeps toward O(commits since last compaction).
        Data compaction folds manifests too — but at the price of a data
        rewrite; this is the cheap move when the FILES are healthy
        (well-sized deltas) and only the metadata is fragmented.

        File entries carry over VERBATIM (paths, footer stats, delta/base
        kind, write-time id→name maps — so field-id resolution, MoR fold
        triggers, and stats pruning are byte-identical after the rewrite),
        sorted by bucket so each consolidated manifest covers a narrow
        bucket range: the pointer's per-manifest bucket summary keeps
        letting CoW merges and partial compaction skip whole manifests
        unopened. Commits through the optimistic-rebase path, so racing
        appends commute (their new manifests survive the rebase); the
        change feed and streaming source skip the commit
        (``source='rewrite_manifests'`` — a rewrite is not a change);
        time travel to pre-rewrite snapshots resolves through the old
        manifest files until ``expire_snapshots`` reclaims them. Main-only
        like all maintenance. The reference needs no analog (its sink is
        Postgres, example/src/main.rs:305-622); a 10^6-commit lake table
        does."""
        self._require_main("rewrite_manifests")
        t0 = time.monotonic()
        ptr = self.pointer()
        k = max(1, int(target_files_per_manifest))
        entries = self._files(ptr)
        n_target = max(1, -(-len(entries) // k))  # ceil; ≥1 even when empty
        if len(ptr["manifests"]) <= n_target:
            return self.snapshot()  # already consolidated — no-op
        entries.sort(key=lambda e: (e["bucket"], e["path"]))
        commit_seq = ptr["seq"] + 1
        tok = uuid.uuid4().hex[:8]  # collision-free across racing writers
        rewritten = [
            self._write_manifest_file(
                f"manifest-{commit_seq:08d}-rw{i:04d}-{tok}.json",
                entries[i * k : (i + 1) * k],
            )
            for i in range(n_target)
        ]
        lineage_rec = {
            "commit_seq": commit_seq, "batch_key": None,
            "source": "rewrite_manifests",
            "n_changes": 0, "n_upserts": 0, "n_deletes": 0,
            "touched_buckets": [], "files_added": 0, "files_removed": 0,
            "rows_written": 0,
            "manifests_before": len(ptr["manifests"]),
            "manifests_after": n_target,
            "wall_ms": round((time.monotonic() - t0) * 1000.0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._commit_rebasing(
            ptr, T.StructType.fromJson(ptr["schema"]), rewritten, [],
            None, lineage_rec, None,
        )
        return self.snapshot()

    def rebucket(self, new_n_buckets: int) -> dict:
        """Rewrite the table under a NEW bucket count — the growth move
        when a table outgrows its create-time ``n_buckets`` (more buckets
        = finer file pruning + more write parallelism; at 100 TB the
        bucket count that was right at 1 TB starves pruning). One
        full-table rewrite job, like Iceberg's partition-spec evolution
        done eagerly. NON-rebasing: a concurrent commit during the
        rewrite raises (mixing two bucket layouts in one snapshot would
        corrupt bucket pruning); schedule rebuckets in a quiet window."""
        self._require_main("rebucket")
        t0 = time.monotonic()
        ptr = self.pointer()
        schema = T.StructType.fromJson(ptr["schema"])
        commit_seq = ptr["seq"] + 1
        df = self.read()  # live state (max-seq dedup'd; tombstones kept)
        commit_dir = os.path.join(
            self.path, _DATA_DIR, f"commit-{commit_seq:08d}-{uuid.uuid4().hex[:8]}"
        )
        bexpr = _bucket_expr(ptr["bucket_key"], int(new_n_buckets))
        (
            df.withColumn("__bucket", bexpr)
            .repartition(F.col("__bucket"))
            .sortWithinPartitions("__bucket", *ptr["order_cols"])
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(commit_dir)
        )
        new_files, rows_written, per_bucket = self._scan_commit_dir(commit_dir)
        lineage_rec = {
            "commit_seq": commit_seq, "batch_key": None, "source": "rebucket",
            "n_changes": 0, "n_upserts": 0, "n_deletes": 0,
            "touched_buckets": sorted(per_bucket), "files_added": len(new_files),
            "files_removed": len(self._files(ptr)),
            "rows_written": int(rows_written),
            "per_bucket_rows": {str(k): int(v) for k, v in per_bucket.items()},
            "wall_ms": round((time.monotonic() - t0) * 1000.0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._commit_rebasing(
            ptr, schema, [], new_files, None, lineage_rec, commit_dir,
            max_retries=0, ptr_overrides={"n_buckets": int(new_n_buckets)},
        )
        return self.snapshot()

    # ------------------------------------------------------- snapshot tags
    def _tag_path(self, name: str) -> str:
        if not re.fullmatch(r"[A-Za-z0-9_.-]+", name):
            raise ValueError(f"invalid tag name: {name!r}")
        return os.path.join(self._manifest_dir, f"tag-{name}.json")

    def tag_snapshot(self, name: str, seq: int | None = None) -> int:
        """Pin a snapshot under a NAME (Iceberg tags): `read(tag=...)`
        resolves it, and `expire_snapshots` will NOT expire a tagged
        snapshot — the audit/reproducibility pin ("the exact table the
        March run trained on"). Defaults to the current snapshot."""
        self._require_main("tag_snapshot")
        seq = self.current_seq() if seq is None else int(seq)
        if not os.path.exists(self._pointer_path(seq)):
            raise FileNotFoundError(f"no snapshot {seq} to tag")
        _write_json(self._tag_path(name), {"name": name, "seq": seq,
                                           "tagged_at": time.time()})
        return seq

    def tags(self) -> dict[str, int]:
        out = {}
        for p in glob.glob(os.path.join(self._manifest_dir, "tag-*.json")):
            with open(p) as f:
                t = json.load(f)
            out[t["name"]] = int(t["seq"])
        return out

    def drop_tag(self, name: str) -> None:
        p = self._tag_path(name)
        if not os.path.exists(p):
            raise FileNotFoundError(f"no tag {name!r}")
        os.remove(p)

    # -------------------------------------------------------------- branches
    def _require_main(self, op: str) -> None:
        if self.branch is not None:
            raise ValueError(
                f"{op} operates on the MAIN ref only (this handle is on "
                f"branch {self.branch!r}); fast_forward the branch first"
            )

    def create_branch(self, name: str, at_seq: int | None = None) -> "IceliteTable":
        """Fork a NAMED BRANCH at a snapshot (Iceberg branch refs,
        https://iceberg.apache.org/docs/latest/branching/): an O(1)
        metadata fork — the base pointer is HARD-LINKED into the branch's
        own chain dir, data files are shared, and subsequent commits on
        the returned handle (``apply_changes``/``merge`` work unchanged)
        extend the branch without touching main. The multi-commit
        write-audit-publish surface: single-batch audits use
        ``stage_as``; a backfill/repair spanning several commits lands on
        a branch, is validated with ``read()``/``read_changes()`` on the
        branch handle, then ``fast_forward`` publishes it atomically-ish
        (pointer links, crash-resumable) or ``delete_branch`` abandons it
        (orphan GC reclaims the branch's files). Reference analog: the
        reference validates a whole load before exposing it
        (/root/reference/src/etl/processor.rs batch pipeline); branches
        are that gate generalized to N commits."""
        self._require_main("create_branch")
        _check_branch_name(name)
        at_seq = self.current_seq() if at_seq is None else int(at_seq)
        src = self._pointer_path(at_seq)
        if not os.path.exists(src):
            raise FileNotFoundError(f"no snapshot {at_seq} to branch from")
        bdir = os.path.join(self._manifest_dir, f"branch-{name}")
        if os.path.isdir(bdir):
            raise FileExistsError(f"branch {name!r} already exists")
        os.makedirs(os.path.join(self._main_lineage_dir, f"branch-{name}"),
                    exist_ok=True)
        os.makedirs(bdir, exist_ok=True)
        os.link(src, os.path.join(bdir, f"snap-{at_seq:08d}.json"))
        return IceliteTable(self.spark, self.path, branch=name)

    def branches(self) -> dict[str, dict]:
        """name → {fork_seq, tip_seq} for every live branch."""
        out: dict[str, dict] = {}
        for d in sorted(glob.glob(os.path.join(self._manifest_dir, "branch-*"))):
            if not os.path.isdir(d):
                continue
            seqs = [
                int(os.path.basename(p)[5:13])
                for p in glob.glob(os.path.join(d, "snap-*.json"))
            ]
            if seqs:
                out[os.path.basename(d)[7:]] = {
                    "fork_seq": min(seqs), "tip_seq": max(seqs)
                }
        return out

    def branch_table(self, name: str) -> "IceliteTable":
        return IceliteTable(self.spark, self.path, branch=name)

    def delete_branch(self, name: str) -> None:
        """Drop the branch's pointer chain (and its lineage records).
        Files referenced ONLY by the branch become unreferenced and are
        reclaimed by ``remove_orphans`` after its grace window — shared
        (pre-fork or published) files are hard-link/live-set protected."""
        self._require_main("delete_branch")
        import shutil

        bdir = os.path.join(self._manifest_dir, f"branch-{name}")
        if not os.path.isdir(bdir):
            raise FileNotFoundError(f"no branch {name!r}")
        shutil.rmtree(bdir)
        shutil.rmtree(
            os.path.join(self._main_lineage_dir, f"branch-{name}"),
            ignore_errors=True,
        )

    def fast_forward(self, name: str) -> dict:
        """Publish branch ``name`` into main (Iceberg's
        ``fast_forward``): requires main unchanged since the fork point —
        the branch's pointers ARE then main's next commits, so publishing
        is one hard-link per branch commit (lineage first, then the
        pointer: the atomic visibility point), in seq order. Crash
        mid-publish leaves a valid main prefix; re-running resumes
        idempotently (already-linked seqs are verified by snapshot_id and
        skipped). Main advanced past the fork → ConcurrentCommitError
        (divergence never silently merges). The branch's exactly-once
        ledger rides the pointers, so a batch applied on the branch stays
        a no-op replay after publish."""
        self._require_main("fast_forward")
        bdir = os.path.join(self._manifest_dir, f"branch-{name}")
        if not os.path.isdir(bdir):
            raise FileNotFoundError(f"no branch {name!r}")
        seqs = sorted(
            int(os.path.basename(p)[5:13])
            for p in glob.glob(os.path.join(bdir, "snap-*.json"))
        )
        if not seqs:
            raise FileNotFoundError(f"branch {name!r} has no snapshots")
        fork, tip = seqs[0], seqs[-1]
        if seqs != list(range(fork, tip + 1)):
            raise ValueError(f"branch {name!r} chain has gaps: {seqs}")
        blin = os.path.join(self._main_lineage_dir, f"branch-{name}")

        def _bptr(s: int) -> dict:
            with open(os.path.join(bdir, f"snap-{s:08d}.json")) as f:
                return json.load(f)

        base = self._pointer_path(fork)
        if os.path.exists(base):
            if json.load(open(base))["snapshot_id"] != _bptr(fork)["snapshot_id"]:
                raise ConcurrentCommitError(
                    f"branch {name!r} fork base (seq {fork}) does not match "
                    "main's snapshot at that seq — refork and retry"
                )
        published = 0
        for s in range(fork + 1, tip + 1):
            bp = _bptr(s)
            mp = self._pointer_path(s)
            if os.path.exists(mp):
                if json.load(open(mp))["snapshot_id"] == bp["snapshot_id"]:
                    continue  # resumed publish: this seq already landed
                raise ConcurrentCommitError(
                    f"main advanced past the fork point (seq {s} differs); "
                    f"fast_forward requires main unchanged since seq {fork}"
                )
            lf = bp.get("lineage_file")
            if lf and os.path.exists(os.path.join(blin, lf)):
                dst = os.path.join(self._main_lineage_dir, lf)
                if not os.path.exists(dst):
                    os.link(os.path.join(blin, lf), dst)
            try:
                os.link(os.path.join(bdir, f"snap-{s:08d}.json"), mp)
            except FileExistsError:
                if json.load(open(mp))["snapshot_id"] == bp["snapshot_id"]:
                    continue
                raise ConcurrentCommitError(
                    f"concurrent main commit at seq {s} during fast_forward"
                ) from None
            published += 1
        return {"branch": name, "fork_seq": fork, "tip_seq": tip,
                "published": published}

    def clone(self, dest_path: str, seq: int | None = None) -> "IceliteTable":
        """Export one snapshot as a NEW independent table at ``dest_path``
        — Delta's SHALLOW CLONE / Iceberg snapshot-export (public
        semantics) re-expressed for the pointer model: the backup / DR /
        dev-fork move ``create_branch`` does not cover, because a branch
        lives inside the source's directory and shares its GC domain,
        while a clone survives the source's retention, compaction, even
        an ``rm -rf`` of the source tree.

        Data files are HARD-LINKED into the clone (O(files) driver-side
        metadata work like the rest of the metadata layer, zero bytes
        moved on one filesystem; cross-device falls back to a real
        copy). A link is immune to source-side compact/expire/GC —
        unlinking only drops the refcount — and data files are immutable
        by construction, so sharing them is safe. File entries carry
        over VERBATIM (footer stats, delta/base kind, write-time
        id→name maps) with only the path rewritten, so MoR folding,
        stats pruning, and field-id resolution are byte-identical on
        the clone.

        The applied-batch ledger carries over too: the WAL feed that
        was driving the source can resume against the clone without
        re-applying delivered batches — restore-and-continue DR
        (``seq=`` exports any retained snapshot, i.e. point-in-time
        restore). History does NOT carry: the clone is born with one
        commit holding the whole state, and that commit is a NON-change
        source (``source='clone'``, skipped by ``read_changes`` and the
        streaming source exactly like a compaction) because its files
        can hold several versions of one key (carried MoR deltas) and
        the feed contract is one winner per key per commit — downstream
        consumers bootstrap from ``read()`` and tail from the clone's
        seq 1, the standard CDC snapshot-bootstrap. The lineage record
        keeps the origin path / seq / snapshot_id auditable. Tags and
        branches are source-local and stay behind. Main-only."""
        import shutil

        self._require_main("clone")
        t0 = time.monotonic()
        ptr = self.pointer(seq)
        dest = os.path.abspath(dest_path)
        mdir = os.path.join(dest, _MANIFEST_DIR)
        if os.path.isdir(mdir):
            raise FileExistsError(f"Icelite table already exists: {dest}")
        os.makedirs(mdir, exist_ok=True)
        os.makedirs(os.path.join(dest, _LINEAGE_DIR), exist_ok=True)
        ddir = os.path.join(dest, _DATA_DIR)
        os.makedirs(ddir, exist_ok=True)

        src_ddir = os.path.join(self.path, _DATA_DIR)
        entries, rows = [], 0
        for e in self._files(ptr):
            # preserve the path UNDER the data dir: files live in
            # commit-<seq>[-tok]/ dirs whose basenames collide across
            # commits, and the uuid tokens keep carried dirs collision-
            # free with the clone's own future commit dirs
            rel = os.path.relpath(e["path"], src_ddir)
            new_path = os.path.join(ddir, rel)
            os.makedirs(os.path.dirname(new_path), exist_ok=True)
            try:
                os.link(e["path"], new_path)
            except OSError:
                shutil.copy2(e["path"], new_path)
            ne = dict(e)
            ne["path"] = new_path
            entries.append(ne)
            rows += int(e.get("rows") or 0)
        entries.sort(key=lambda x: (x["bucket"], x["path"]))

        base = {
            k: ptr[k]
            for k in (
                "format_version", "schema", "key_cols", "bucket_key",
                "n_buckets", "order_cols", "seq_col", "agg_cols",
                "field_ids", "next_field_id",
            )
        }
        # evolution/layout state the carried files depend on (dropped-
        # column masking, z-order split hints) must travel with them,
        # as must writer-side CHECK constraints
        for k in ("legacy_cols", "zorder", "zorder_files_per_bucket", "checks"):
            base[k] = ptr.get(k)
        zero = dict(
            base, seq=0, parent_seq=None, snapshot_id=str(uuid.uuid4()),
            manifests=[], applied_tail={}, applied_archives=[],
            applied_count=0, committed_at_epoch=time.time(),
        )
        _commit_pointer(mdir, 0, zero)

        applied = self._applied(ptr)
        if len(applied) <= _TAIL_MAX:
            tail, archives = dict(applied), []
        else:  # one immutable merged chunk, same shape _roll_ledger emits
            name = "applied-00000001-clone.json"
            _write_json(os.path.join(mdir, name), applied)
            tail, archives = {}, [name]
        per = 4096  # same default chunking as rewrite_manifests
        n_chunks = max(1, -(-len(entries) // per))
        manifests = []
        for i in range(n_chunks):
            chunk = entries[i * per : (i + 1) * per]
            name = f"manifest-00000001-clone{i:04d}.json"
            _write_json(os.path.join(mdir, name), chunk)
            manifests.append({
                "name": name,
                "buckets": sorted({c["bucket"] for c in chunk}),
                "n_files": len(chunk),
            })
        lineage_rec = {
            "commit_seq": 1, "batch_key": None, "source": "clone",
            "origin": {"path": self.path, "seq": ptr["seq"],
                       "snapshot_id": ptr["snapshot_id"]},
            "n_changes": rows, "n_upserts": rows, "n_deletes": 0,
            "touched_buckets": sorted({c["bucket"] for c in entries}),
            "files_added": len(entries), "files_removed": 0,
            "rows_written": 0,
            "wall_ms": round((time.monotonic() - t0) * 1000.0, 3),
            "committed_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
        }
        _write_json(
            os.path.join(dest, _LINEAGE_DIR, "lineage-00000001.json"),
            lineage_rec,
        )
        one = dict(
            base, seq=1, parent_seq=0, snapshot_id=str(uuid.uuid4()),
            manifests=manifests, applied_tail=tail,
            applied_archives=archives, applied_count=len(applied),
            committed_at_epoch=time.time(),
            # v3 authoritative self-records: the change feed resolves a
            # commit's added manifests and lineage through its pointer
            lineage_file="lineage-00000001.json",
            added_manifests=[m["name"] for m in manifests],
        )
        _commit_pointer(mdir, 1, one)
        return IceliteTable(self.spark, dest)

    def rollback(self, to_seq: int) -> dict:
        """Restore the table to snapshot ``to_seq`` as a NEW commit
        (Iceberg's ``rollback_to_snapshot``, public semantics): history
        is preserved — the undone commits stay inspectable via time
        travel — while the CURRENT state becomes the old snapshot's.
        Metadata-only and O(pointer) at any table size: the new pointer
        adopts the target's manifests, schema, field ids, bucket layout,
        z-order note AND applied-batch ledger. Adopting the ledger is
        the operational point: batches undone by the rollback leave the
        exactly-once ledger with the state they produced, so re-running
        the ingest replays them instead of skipping them as duplicates.

        Incremental consumers: a rollback in range makes
        ``read_changes`` / the ``format("icelite")`` stream raise — a
        change feed cannot express un-delivery; consumers re-sync from
        a snapshot (same fail-fast contract as copy-on-write commits).

        NON-rebasing: a commit racing the rollback raises
        ``ConcurrentCommitError`` — silently discarding a concurrent
        writer's batch is never safe; quiesce writers (or re-issue
        after inspecting) instead. Reference analog: the reference
        truncates and re-syncs on unrecoverable sink divergence
        (src/etl/processor.rs replay-from-scratch path); here the
        re-sync point is any retained snapshot."""
        self._require_main("rollback")
        t0 = time.monotonic()
        cur = self.pointer()
        if to_seq == cur["seq"]:
            raise ValueError(f"table is already at seq {to_seq}")
        if to_seq > cur["seq"]:
            raise ValueError(
                f"cannot roll back to future seq {to_seq} (current {cur['seq']})"
            )
        target = self.pointer(to_seq)  # FileNotFoundError when expired
        commit_seq = cur["seq"] + 1
        tok = f"-{uuid.uuid4().hex[:8]}"
        lineage_rec = {
            "commit_seq": commit_seq,
            "batch_key": None,
            "source": "rollback",
            "rolled_back_to": int(to_seq),
            "rolled_back_from": int(cur["seq"]),
            "n_changes": 0,
            "n_upserts": 0,
            "n_deletes": 0,
            "lsn_min": None,
            "lsn_max": None,
            "touched_buckets": [],
            "files_added": 0,
            "files_removed": 0,
            "rows_written": 0,
            "per_bucket_rows": {},
            "wall_ms": round((time.monotonic() - t0) * 1000.0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        # parent_ptr = TARGET: _commit adopts its ledger, field ids and
        # layout wholesale; parent_seq is overridden to the true
        # predecessor so history stays linear and the reverted span is
        # discoverable from the pointer itself
        self._commit(
            target,
            commit_seq,
            T.StructType.fromJson(target["schema"]),
            list(target["manifests"]),
            None,
            lineage_rec,
            tok,
            {
                "parent_seq": cur["seq"],
                "added_manifests": [],
                "rolled_back_to": int(to_seq),
            },
        )
        return lineage_rec

    def check_report(self, extra: dict | None = None) -> dict:
        """Data-quality REPORT: violation counts of every registered
        CHECK (plus ad-hoc ``extra`` {name: expr} rules) over the
        current LIVE rows, in ONE aggregation pass — never raises on
        findings (that is the writers' job); the audit surface a
        governance job runs on a table whose checks were added with
        ``validate=False`` or that predates its constraints. Returns
        {check_name: violating_row_count} (0 = clean). ANSI semantics
        (NULL passes); tombstones excluded."""
        checks = dict(self.pointer().get("checks") or {})
        checks.update(extra or {})
        if not checks:
            return {}
        live = self.read()
        if "__deleted" in live.columns:
            live = live.filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
        aggs = [
            F.sum(
                F.when(~F.coalesce(F.expr(expr), F.lit(True)), 1).otherwise(0)
            ).alias(name)
            for name, expr in checks.items()
        ]
        row = live.agg(*aggs).collect()[0]
        return {n: int(row[n] or 0) for n in checks}

    def add_check(self, name: str, expr: str, validate: bool = True) -> dict:
        """Add a writer-enforced CHECK constraint (Delta's ``ALTER TABLE
        ADD CONSTRAINT``, public semantics): ``expr`` is a boolean SQL
        expression every LIVE row must satisfy. From this commit on,
        every ``merge``/``apply_changes``/``update_where`` batch fails
        with :class:`CheckViolationError` BEFORE writing anything if any
        incoming live row violates (NULL passes, per ANSI CHECK;
        tombstones are exempt). The native ``format("icelite")`` sink
        cannot evaluate SQL per-partition and refuses checked tables
        unless told the upstream already enforced them.

        ``validate=True`` (default, Delta's semantics) scans CURRENT
        live rows once and refuses to add a check existing data already
        violates — at 100 TB that is one predicate-pushed scan, the same
        bill Delta pays; pass ``validate=False`` to skip for a
        known-clean table.

        Metadata-only commit (no data rewritten); the constraint rides
        the snapshot pointer, so clones carry it and time travel shows
        the rules in force at each commit."""
        t0 = time.monotonic()
        ptr = self.pointer()
        if not name or not isinstance(expr, str) or not expr.strip():
            raise ValueError("add_check needs a name and a SQL expression")
        checks = dict(ptr.get("checks") or {})
        if name in checks:
            raise ValueError(
                f"a CHECK named {name!r} already exists ({checks[name]!r}) "
                "— drop_check it first (silent replacement would hide the "
                "rule change from the audit trail)"
            )
        if ptr.get("agg_cols"):
            raise ValueError(
                "CHECK constraints are not supported on additive "
                "(agg_cols) tables — rows are partials, so a per-row "
                "predicate would check meaningless intermediate values; "
                "validate the folded read() downstream instead"
            )
        if self.spark is not None:
            # typecheck against the current schema (filter demands a
            # boolean) on an empty slice — no data read
            try:
                self.read().limit(0).filter(F.expr(expr)).count()
            except Exception as e:
                raise ValueError(
                    f"CHECK expression {expr!r} does not evaluate as a "
                    f"boolean over the table schema: {e}"
                )
            if validate:
                live = self.read()
                if "__deleted" in live.columns:
                    live = live.filter(
                        ~F.coalesce(F.col("__deleted"), F.lit(False))
                    )
                _enforce_checks(
                    live, {name: expr},
                    f"add_check({name!r}) validation of existing rows "
                    "(validate=False skips)",
                )
        checks[name] = expr
        self._commit_rebasing(
            ptr, T.StructType.fromJson(ptr["schema"]),
            list(ptr["manifests"]), [], None,
            self._meta_lineage(ptr, "add_check", t0), None,
            max_retries=0, ptr_overrides={"checks": checks},
        )
        return self.snapshot()

    def drop_check(self, name: str) -> dict:
        """Remove a CHECK constraint (metadata-only commit). History is
        unaffected — snapshots committed while the check was live still
        record it in their pointers."""
        t0 = time.monotonic()
        ptr = self.pointer()
        checks = dict(ptr.get("checks") or {})
        if name not in checks:
            raise KeyError(f"no CHECK named {name!r} (have: {sorted(checks)})")
        del checks[name]
        self._commit_rebasing(
            ptr, T.StructType.fromJson(ptr["schema"]),
            list(ptr["manifests"]), [], None,
            self._meta_lineage(ptr, "drop_check", t0), None,
            max_retries=0, ptr_overrides={"checks": checks or None},
        )
        return self.snapshot()

    def _guard_checks_resolve(self, new_schema: T.StructType, what: str) -> None:
        """Schema evolution guard: refuse a rename/drop that would strand
        a CHECK expression on a column name that no longer resolves
        (fail at DDL time, not at the next ingest batch)."""
        checks = self.pointer().get("checks") or {}
        if not checks or self.spark is None:
            return
        empty = self.spark.createDataFrame([], new_schema)
        for cname, expr in checks.items():
            try:
                empty.filter(F.expr(expr)).count()
            except Exception:
                raise ValueError(
                    f"{what} would break CHECK {cname!r} ({expr!r}) — "
                    "drop_check it first, then re-add against the new "
                    "schema"
                )

    def rename_column(self, old: str, new: str) -> dict:
        """METADATA-ONLY column rename (Iceberg field-id evolution): no
        data file is touched, at any table size. Existing files keep
        their write-time column name; reads alias it to the new name by
        field id (see ``_read_file_groups``). References in key/order/
        bucket/seq columns follow the rename. NON-rebasing (like
        ``rebucket``): a concurrent commit during the rename raises —
        run schema changes in a quiet window."""
        t0 = time.monotonic()
        ptr = self.pointer()
        schema = T.StructType.fromJson(ptr["schema"])
        names = [f.name for f in schema.fields]
        if old not in names:
            raise KeyError(f"no such column: {old!r}")
        if new in names:
            raise ValueError(f"column already exists: {new!r}")
        if old.startswith("__") or new.startswith("__"):
            raise ValueError("engine columns (__-prefixed) cannot be renamed")
        fids, next_id, legacy = self._synthesized_evo(ptr, schema)
        fids[new] = fids.pop(old)
        new_schema = T.StructType(
            [
                T.StructField(new if f.name == old else f.name, f.dataType, True)
                for f in schema.fields
            ]
        )
        self._guard_checks_resolve(new_schema, f"renaming {old!r} to {new!r}")
        ren = lambda c: new if c == old else c  # noqa: E731
        overrides = {
            "field_ids": fids,
            "next_field_id": next_id,
            "legacy_cols": legacy,
            "key_cols": [ren(c) for c in ptr["key_cols"]],
            "order_cols": [ren(c) for c in ptr["order_cols"]],
            "bucket_key": ren(ptr["bucket_key"]),
            "seq_col": ren(ptr["seq_col"]) if ptr.get("seq_col") else None,
            "zorder": (
                [ren(c) for c in ptr["zorder"]] if ptr.get("zorder") else None
            ),
            # an additive column keeps its combine fn under the new name
            "agg_cols": (
                {ren(c): fn for c, fn in ptr["agg_cols"].items()}
                if ptr.get("agg_cols")
                else None
            ),
        }
        self._commit_rebasing(
            ptr, new_schema, list(ptr["manifests"]), [], None,
            self._meta_lineage(ptr, "rename", t0), None,
            max_retries=0, ptr_overrides=overrides,
        )
        return self.snapshot()

    def drop_column(self, name: str) -> dict:
        """METADATA-ONLY column drop (Iceberg field-id evolution): the
        column vanishes from the table schema; old files keep the bytes
        but reads never select them. The field id is RETIRED — a later
        add of the same name gets a fresh id, so pre-drop data can never
        resurface under the new column. Key/order/bucket/seq and engine
        columns (``__``-prefixed) cannot be dropped. NON-rebasing."""
        t0 = time.monotonic()
        ptr = self.pointer()
        schema = T.StructType.fromJson(ptr["schema"])
        if name not in [f.name for f in schema.fields]:
            raise KeyError(f"no such column: {name!r}")
        protected = {ptr["bucket_key"], *ptr["key_cols"], *ptr["order_cols"]}
        if ptr.get("seq_col"):
            protected.add(ptr["seq_col"])
        if name in (ptr.get("agg_cols") or {}):
            raise ValueError(
                f"cannot drop {name!r}: it is an additive (agg_cols) "
                "column — the fold rule references it on every read"
            )
        if name in protected or name.startswith("__"):
            raise ValueError(
                f"cannot drop {name!r}: key/order/bucket/seq and engine "
                "columns are structural"
            )
        fids, next_id, legacy = self._synthesized_evo(ptr, schema)
        fids.pop(name, None)
        new_schema = T.StructType(
            [f for f in schema.fields if f.name != name]
        )
        self._guard_checks_resolve(new_schema, f"dropping {name!r}")
        overrides = {
            "field_ids": fids,
            "next_field_id": next_id,
            "legacy_cols": legacy,
            # a dropped column can no longer drive the clustered layout
            "zorder": (
                [c for c in ptr["zorder"] if c != name] or None
                if ptr.get("zorder")
                else None
            ),
        }
        self._commit_rebasing(
            ptr, new_schema, list(ptr["manifests"]), [], None,
            self._meta_lineage(ptr, "drop", t0), None,
            max_retries=0, ptr_overrides=overrides,
        )
        return self.snapshot()

    def add_column(
        self, name: str, dtype: str, agg: str | None = None
    ) -> dict:
        """METADATA-ONLY explicit ADD COLUMN (Iceberg ``ALTER TABLE ...
        ADD COLUMN`` / field-id evolution). The column gets a FRESH field
        id, so every existing file predates it and reads null-backfill —
        including a re-add after ``drop_column`` of the same name (the
        retired id keeps pre-drop bytes invisible). Writers may already
        add columns implicitly via merge's schema-on-write; the explicit
        DDL exists for declare-before-backfill workflows (add the column,
        then ``update_where``/ingest populates it) and for additive
        tables, where a NEW accumulator column must register its combine
        fn (``agg=``) atomically with the schema change. NON-rebasing.

        Reference analog: schema DDL runner at
        `migration/20231201000001_create_users_table.sql` (the reference
        alters schemas out-of-band; here DDL is a first-class commit)."""
        t0 = time.monotonic()
        ptr = self.pointer()
        schema = T.StructType.fromJson(ptr["schema"])
        if name in [f.name for f in schema.fields]:
            raise ValueError(f"column already exists: {name!r}")
        if name.startswith("__"):
            raise ValueError(
                f"cannot add {name!r}: the __ prefix is reserved for "
                "engine columns"
            )
        try:
            field = T.StructType.fromDDL(f"`{name}` {dtype}").fields[0]
        except Exception as e:  # unparseable type string
            raise ValueError(f"bad column type {dtype!r}: {e}") from e
        agg_over = None
        if agg is not None:
            if agg not in _AGG_FNS:
                raise ValueError(
                    f"bad agg fn {agg!r}: one of {_AGG_FNS}"
                )
            if not ptr.get("agg_cols"):
                raise ValueError(
                    "agg= requires an additive (agg_cols) table — adding "
                    "a first accumulator would change the read-resolution "
                    "rule of every existing row"
                )
            agg_over = {**ptr["agg_cols"], name: agg}
        fids, next_id, legacy = self._synthesized_evo(ptr, schema)
        fids[name] = next_id
        new_schema = T.StructType(list(schema.fields) + [field])
        overrides: dict = {
            "field_ids": fids,
            "next_field_id": next_id + 1,
            "legacy_cols": legacy,
        }
        if agg_over is not None:
            overrides["agg_cols"] = agg_over
        self._commit_rebasing(
            ptr, new_schema, list(ptr["manifests"]), [], None,
            self._meta_lineage(ptr, "add_column", t0), None,
            max_retries=0, ptr_overrides=overrides,
        )
        return self.snapshot()

    def _meta_lineage(self, ptr: dict, source: str, t0: float) -> dict:
        """Lineage record for a metadata-only commit (rename/drop)."""
        return {
            "commit_seq": ptr["seq"] + 1, "batch_key": None, "source": source,
            "n_changes": 0, "n_upserts": 0, "n_deletes": 0,
            "touched_buckets": [], "files_added": 0, "files_removed": 0,
            "rows_written": 0, "per_bucket_rows": {},
            "wall_ms": round((time.monotonic() - t0) * 1000.0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }

    def remove_orphans(
        self, grace_sec: float = 3600.0, dry_run: bool = False
    ) -> list[str]:
        """Delete files under the table dir that NO existing snapshot
        references and that are older than ``grace_sec`` — crash-orphan
        cleanup (aborted commit attempts leave data dirs, manifests,
        ledger chunks; rebasing losers clean up after themselves, a crash
        cannot). The grace window protects in-flight writers whose files
        are not yet referenced. O(files on disk) directory walk — a
        maintenance job, Iceberg's ``remove_orphan_files`` analog.
        ``dry_run`` returns what WOULD be deleted without touching
        anything (Iceberg's same-named knob) — the operator preview
        before the first GC on a production table."""
        self._require_main("remove_orphans")
        now = time.time()
        live_data: set[str] = set()
        live_meta: set[str] = set()
        # every pointer in every chain is a live root: main snaps AND all
        # branch snaps (branch commits share the data/manifest namespace,
        # so a GC blind to branch chains would destroy live branch data)
        for p in glob.glob(
            os.path.join(self._manifest_dir, "snap-*.json")
        ) + glob.glob(os.path.join(self._manifest_dir, "branch-*", "snap-*.json")):
            try:
                with open(p) as f:
                    ptr = json.load(f)
            except FileNotFoundError:
                continue
            live_data |= {f["path"] for f in self._files(ptr)}
            live_meta |= {m["name"] for m in ptr["manifests"]}
            live_meta |= set(ptr["applied_archives"])
        # staged (write-audit-publish) commits are live roots too: their
        # files are referenced by no snapshot until publish. Protect BOTH
        # path variants of an in-flight re-home (recorded dir + prev).
        for p in glob.glob(os.path.join(self._manifest_dir, "staged-*.json")):
            with open(p) as f:
                st = json.load(f)
            prev, cur_dir = st.get("prev_commit_dir"), st.get("commit_dir")
            for e in st.get("files", []):
                live_data.add(e["path"])
                if prev and cur_dir:
                    live_data.add(e["path"].replace(cur_dir, prev, 1))
            live_meta.add(os.path.basename(p))
        removed: list[str] = []

        def _rm(p: str) -> None:
            removed.append(p)
            if dry_run:
                return
            os.remove(p)
            self._manifest_cache.pop(os.path.basename(p), None)
            self._archive_cache.pop(os.path.basename(p), None)

        for p in glob.glob(
            os.path.join(self.path, _DATA_DIR, "**", "*.parquet"), recursive=True
        ):
            if p not in live_data and now - os.path.getmtime(p) > grace_sec:
                _rm(p)
        for pattern in ("manifest-*.json", "applied-*.json"):
            for p in glob.glob(os.path.join(self._manifest_dir, pattern)):
                if (
                    os.path.basename(p) not in live_meta
                    and now - os.path.getmtime(p) > grace_sec
                ):
                    _rm(p)
        # lineage records beyond the current snapshot can only be aborted
        # attempts; at committed seqs, a lineage file that is NOT the one
        # the pointer recorded (v3 ``lineage_file``) is a losing attempt's
        # debris — both are removable after the grace window
        cur = self.current_seq()
        live_lineage: set[str] = set()
        v3_lineage_seqs: set[int] = set()
        for sp in glob.glob(os.path.join(self._manifest_dir, "snap-*.json")):
            try:
                p2 = self.pointer(int(os.path.basename(sp)[5:13]))
            except FileNotFoundError:
                continue
            if p2.get("lineage_file") is not None:
                live_lineage.add(p2["lineage_file"])
                v3_lineage_seqs.add(int(p2["seq"]))
        for p in glob.glob(os.path.join(self._lineage_dir, "lineage-*.json")):
            s = int(os.path.basename(p)[8:16])
            stale = s > cur or (
                s in v3_lineage_seqs and os.path.basename(p) not in live_lineage
            )
            if stale and now - os.path.getmtime(p) > grace_sec:
                _rm(p)
        # drop data dirs left empty (grace-aged, so never an in-flight
        # writer's dir — its mtime refreshes as files land)
        if not dry_run:
            for d in glob.glob(os.path.join(self.path, _DATA_DIR, "commit-*")):
                if (
                    not glob.glob(
                        os.path.join(d, "**", "*.parquet"), recursive=True
                    )
                    and now - os.path.getmtime(d) > grace_sec
                ):
                    import shutil

                    shutil.rmtree(d, ignore_errors=True)
        return removed

    def delete_where(
        self,
        where: list,
        at_seq: int | None = None,
        batch_key: str | None = None,
        source: str = "delete_where",
    ) -> dict | None:
        """Predicate delete as a first-class CDC event — the GDPR /
        retention job: resolve the LIVE keys matching ``where`` (same
        file-pruned, MoR-safe read as ``read(where=...)``) and commit one
        tombstone per key as a normal merge-on-read append. O(matching
        slice) read + O(matched keys) write, never a table rewrite; the
        deletes flow to every downstream consumer through the change feed
        like any other change (a compaction-based purge would be
        invisible to the feed and silently diverge consumers).

        ``at_seq`` is the sequence the tombstones carry — it must beat
        the matched keys' current winners and belong to the caller's seq
        domain (e.g. the WAL head for out-of-band deletes). Default:
        1 + the max seq among matched keys (beats every matched winner;
        any genuinely later CDC event still wins over the tombstone).
        Physical bytes remain until ``compact()`` folds the tombstones
        and ``expire_snapshots`` + ``remove_orphans`` drop the old files
        — the purge pipeline is delete_where → compact → expire → GC.

        Not supported on additive (``agg_cols``) tables (accumulate-only;
        write compensating negative partials instead). Returns the commit
        lineage record, or None if nothing matched / batch_key replayed."""
        ptr = self.pointer()
        if ptr.get("agg_cols"):
            raise ValueError(
                "delete_where is not supported on additive (agg_cols) "
                "tables — write compensating negative partials instead"
            )
        if not ptr.get("seq_col"):
            raise ValueError("delete_where requires a seq_col table")
        seq_col = ptr["seq_col"]
        live = self.read(where=where)
        if "__deleted" in live.columns:
            live = live.filter(
                ~F.coalesce(F.col("__deleted"), F.lit(False))
            )
        matched = live.select(*ptr["key_cols"], seq_col)
        if at_seq is None:
            top = matched.agg(F.max(seq_col).alias("m")).collect()[0]["m"]
            if top is None:
                return None  # nothing matched
            at_seq = int(top) + 1
        elif matched.isEmpty():
            return None
        tomb = matched.drop(seq_col).select(
            "*",
            F.lit(int(at_seq)).cast("long").alias(seq_col),
            F.lit(True).alias("__deleted"),
            F.lit("U").alias("op"),
        )
        return self.merge(
            tomb, batch_key=batch_key, seq_col=seq_col, mode="mor",
            source=source,
        )

    def update_where(
        self,
        where: list,
        set_exprs: dict,
        at_seq: int | None = None,
        batch_key: str | None = None,
        source: str = "update_where",
    ) -> dict | None:
        """Predicate update as a first-class CDC event — Iceberg/Delta's
        ``UPDATE t SET col = expr WHERE pred`` (the in-place backfill /
        redaction job, e.g. masking PII without deleting the rows):
        resolve the LIVE rows matching ``where`` (same file-pruned,
        MoR-safe read as ``read(where=...)``), evaluate the SET
        expressions against the OLD row (simultaneous assignment — a
        swap ``{"a": "b", "b": "a"}`` is well-defined), and commit the
        rewritten winners as a normal merge-on-read append. O(matching
        slice) read + O(matched rows) write, never a table rewrite; the
        updates flow to every downstream consumer through the change
        feed like any other change, which a compaction-style rewrite
        would hide (the same feed-visibility argument as
        ``delete_where``).

        ``set_exprs`` maps column name → SQL expression string (or a
        pyspark Column), evaluated per matched row and cast back to the
        column's existing type. Key columns, ``seq_col``, and the
        tombstone flag cannot be assigned; target columns must already
        exist (schema evolution is ``merge``'s job). Tombstoned keys
        are never matched — an UPDATE does not resurrect deletes.

        ``at_seq`` semantics mirror ``delete_where``: the rewritten
        rows all carry it (default 1 + the max seq among matched rows,
        which beats every matched winner), and any genuinely later CDC
        event still wins over the rewrite by the normal LWW rule. An
        explicit ``at_seq`` lower than a matched key's current winner
        loses for that key by design — the caller owns the seq domain.

        Not supported on additive (``agg_cols``) tables — a key's
        "current value" there is a fold over all partials, not a single
        row; write compensating partials instead. Returns the commit
        lineage record, or None if nothing matched / batch_key
        replayed."""
        ptr = self.pointer()
        if ptr.get("agg_cols"):
            raise ValueError(
                "update_where is not supported on additive (agg_cols) "
                "tables — a key's current value is a fold over all "
                "partials, not a row; write compensating partials instead"
            )
        if not ptr.get("seq_col"):
            raise ValueError("update_where requires a seq_col table")
        if not set_exprs:
            raise ValueError("update_where needs at least one assignment")
        seq_col = ptr["seq_col"]
        schema = T.StructType.fromJson(ptr["schema"])
        types = {f.name: f.dataType for f in schema.fields}
        banned = set(ptr["key_cols"]) | {seq_col, "__deleted"}
        for c in set_exprs:
            if c in banned:
                raise ValueError(
                    f"cannot assign {c!r} — key columns, the seq column, "
                    "and the tombstone flag are identity, not payload"
                )
            if c not in types:
                raise ValueError(
                    f"unknown column {c!r} — update_where does not evolve "
                    "the schema; merge a batch carrying the new column "
                    "instead"
                )
        live = self.read(where=where)
        if "__deleted" in live.columns:
            live = live.filter(
                ~F.coalesce(F.col("__deleted"), F.lit(False))
            )
        if at_seq is None:
            top = live.agg(F.max(seq_col).alias("m")).collect()[0]["m"]
            if top is None:
                return None  # nothing matched
            at_seq = int(top) + 1
        elif live.isEmpty():
            return None

        def _assigned(name):
            if name == seq_col:
                return F.lit(int(at_seq)).cast(types[name]).alias(name)
            if name == "__deleted":  # rewritten winners are live rows
                return F.lit(False).alias(name)
            e = set_exprs.get(name)
            if e is None:
                return F.col(name).alias(name)
            e = F.expr(e) if isinstance(e, str) else e
            return e.cast(types[name]).alias(name)

        # __deleted / op may already be stored schema columns (transcript
        # tables persist the tombstone flag) — emit each exactly once
        extras = [
            F.lit(False).alias("__deleted"),
        ] if "__deleted" not in types else []
        if "op" not in types:
            extras.append(F.lit("U").alias("op"))
        updated = live.select(
            *[
                F.lit("U").alias("op") if f.name == "op" else _assigned(f.name)
                for f in schema.fields
            ],
            *extras,
        )
        return self.merge(
            updated, batch_key=batch_key, seq_col=seq_col, mode="mor",
            source=source,
        )

    def expire_snapshots(
        self, keep_last: int = 2, older_than=None
    ) -> list[str]:
        """Delete data files, manifests, and ledger chunks referenced only
        by expired snapshots — a pure manifest diff (no directory glob of
        the data tree, which would be O(all files ever written)).

        ``older_than`` (datetime treated as UTC, or epoch seconds) is the
        Iceberg ``expireSnapshots().expireOlderThan(ts)`` analog: only
        snapshots committed strictly BEFORE the cutoff are candidates, and
        ``keep_last`` still retains that many most-recent snapshots
        regardless of age — the two compose as (age-expired) MINUS
        (retain-last ∪ tags), never widening what keep_last alone would
        expire. Reference analog: the reference has no snapshot layer; the
        retention policy mirrors Iceberg's documented maintenance API."""
        self._require_main("expire_snapshots")
        cur = self.current_seq()
        keep_seqs = set(range(max(0, cur - keep_last + 1), cur + 1))
        keep_seqs |= set(self.tags().values())  # tagged snapshots never expire
        if older_than is not None:
            if isinstance(older_than, _dt.datetime):
                older_than = (
                    calendar.timegm(older_than.utctimetuple())
                    + older_than.microsecond / 1e6
                )
            for p in glob.glob(
                os.path.join(self._manifest_dir, "snap-*.json")
            ):
                s = int(os.path.basename(p)[5:13])
                try:
                    ptr = self.pointer(s)
                except FileNotFoundError:
                    continue
                at = ptr.get("committed_at_epoch") or os.path.getmtime(p)
                if at >= older_than:
                    keep_seqs.add(s)
        live_files: set[str] = set()
        live_meta: set[str] = set()
        dead_files: set[str] = set()
        dead_meta: set[str] = set()
        for p in glob.glob(os.path.join(self._manifest_dir, "snap-*.json")):
            s = int(os.path.basename(p)[5:13])
            try:
                ptr = self.pointer(s)
            except FileNotFoundError:
                continue
            files = {f["path"] for f in self._files(ptr)}
            meta = {m["name"] for m in ptr["manifests"]} | set(
                ptr["applied_archives"]
            )
            if s in keep_seqs:
                live_files |= files
                live_meta |= meta
            else:
                dead_files |= files
                dead_meta |= meta
        # branch chains pin everything they reference (expiry is a MAIN
        # policy; a branch's files stay live until delete_branch + GC)
        for p in glob.glob(
            os.path.join(self._manifest_dir, "branch-*", "snap-*.json")
        ):
            try:
                with open(p) as f:
                    bptr = json.load(f)
            except FileNotFoundError:
                continue
            live_files |= {f["path"] for f in self._files(bptr)}
            live_meta |= {m["name"] for m in bptr["manifests"]} | set(
                bptr["applied_archives"]
            )
        removed = []
        for p in sorted(dead_files - live_files):
            if os.path.exists(p):
                os.remove(p)
                removed.append(p)
        for name in sorted(dead_meta - live_meta):
            p = os.path.join(self._manifest_dir, name)
            if os.path.exists(p):
                os.remove(p)
            self._manifest_cache.pop(name, None)
            self._archive_cache.pop(name, None)
        for s in range(0, cur):
            if s not in keep_seqs:
                mp = self._pointer_path(s)
                if os.path.exists(mp):
                    os.remove(mp)
        return removed


_AGG_FNS = ("sum", "min", "max")


def _resolve_versions(df: DataFrame, ptr: dict, schema: T.StructType) -> DataFrame:
    """Per-key version resolution for a MoR read: additive tables fold
    partials by their declared combine fns, everything else is
    last-writer-wins by max(seq)."""
    if ptr.get("agg_cols"):
        return _fold_agg(
            df, ptr["key_cols"], ptr["seq_col"], ptr["agg_cols"], schema
        )
    return _dedup_by_seq(df, ptr["key_cols"], ptr["seq_col"], schema)


def _fold_agg(
    df: DataFrame, key_cols, seq_col: str, agg_cols: dict, schema: T.StructType
) -> DataFrame:
    """Accumulate-on-read resolution for additive (``agg_cols``) tables —
    the ClickHouse-SummingMergeTree / Druid-rollup move re-expressed as a
    lake-format read rule: every write APPENDS per-key partials (O(delta),
    no read-modify-write), and resolution folds all partials of a key with
    the column's declared combine fn (sum/min/max). Non-agg payload
    columns stay last-writer-wins by ``seq_col`` (same max-struct as
    ``_dedup_by_seq``); ONE hash aggregation, map-side partial agg.

    Double sums route through DECIMAL so the folded value is identical
    whatever the file/batch segmentation — a double fold is
    order-dependent in the last ulp, and two reads of one snapshot must
    never disagree."""
    agg_names = set(agg_cols)
    rest = [
        f.name
        for f in schema.fields
        if f.name not in key_cols and f.name != seq_col and f.name not in agg_names
    ]
    row = F.struct(F.col(seq_col), *[F.col(c) for c in rest]).alias("__row")
    by_name = {f.name: f.dataType for f in schema.fields}
    aggs = [F.max(row).alias("__row")]
    for c, fn in agg_cols.items():
        if fn == "sum":
            dt = by_name[c]
            if isinstance(dt, (T.DoubleType, T.FloatType)):
                agg = F.sum(F.col(c).cast("decimal(38,6)")).cast(dt)
            else:
                agg = F.sum(F.col(c)).cast(dt)
        elif fn == "min":
            agg = F.min(F.col(c))
        else:
            agg = F.max(F.col(c))
        aggs.append(agg.alias(c))
    return (
        df.groupBy(*key_cols)
        .agg(*aggs)
        .select(
            *key_cols,
            F.col(f"__row.{seq_col}").alias(seq_col),
            *[F.col(f"__row.{c}").alias(c) for c in rest],
            *agg_names,
        )
        .select(*[f.name for f in schema.fields])
    )


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


# safe widening chains (Iceberg's type promotion set that Spark 4's
# parquet reader can also widen at scan time, SPARK-40876): reading an old
# int32 file through a long schema null-safely promotes, so widening the
# table schema never requires rewriting old files
_WIDEN_CHAINS = (
    [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType()],
    [T.FloatType(), T.DoubleType()],
)


def _widen(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """The wider of two types if they sit on one widening chain, else
    None. Merge-time evolution is add/widen only BY DESIGN: a batch with
    a renamed column is indistinguishable from drop+add, so renames and
    drops go through the explicit DDL (``rename_column``/``drop_column``,
    field-id-based) instead of being inferred here."""
    if a == b:
        return a
    for chain in _WIDEN_CHAINS:
        if a in chain and b in chain:
            return chain[max(chain.index(a), chain.index(b))]
    return None


def _merge_schema(old: T.StructType, new: T.StructType) -> T.StructType:
    """Union schema: old columns keep position; new columns append; a
    type mismatch on one widening chain promotes the column to the wider
    type (int→long, float→double — old files read through the widened
    schema via the parquet reader's type promotion; a narrower batch
    column is cast up at write). Any other conflict is an error (no
    implicit lossy casts — matches Iceberg's strict evolution)."""
    by_name = {f.name: f for f in old.fields}
    fields = list(old.fields)
    for f in new.fields:
        if f.name in by_name:
            cur = by_name[f.name].dataType
            if cur != f.dataType:
                wide = _widen(cur, f.dataType)
                if wide is None:
                    raise TypeError(
                        f"schema evolution type conflict on '{f.name}': "
                        f"{cur} vs {f.dataType}"
                    )
                i = next(
                    idx for idx, fld in enumerate(fields) if fld.name == f.name
                )
                fields[i] = T.StructField(f.name, wide, True)
        else:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)


def _write_json(path: str, obj) -> None:
    """Durable write of an auxiliary metadata file (manifest / lineage /
    ledger chunk). Overwrite-safe: these are only reachable through a
    committed pointer, so rewriting an orphan from a crashed attempt of
    the same commit seq is fine."""
    tmp = path + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _check_branch_name(name: str) -> None:
    if not name or not all(c.isalnum() or c in "-_." for c in name):
        raise ValueError(
            f"invalid branch name {name!r}: use letters, digits, '-', '_', '.'"
        )


def _commit_pointer(manifest_dir: str, seq: int, pointer: dict) -> None:
    """The atomic commit point. ``os.link`` (not rename) — POSIX rename
    silently overwrites, so two racing writers could both think they
    committed seq N; link makes the loser fail deterministically."""
    final = os.path.join(manifest_dir, f"snap-{seq:08d}.json")
    tmp = final + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump(pointer, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, final)
    except FileExistsError:
        # ONLY the race maps to ConcurrentCommitError; a real I/O failure
        # (ENOSPC, EIO, EPERM) must surface as itself — retrying it 5
        # times as a phantom writer conflict would bury the actual cause
        raise ConcurrentCommitError(f"snapshot {seq} already committed")
    finally:
        os.unlink(tmp)
