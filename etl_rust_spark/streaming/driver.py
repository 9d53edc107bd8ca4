"""M3 — the Structured Streaming driver (WAL tail → exactly-once upsert).

Maps the reference's pipeline machinery onto Spark's own engine
(SURVEY.md §3.2 lifecycle table):

- ``extract`` (channel source, src/etl/processor.rs:33)   → ``readStream``
  over a directory of WAL-segment parquet files.
- size+timeout batch triggers (src/bucket/bucket.rs:190-206) →
  ``maxFilesPerTrigger`` + ``trigger(processingTime=...)``.
- worker pool / backpressure (src/bucket/bucket.rs:123-158) → Spark task
  scheduler; micro-batch sources are pull-based.
- ``load(Vec<T>)`` batch sink (src/etl/processor.rs:43)    →
  ``foreachBatch(apply_changes)`` — the same kernel the batch-replay path
  uses, so streaming and replay share one code path (mirrors ETL::run
  reusing Bucket, src/etl/processor.rs:99).
- graceful drain-on-close (src/bucket/bucket.rs:216-234)   → Spark
  finishes the in-flight micro-batch on ``query.stop()``; exactly-once
  across restarts comes from checkpoint offsets + the Icelite
  ``applied_batches`` ledger (a replayed epoch id is a no-op).
- ``ETLPipelineManager`` (src/etl/manager.rs:76-102)       →
  ``PipelineManager``: several concurrent queries, fail-fast via
  ``awaitAnyTermination``, graceful ``stop_all``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.operators.apply import apply_changes


class PipelineError(RuntimeError):
    """An error wrapped with its pipeline's name, preserving the cause —
    the reference's source-preserving error chain
    (src/etl/types.rs:1-24, src/etl/manager.rs:135-159)."""

    def __init__(self, pipeline: str, cause: BaseException):
        super().__init__(f"pipeline '{pipeline}' failed: {cause}")
        self.pipeline = pipeline
        self.__cause__ = cause


def _checkpoint_run_id(checkpoint_dir: str) -> str:
    """Per-checkpoint run id persisted INSIDE the checkpoint dir, so
    ledger batch keys are namespaced by checkpoint lifetime: delete or
    relocate the checkpoint and epoch ids restarting at 0 get FRESH
    keys (reprocessed — safe, the lsn dedup is idempotent) instead of
    silently matching a previous run's ledger entries."""
    import os
    import uuid

    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, "__run_id")
    if not os.path.exists(path):
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(uuid.uuid4().hex)
        try:
            os.link(tmp, path)  # loser of a concurrent race keeps the winner's id
        except FileExistsError:
            pass
        os.unlink(tmp)
    with open(path) as f:
        return f.read().strip()


def _feed_offsets_reader(
    spark: SparkSession,
    path: str,
    max_commits: int | None = None,
) -> DataFrame:
    """The JVM fast-path control plane every feed pipeline tails
    (VERDICT r05 #4): an offsets-only icelite stream — one LONG row per
    change commit, no data decoded in Python workers. Each micro-batch's
    ``foreachBatch`` derives its commit range from these rows and reads
    the actual change rows JVM-side via ``IceliteTable.read_changes``
    (the same files, the same winners, 10-30x the Python data plane's
    scan rate). Checkpoint offsets still define the range, so
    exactly-once replay semantics are unchanged."""
    r = (
        spark.readStream.format("icelite")
        .option("path", path)
        .option("offsetsOnly", "true")
    )
    if max_commits is not None:
        r = r.option("maxCommitsPerBatch", str(max_commits))
    return r.load()


def _offsets_range(off_df: DataFrame) -> tuple[int, int] | None:
    """(lowest, highest) change-commit seq in an offsets-only batch, or
    None for an empty batch (nothing new to consume)."""
    row = off_df.agg(
        F.min("_commit_seq").alias("lo"), F.max("_commit_seq").alias("hi")
    ).first()
    if row is None or row["lo"] is None:
        return None
    return (int(row["lo"]), int(row["hi"]))


def _feed_shard_tuple(shard: str | None) -> tuple[int, int] | None:
    """Validate and parse a feed's ``shard='i/k'`` for the JVM
    ``read_changes(shard=...)`` path — same rules as the source option."""
    from etl_rust_spark.sources.icelite_source import _parse_shard

    return _parse_shard({"shard": shard} if shard is not None else {})


def _checkpoint_committed_seqs(checkpoint_dir: str) -> list[int] | None:
    """The per-source icelite seqs of the last COMMITTED micro-batch in a
    Structured Streaming checkpoint (offsets file of the highest batch id
    present in ``commits/``), or None when nothing committed / the file
    shape is unrecognized (callers fall back to a confirmation drain)."""
    import glob as _glob
    import json as _json
    import os as _os

    ids = [
        int(_os.path.basename(p))
        for p in _glob.glob(_os.path.join(checkpoint_dir, "commits", "*"))
        if _os.path.basename(p).isdigit()
    ]
    if not ids:
        return None
    off = _os.path.join(checkpoint_dir, "offsets", str(max(ids)))
    try:
        with open(off) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        seqs = []
        for ln in lines[2:]:  # v1 header + metadata JSON, then one per source
            seqs.append(int(_json.loads(ln)["seq"]))
        return seqs or None
    except Exception:
        return None


def _feed_drained(checkpoint_dir: str, current_seqs: list[int]) -> bool:
    """True iff the checkpoint's committed offsets already cover every
    source's current seq — the direct quiescence test that replaces the
    old 'run one more streaming query and see whether the target
    advanced' confirmation drain (a full query start/stop plus a Python
    data-source spin-up, ~1-2 s of pure fixed cost per run_available).

    Multiset comparison is exact here: committed ≤ current per source,
    so sorted equality forces per-source equality even for the unioned
    two-source join feed."""
    got = _checkpoint_committed_seqs(checkpoint_dir)
    if got is None or len(got) != len(current_seqs):
        return False
    return sorted(got) == sorted(int(s) for s in current_seqs)


def _feed_run_available(
    name: str,
    checkpoint_dir: str,
    start_fn,
    current_seqs_fn,
    max_drains: int = 64,
) -> None:
    """Shared drain-to-quiescence loop for the feed pipelines: skip the
    streaming query entirely when the checkpoint already covers the
    source head, otherwise drain (processAllAvailable consumes the whole
    clamped backlog batch by batch) and re-check."""
    for _ in range(max_drains):
        if _feed_drained(checkpoint_dir, current_seqs_fn()):
            return
        q = start_fn()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    raise RuntimeError(
        f"{name!r} still catching up after {max_drains} drains"
    )


@dataclass
class ChangelogIngest:
    """One CDC ingest pipeline: tail WAL segments, upsert into a table."""

    spark: SparkSession
    wal_dir: str
    table_path: str
    checkpoint_dir: str
    schema: T.StructType
    name: str = "transcripts_ingest"
    max_files_per_trigger: int = 1          # B2 size trigger analog
    processing_time: str = "0 seconds"      # B3 timeout trigger analog
    wal_format: str = "parquet"             # or "json": binlog-style text segments
    salt_buckets: int | None = None
    mode: str = "cow"  # or "mor": append-delta commits, compact separately
    compact_every: int | None = None  # mor: fold deltas every N batches
    # partial compaction threshold: only buckets holding more than this
    # many files rewrite (None = full compaction) — the affordable policy
    # at scale, where whole-table compaction is an O(table) job
    compact_min_files: int | None = None
    transform: Callable[[DataFrame], DataFrame] | None = None
    # B9 lifecycle hooks (pre_process/post_process slots,
    # src/etl/processor.rs:46-49): setup/teardown around the query
    pre_process: Callable[[], None] | None = None
    post_process: Callable[[], None] | None = None
    # WAP audit gate: when set (requires mode="mor"), every micro-batch
    # is STAGED (fully written, invisible to readers), ``audit`` inspects
    # the exact post-publish view (read_staged), and only passing batches
    # publish. Failing batches drop without a trace — their keys never
    # enter the exactly-once ledger — and are recorded in ``rejected`` /
    # reported via ``on_reject``. The quality gate a training-data ingest
    # runs BEFORE a crawl batch can reach consumers.
    audit: Callable[[DataFrame], bool] | None = None
    on_reject: Callable[[int], None] | None = None
    rejected: list = field(default_factory=list)
    # Row-level dead-letter queue (the data-plane analog of B10's error
    # aggregation, src/etl/manager.rs:92-101 — the reference aborts the
    # pipeline on a bad record; at 10^10 events a malformed crawl row
    # must divert, not kill). ``rules`` maps rule name -> SQL predicate a
    # VALID row satisfies (strings so the config is loggable/serializable;
    # NULL predicate results count as violations — a null key fails
    # "conv_id IS NOT NULL" and a null op fails the IN list). Rows failing
    # ANY rule are written to ``quarantine_dir/batch-<run>-<epoch>`` as
    # parquet with a ``_violations`` array naming every failed rule —
    # overwrite-per-epoch makes replay exactly-once by content — and never
    # reach the table. With quarantine_dir set and rules=None, defaults
    # derive from the table: key columns non-null, lsn non-null, op valid.
    quarantine_dir: str | None = None
    rules: dict[str, str] | None = None
    on_quarantine: Callable[[int, int], None] | None = None  # (epoch, n)
    quarantined: list = field(default_factory=list)  # [(epoch, n), ...]
    # Table CHECK constraints × DLQ: when the target table carries
    # add_check() constraints AND quarantine_dir is set, each check
    # auto-derives a rule ``check_<name>`` so violating rows DIVERT
    # instead of failing the whole micro-batch (merge's fail-fast
    # CheckViolationError remains as defense in depth behind the
    # transform). Semantics mapped exactly: deletes exempt, NULL
    # passes (the rule language alone counts NULL as a violation).
    # False = leave check enforcement entirely to merge's fail-fast.
    quarantine_checks: bool = True

    def _run_id(self) -> str:
        return _checkpoint_run_id(self.checkpoint_dir)

    def start(self):
        table = IceliteTable.load(self.spark, self.table_path)
        run_id = self._run_id()

        if self.audit is not None and self.mode != "mor":
            raise ValueError("audited ingest requires mode='mor' (staged commits)")

        rules = self.rules
        if self.quarantine_dir is not None and rules is None:
            keys = table.pointer()["key_cols"]
            rules = {f"{k}_not_null": f"{k} IS NOT NULL" for k in keys}
            rules["lsn_not_null"] = "lsn IS NOT NULL"
            rules["op_valid"] = "op IN ('I', 'U', 'D')"
        if rules is not None and self.quarantine_dir is None:
            raise ValueError("rules without quarantine_dir would drop rows "
                             "silently — set quarantine_dir")
        checks = table.pointer().get("checks") or {}
        if checks and self.quarantine_dir is not None and self.quarantine_checks:
            # validate resolvability against the DECLARED WAL schema now
            # (a check referencing a transform-produced column cannot be
            # evaluated pre-transform — fail loud at start, not mid-stream)
            probe = self.spark.createDataFrame([], self.schema)
            rules = dict(rules or {})
            for cname, expr in checks.items():
                try:
                    probe.where(F.expr(expr)).limit(0).count()
                except Exception:
                    raise ValueError(
                        f"table CHECK {cname!r} ({expr!r}) does not resolve "
                        "against the WAL event schema, so it cannot divert "
                        "rows pre-transform; pass quarantine_checks=False "
                        "to leave it to merge's fail-fast enforcement"
                    )
                # CHECK semantics mapped onto the rule language (where a
                # NULL predicate counts as a violation): deletes exempt,
                # NULL passes — violation only when expr IS FALSE on a
                # live row.
                rules[f"check_{cname}"] = (
                    f"op = 'D' OR coalesce(({expr}), true)"
                )

        def _apply(batch_df: DataFrame, epoch_id: int) -> None:
            if not rules:
                _apply_clean(batch_df, epoch_id)
                return
            # validate RAW WAL events (pre-transform: decode problems
            # surface as nulls under the declared schema). One cached
            # scan feeds both the quarantine write and the good path.
            viol = F.array_compact(F.array(*[
                F.when(~F.coalesce(F.expr(pred), F.lit(False)), F.lit(n))
                for n, pred in rules.items()
            ]))
            flagged = batch_df.withColumn("_violations", viol).persist()
            try:
                bad = flagged.filter(F.size("_violations") > 0)
                n_bad = bad.count()
                if n_bad:
                    # overwrite-per-epoch: a replayed epoch rewrites the
                    # SAME rows into the SAME dir — content-exactly-once
                    (bad.withColumn("_epoch_id", F.lit(epoch_id))
                        .withColumn("_pipeline", F.lit(self.name))
                        .write.mode("overwrite")
                        .parquet(f"{self.quarantine_dir}/"
                                 f"batch-{run_id}-{epoch_id}"))
                    self.quarantined.append((epoch_id, n_bad))
                    if self.on_quarantine:
                        self.on_quarantine(epoch_id, n_bad)
                good = (flagged.filter(F.size("_violations") == 0)
                        .drop("_violations"))
                _apply_clean(good, epoch_id)
            finally:
                flagged.unpersist()

        def _apply_clean(batch_df: DataFrame, epoch_id: int) -> None:
            df = self.transform(batch_df) if self.transform else batch_df
            # epoch_id is stable across checkpoint restarts → the ledger
            # key that makes foreachBatch's at-least-once exactly-once;
            # run_id couples it to THIS checkpoint's lifetime
            stage = (
                f"{self.name}.{run_id}.{epoch_id}" if self.audit is not None else None
            )
            if stage is not None and stage in table.list_staged():
                # crash between staging and publish/drop on a previous run
                # of THIS epoch (the name is run-id + epoch scoped, so it
                # can only be our own half-finished attempt). Two cases:
                # the batch key already in the ledger means the publish's
                # pointer link LANDED and the crash hit before the marker
                # removal — the staged dir is live table data, clear only
                # the marker (deleting it would destroy committed data,
                # ADVICE r03 #1). Otherwise the publish never happened:
                # discard and re-stage deterministically instead of
                # wedging forever.
                if table.is_applied(f"{self.name}:{run_id}:{epoch_id}"):
                    table.clear_staged_marker(stage)
                else:
                    table.drop_staged(stage)
            rec = apply_changes(
                table,
                df,
                batch_key=f"{self.name}:{run_id}:{epoch_id}",
                salt_buckets=self.salt_buckets,
                source=f"stream:{self.name}",
                mode=self.mode,
                stage_as=stage,
            )
            if stage is not None and rec is not None:
                if self.audit(table.read_staged(stage)):
                    rec = table.publish_staged(stage)
                else:
                    table.drop_staged(stage)
                    self.rejected.append(epoch_id)
                    if self.on_reject:
                        self.on_reject(epoch_id)
                    return
            if (
                rec is not None
                and self.mode == "mor"
                and self.compact_every
                and rec["commit_seq"] % self.compact_every == 0
            ):
                table.compact(min_files_per_bucket=self.compact_min_files)

        base = self.spark.readStream.schema(self.schema).option(
            "maxFilesPerTrigger", self.max_files_per_trigger
        )
        reader = (
            base.json(self.wal_dir)
            if self.wal_format == "json"
            else base.parquet(self.wal_dir)
        )
        return (
            reader.writeStream.queryName(self.name)
            .foreachBatch(_apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=self.processing_time)
            .start()
        )

    def run_available(self) -> None:
        """pre_process → drain everything currently in the WAL dir → stop
        → post_process (the batch-drain analog of close() →
        drain_and_finish; errors wrapped with the pipeline name, B9/B10)."""
        if self.pre_process:
            self.pre_process()
        try:
            q = self.start()
            try:
                q.processAllAvailable()
            finally:
                q.stop()
                q.awaitTermination()
        except Exception as e:
            raise PipelineError(self.name, e) from e
        if self.post_process:
            self.post_process()


def read_quarantine(spark: SparkSession, quarantine_dir: str) -> DataFrame:
    """Read every quarantined batch under ``quarantine_dir`` (one
    ``batch-<run>-<epoch>`` parquet dir per offending micro-batch): the
    original WAL rows plus ``_violations`` (every failed rule name),
    ``_epoch_id`` and ``_pipeline`` — the triage surface an operator
    re-drives fixed rows from."""
    import glob as _glob
    import os as _os

    dirs = sorted(_glob.glob(_os.path.join(quarantine_dir, "batch-*")))
    if not dirs:
        raise FileNotFoundError(
            f"no quarantined batches under {quarantine_dir!r}"
        )
    return spark.read.parquet(*dirs)


@dataclass
class WindowedRollupIngest:
    """Streaming ROLLUP table: windowed per-key aggregates continuously
    upserted into an Icelite table — the materialized-view pattern (a
    dashboard reads the rollup, never the raw events). The streaming
    aggregation runs in UPDATE mode, so each micro-batch emits only the
    windows it changed; those rows upsert by (key, window_start) with
    the epoch id as the last-writer-wins sequence. A late event (inside
    the watermark) re-emits its window with a larger epoch and simply
    overwrites the row — the final table equals the batch aggregate of
    all events regardless of segmentation, ordering, or restarts
    (exactly-once via the same run-id-namespaced ledger keys as the CDC
    path). The double-typed value aggregates in DECIMAL so the result is
    independent of per-batch summation order."""

    spark: SparkSession
    wal_dir: str
    table_path: str
    checkpoint_dir: str
    schema: T.StructType
    name: str = "rollup"
    window: str = "1 hour"
    ts_col: str = "ts"
    key_col: str = "user_id"
    value_col: str = "value"
    watermark: str = "2 hours"
    max_files_per_trigger: int = 1

    ROLLUP_FIELDS = (
        "window_start long, n_events long, value_sum double, __lsn long"
    )

    @classmethod
    def create_table(cls, spark, path, key_field: T.StructField, n_buckets: int = 8):
        fields = [key_field] + list(
            T.StructType.fromDDL(cls.ROLLUP_FIELDS).fields
        )
        return IceliteTable.create(
            spark, path, T.StructType(fields),
            key_cols=(key_field.name, "window_start"),
            bucket_key=key_field.name, n_buckets=n_buckets,
            order_cols=(key_field.name, "window_start"), seq_col="__lsn",
        )

    def start(self):
        from pyspark.sql import functions as F

        table = IceliteTable.load(self.spark, self.table_path)
        run_id = _checkpoint_run_id(self.checkpoint_dir)

        def _apply(batch_df: DataFrame, epoch_id: int) -> None:
            changes = batch_df.withColumn(
                "__lsn", F.lit(int(epoch_id)).cast("long")
            ).withColumn("op", F.lit("U"))
            table.merge(
                changes,
                batch_key=f"{self.name}:{run_id}:{epoch_id}",
                op_col="op",
                seq_col="__lsn",
                mode="mor",
                source=f"stream:{self.name}",
            )

        agg = (
            self.spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.wal_dir)
            .withColumn(self.ts_col, F.col(self.ts_col).cast("timestamp"))
            .withWatermark(self.ts_col, self.watermark)
            .groupBy(
                F.window(self.ts_col, self.window).alias("__w"),
                F.col(self.key_col),
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col(self.value_col).cast("decimal(24,6)"))
                .cast("double")
                .alias("value_sum"),
            )
            .select(
                self.key_col,
                F.col("__w.start").cast("long").alias("window_start"),
                "n_events",
                "value_sum",
            )
        )
        return (
            agg.writeStream.queryName(self.name)
            .outputMode("update")
            .foreachBatch(_apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime="0 seconds")
            .start()
        )

    def run_available(self) -> None:
        try:
            q = self.start()
            try:
                q.processAllAvailable()
            finally:
                q.stop()
                q.awaitTermination()
        except Exception as e:
            raise PipelineError(self.name, e) from e


@dataclass
class DemuxIngest:
    """One WAL stream → K tables, routed by predicate — the streaming
    twin of the reference's one-source→many-tables migration
    (operators/migrate.py; reference flatten+load,
    example/src/main.rs:305-622): each micro-batch is read from the WAL
    ONCE (cached), then every route's filtered slice merges into its own
    table under its own exactly-once ledger key. K separate pipelines
    tailing the same WAL would scan it K times; the single-scan demux is
    the affordable fan-out at scale — the producer-side complement of the
    change-feed consumer's ``shard`` option.

    ``routes``: name → (filter ``Column``, table_path). Routes are
    independent filters, not a partition — a row may match several (it
    lands in each) or none (it is dropped; add a catch-all route to keep
    strays).

    Crash atomicity: batch keys carry the route name
    (``{name}:{run}:{epoch}:{route}``), so a micro-batch replayed after
    a crash BETWEEN route commits re-runs all routes and the already-
    committed ones resolve to ledger no-ops — no route is double-applied
    or lost."""

    spark: SparkSession
    wal_dir: str
    checkpoint_dir: str
    schema: T.StructType
    routes: dict = field(default_factory=dict)  # name -> (Column, path)
    name: str = "demux"
    max_files_per_trigger: int = 1
    wal_format: str = "parquet"
    mode: str = "mor"
    salt_buckets: int | None = None

    def start(self):
        if not self.routes:
            raise ValueError("DemuxIngest needs at least one route")
        tables = {
            rname: IceliteTable.load(self.spark, path)
            for rname, (_, path) in self.routes.items()
        }
        run_id = _checkpoint_run_id(self.checkpoint_dir)

        def _apply(batch_df: DataFrame, epoch_id: int) -> None:
            batch_df.persist()
            try:
                for rname, (pred, _) in self.routes.items():
                    apply_changes(
                        tables[rname],
                        batch_df.filter(pred),
                        batch_key=f"{self.name}:{run_id}:{epoch_id}:{rname}",
                        source=f"stream:{self.name}:{rname}",
                        mode=self.mode,
                        salt_buckets=self.salt_buckets,
                    )
            finally:
                batch_df.unpersist()

        reader = self.spark.readStream.schema(self.schema).option(
            "maxFilesPerTrigger", self.max_files_per_trigger
        )
        stream = (
            reader.json(self.wal_dir)
            if self.wal_format == "json"
            else reader.parquet(self.wal_dir)
        )
        return (
            stream.writeStream.queryName(self.name)
            .foreachBatch(_apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime="0 seconds")
            .start()
        )

    def run_available(self) -> None:
        try:
            q = self.start()
            try:
                q.processAllAvailable()
            finally:
                q.stop()
                q.awaitTermination()
        except Exception as e:
            raise PipelineError(self.name, e) from e


@dataclass
class ChangeFeedRollup:
    """Continuously maintain an ADDITIVE downstream rollup from a source
    table's change feed — the deployable table→table materialized-
    aggregate pipeline: ``readStream.format("icelite")`` tails the source
    commit log, each micro-batch reduces to per-key PARTIAL aggregates
    (one `groupBy`, map-side combine), and the partials merge into an
    ``agg_cols`` target table. O(delta) at BOTH ends per micro-batch: the
    source plans only the new commits' files, the sink appends only the
    batch's partials — the target folds on read, so no micro-batch ever
    reads or rewrites accumulated state. Exact under ANY feed
    segmentation (``max_commits_per_batch``) because addition composes.

    ``aggs`` maps each target column to a spec: ``"count"``,
    ``"sum:<src_col>"``, ``"min:<src_col>"`` or ``"max:<src_col>"`` —
    validated against the target's declared ``agg_cols`` combine fns at
    start, so a rollup can't silently write partials the target folds
    with the wrong rule.

    Exactly-once: checkpoint offsets + run-id-namespaced ledger keys.
    NOTE (additive-specific): unlike LWW sinks, a RELOCATED checkpoint is
    NOT safe here — a fresh run id replays the feed with fresh batch
    keys and the partials double-count. Resume on the same checkpoint, or
    rebuild the target from scratch (reference analog: the truncate-and-
    resync path, src/etl/processor.rs replay-from-scratch). ``start``
    ENFORCES this: a checkpoint with no committed offsets pointed at a
    target that already holds this pipeline name's commits under another
    run id fails fast instead of silently double-counting
    (``allow_reprocess=True`` overrides, e.g. after a target rollback to
    a pre-rollup seq, where the surviving lineage HISTORY is not state).
    Pipeline ``name`` must therefore be unique per checkpoint — sharded
    deployments name each shard (tests/test_scd2.py uses ``scd2_s{i}``)."""

    spark: SparkSession
    source_path: str
    table_path: str
    checkpoint_dir: str
    key_cols: tuple = ("conv_id",)
    aggs: dict = field(default_factory=lambda: {"n_changes": "count"})
    name: str = "feed_rollup"
    max_commits_per_batch: int | None = None
    shard: str | None = None
    include_deletes: bool = True
    allow_reprocess: bool = False

    _SPEC_TO_TARGET_FN = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}

    @classmethod
    def create_target(
        cls,
        spark: SparkSession,
        path: str,
        source_path: str,
        key_cols=("conv_id",),
        aggs: dict | None = None,
        n_buckets: int = 32,
    ) -> IceliteTable:
        """Derive and create the additive target table from the agg spec:
        key columns typed from the source schema, one column per agg
        (count → long; sum → long for integer sources, double otherwise;
        min/max → source type), plus the source's seq column (the rollup
        writes max-of-batch, the fold keeps the global max)."""
        aggs = aggs or {"n_changes": "count"}
        src = IceliteTable.load(spark, source_path)
        sptr = src.pointer()
        if not sptr.get("seq_col"):
            raise ValueError("ChangeFeedRollup requires a seq_col source table")
        by_name = {f.name: f.dataType for f in src.schema.fields}
        fields = []
        for k in key_cols:
            if k not in by_name:
                raise ValueError(f"key column {k!r} not in source schema")
            fields.append(T.StructField(k, by_name[k]))
        agg_cols = {}
        for tcol, spec in aggs.items():
            fn, _, scol = spec.partition(":")
            if fn == "count":
                dt = T.LongType()
            else:
                if scol not in by_name:
                    raise ValueError(f"agg source column {scol!r} not in source")
                if fn == "sum":
                    dt = (
                        T.LongType()
                        if isinstance(
                            by_name[scol],
                            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
                        )
                        else T.DoubleType()
                    )
                elif fn in ("min", "max"):
                    dt = by_name[scol]
                else:
                    raise ValueError(f"unknown agg spec {spec!r} for {tcol!r}")
            fields.append(T.StructField(tcol, dt))
            agg_cols[tcol] = cls._SPEC_TO_TARGET_FN[fn]
        seq_col = sptr["seq_col"]
        fields.append(T.StructField(seq_col, T.LongType()))
        return IceliteTable.create(
            spark, path, T.StructType(fields),
            key_cols=list(key_cols), bucket_key=key_cols[0],
            n_buckets=n_buckets, order_cols=list(key_cols),
            seq_col=seq_col, agg_cols=agg_cols,
        )

    def _guard_fresh_checkpoint(self, target: IceliteTable, run_id: str) -> None:
        """Refuse the additive footgun at the only moment it is free to
        catch: a checkpoint with NO committed offsets replays the feed
        from the start under fresh batch keys, so if the target already
        holds this pipeline name's commits under a different run id,
        every replayed partial would double-count. An established
        checkpoint (offsets present) is always safe — its run id matches
        its own ledger keys, and a crash between offset write and merge
        replays with the SAME key (ledger no-op)."""
        if self.allow_reprocess:
            return
        import glob as _glob
        import os as _os

        if _glob.glob(_os.path.join(self.checkpoint_dir, "offsets", "*")):
            return
        prior = (
            target.lineage()
            .filter(F.col("source") == f"rollup:{self.name}")
            .select("batch_key")
            .collect()
        )
        foreign = sorted({
            r["batch_key"].rsplit(":", 2)[1]
            for r in prior
            if r["batch_key"] is not None
            and r["batch_key"].rsplit(":", 2)[1] != run_id
        })
        if foreign:
            raise ValueError(
                f"rollup {self.name!r}: fresh checkpoint "
                f"{self.checkpoint_dir!r} would replay the whole feed into "
                f"an additive target that already holds commits from "
                f"run(s) {foreign} — the partials would DOUBLE-COUNT. "
                "Resume the original checkpoint, rebuild the target, or "
                "pass allow_reprocess=True if the target state was rolled "
                "back to a pre-rollup seq."
            )

    def start(self):
        from pyspark.sql import functions as F

        from etl_rust_spark.sources import register_icelite_source

        register_icelite_source(self.spark)
        target = IceliteTable.load(self.spark, self.table_path)
        tptr = target.pointer()
        declared = tptr.get("agg_cols") or {}
        src_seq = IceliteTable.load(self.spark, self.source_path).pointer()["seq_col"]
        src_types = {
            f.name: f.dataType
            for f in IceliteTable.load(self.spark, self.source_path).schema.fields
        }
        exprs = []
        for tcol, spec in self.aggs.items():
            fn, _, scol = spec.partition(":")
            want = self._SPEC_TO_TARGET_FN.get(fn)
            if want is None:
                raise ValueError(f"unknown agg spec {spec!r} for {tcol!r}")
            if declared.get(tcol) != want:
                raise ValueError(
                    f"agg spec {spec!r} writes {want!r} partials but target "
                    f"column {tcol!r} folds with "
                    f"{declared.get(tcol)!r} — the accumulated value would "
                    "be wrong"
                )
            if fn == "count":
                exprs.append(F.count(F.lit(1)).cast("long").alias(tcol))
            elif fn == "sum":
                col = F.col(scol)
                if isinstance(src_types.get(scol), (T.DoubleType, T.FloatType)):
                    # same DECIMAL route as the target's fold: the partial
                    # a batch writes must not depend on its task order
                    exprs.append(
                        F.sum(col.cast("decimal(38,6)")).cast("double").alias(tcol)
                    )
                else:
                    exprs.append(F.sum(col).cast("long").alias(tcol))
            elif fn == "min":
                exprs.append(F.min(F.col(scol)).alias(tcol))
            else:
                exprs.append(F.max(F.col(scol)).alias(tcol))
        exprs.append(F.max(F.col(src_seq)).cast("long").alias(tptr["seq_col"]))
        run_id = _checkpoint_run_id(self.checkpoint_dir)
        self._guard_fresh_checkpoint(target, run_id)
        keys = list(self.key_cols)
        src_table = IceliteTable.load(self.spark, self.source_path)
        shard_t = _feed_shard_tuple(self.shard)

        def _apply(off_df: DataFrame, epoch_id: int) -> None:
            # JVM fast path: offsets-only batch → commit range →
            # read_changes (VERDICT r05 #4). Spark's column pruning
            # reaches the parquet scan here, so a count/turn rollup over
            # transcripts never decodes the text bytes — the projection
            # the Python data plane needed an explicit option for.
            rng = _offsets_range(off_df)
            if rng is None:
                return
            b = src_table.read_changes(rng[0] - 1, rng[1], shard=shard_t)
            if not self.include_deletes and "__deleted" in b.columns:
                b = b.filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
            parts = b.groupBy(*keys).agg(*exprs)
            target.merge(
                parts.withColumn("op", F.lit("U")),
                batch_key=f"{self.name}:{run_id}:{epoch_id}",
                seq_col=tptr["seq_col"], mode="mor",
                source=f"rollup:{self.name}",
            )

        return (
            _feed_offsets_reader(
                self.spark, self.source_path, self.max_commits_per_batch
            )
            .writeStream.queryName(self.name)
            .foreachBatch(_apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime="0 seconds")
            .start()
        )

    def run_available(self, max_drains: int = 64) -> None:
        """Drain the outstanding feed to quiescence (checkpoint-offset
        quiescence test — committed offsets vs the source head — so the
        caught-up confirmation costs no streaming query; r6)."""
        source = IceliteTable.load(self.spark, self.source_path)
        try:
            _feed_run_available(
                f"rollup {self.name}", self.checkpoint_dir, self.start,
                lambda: [source.current_seq()], max_drains,
            )
        except PipelineError:
            raise
        except Exception as e:
            raise PipelineError(self.name, e) from e


@dataclass
class PipelineManager:
    """Run K ingest pipelines concurrently on one SparkSession.

    The reference caps concurrency with a semaphore and fails fast on the
    first pipeline error (src/etl/manager.rs:76-102). Spark's scheduler
    replaces the semaphore (FAIR pools if isolation matters); fail-fast =
    awaitAnyTermination + stop_all.
    """

    spark: SparkSession
    pipelines: list[ChangelogIngest] = field(default_factory=list)

    def add_pipeline(self, p: ChangelogIngest) -> "PipelineManager":
        self.pipelines.append(p)
        return self

    def run_all_available(self) -> None:
        """Start all, drain all available input, stop all (batch-drain
        mode used by tests and replay jobs). Fail-fast: the first
        pipeline error stops every other query (B8 semantics,
        src/etl/manager.rs:97-99) and surfaces wrapped with its name."""
        for p in self.pipelines:
            if p.pre_process:
                p.pre_process()
        queries = [p.start() for p in self.pipelines]
        failed: PipelineError | None = None
        try:
            for p, q in zip(self.pipelines, queries):
                try:
                    q.processAllAvailable()
                except Exception as e:
                    failed = PipelineError(p.name, e)
                    raise failed from e
        finally:
            for q in queries:
                q.stop()
            for q in queries:
                try:
                    q.awaitTermination()
                except Exception:
                    if failed is None:
                        raise
        if failed is None:
            for p in self.pipelines:
                if p.post_process:
                    p.post_process()

    def start_all(self):
        return [p.start() for p in self.pipelines]

    def await_any(self, timeout: float | None = None):
        self.spark.streams.awaitAnyTermination(timeout)

    def stop_all(self) -> None:
        for q in self.spark.streams.active:
            q.stop()


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Event-time windowed aggregation with a watermark — the classic
    late-data-bounded streaming rollup (the reference has no event-time
    handling at all, SURVEY §2.4). Works on both batch and streaming
    DataFrames; on a stream the watermark bounds state: windows older than
    max(event_time) - watermark are finalized and their state dropped.
    """
    from pyspark.sql import functions as F

    ts = F.col(ts_col).cast("timestamp")
    df = events.withColumn("__ts", ts)
    if df.isStreaming:
        df = df.withWatermark("__ts", watermark)
    return (
        df.groupBy(F.window("__ts", window).alias("win"), *keys)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(14,6)")).cast("double").alias("total"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            "n",
            "total",
        )
    )
