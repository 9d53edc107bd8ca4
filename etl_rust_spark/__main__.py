"""spark-submit entrypoint: the engine as a deployable job.

    zip -r etl_rust_spark.zip etl_rust_spark
    spark-submit --py-files etl_rust_spark.zip -m etl_rust_spark \\
        ingest --wal-dir /data/wal --table /lake/transcripts \\
               --checkpoint /ckpt/transcripts --mode mor \\
               --compact-every 16 --compact-min-files 8 [--follow]

Subcommands map 1:1 onto the library surface (the reference's example
binary plays the same role for its pipeline, /root/reference/example/src/
main.rs:641-706):

- ``create``   — create the transcripts sink table
- ``ingest``   — tail WAL segments into the table (drain once, or
                 ``--follow`` to keep running until SIGTERM)
- ``compact``  — fold delta files (optionally only over-fragmented buckets)
- ``expire``   — garbage-collect snapshots past the retention window
- ``rebucket`` — rewrite the table under a new bucket count (growth move)
- ``remove-orphans`` — delete crash debris no snapshot references
- ``lineage``  — print the per-commit lineage ledger
- ``changes``  — print the incremental change feed since a snapshot
- ``delete-where`` / ``update-where`` — predicate delete / in-place
                 rewrite as first-class CDC events (GDPR, redaction)

On a real cluster, pass ``--master``/executor confs to spark-submit as
usual; this module only configures job semantics.
"""

from __future__ import annotations

import argparse
import sys


def _spark(args):
    from etl_rust_spark.session import get_spark

    return get_spark(f"etl-rust-spark:{args.cmd}")


def cmd_create(args) -> int:
    from etl_rust_spark.operators.apply import create_transcript_table

    create_transcript_table(
        _spark(args), args.table, n_buckets=args.n_buckets
    )
    print(f"created {args.table} (n_buckets={args.n_buckets})")
    return 0


def cmd_ingest(args) -> int:
    from etl_rust_spark.changelog import (
        CHANGELOG_SCHEMA,
        CHANGELOG_SCHEMA_EVOLVED,
    )
    from etl_rust_spark.streaming.driver import ChangelogIngest

    schema = CHANGELOG_SCHEMA_EVOLVED if args.evolved else CHANGELOG_SCHEMA
    rules = None
    if getattr(args, "rule", None):
        rules = {}
        for spec in args.rule:
            name, _, pred = spec.partition("=")
            if not pred:
                raise SystemExit(
                    f"--rule {spec!r}: expected <name>=<sql predicate a "
                    "valid row satisfies>"
                )
            rules[name] = pred
    audit = None
    if args.audit_reject_regex:
        from pyspark.sql import functions as F

        pat = args.audit_reject_regex

        def audit(view):  # WAP gate: reject a batch whose published view
            return view.filter(F.col("text").rlike(pat)).isEmpty()

    pipe = ChangelogIngest(
        spark=_spark(args),
        wal_dir=args.wal_dir,
        table_path=args.table,
        checkpoint_dir=args.checkpoint,
        schema=schema,
        name=args.name,
        wal_format=args.wal_format,
        mode=args.mode,
        max_files_per_trigger=args.max_files_per_trigger,
        compact_every=args.compact_every,
        compact_min_files=args.compact_min_files,
        salt_buckets=args.salt_buckets,
        audit=audit,
        on_reject=(lambda e: print(f"REJECTED batch epoch={e} (audit gate)"))
        if audit
        else None,
        quarantine_dir=args.quarantine_dir,
        rules=rules,
        quarantine_checks=not args.no_quarantine_checks,
        on_quarantine=(
            (lambda e, n: print(f"QUARANTINED {n} row(s) epoch={e}"))
            if args.quarantine_dir
            else None
        ),
    )
    if args.follow:
        q = pipe.start()
        q.awaitTermination()
    else:
        pipe.run_available()
        if pipe.rejected:
            print(f"rejected {len(pipe.rejected)} batch(es): {pipe.rejected}")
        if pipe.quarantined:
            total = sum(n for _, n in pipe.quarantined)
            print(f"quarantined {total} row(s) across "
                  f"{len(pipe.quarantined)} batch(es)")
    return 0


def cmd_scd2(args) -> int:
    """Deployable table→history pipeline: tail a source table's change
    feed and maintain an SCD2 version log (valid_from/valid_to intervals
    derived on read; as_of(seq) == time travel)."""
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.streaming.scd2 import ChangeFeedScd2

    spark = _spark(args)
    try:
        ChangeFeedScd2.create_target(
            spark, args.table, args.source, n_buckets=args.n_buckets
        )
    except FileExistsError:
        IceliteTable.load(spark, args.table)  # resume into the existing log
    pipe = ChangeFeedScd2(
        spark=spark, source_path=args.source, table_path=args.table,
        checkpoint_dir=args.checkpoint, name=args.name,
        max_commits_per_batch=args.max_commits_per_batch, shard=args.shard,
    )
    if args.follow:
        q = pipe.start()
        q.awaitTermination()
    else:
        pipe.run_available()
        hist = ChangeFeedScd2.read_history(spark, args.table)
        t = IceliteTable.load(spark, args.table)
        print(f"scd2 at seq {t.current_seq()}: {hist.count()} versions")
    return 0


def cmd_enrich(args) -> int:
    """Deployable stream enrichment: fact change feed + pinned dim
    time-travel snapshot per micro-batch → enriched target."""
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.streaming.enrich import ChangeFeedEnrich

    spark = _spark(args)
    try:
        ChangeFeedEnrich.create_target(
            spark, args.table, args.facts, args.dim,
            suffix=args.suffix, n_buckets=args.n_buckets,
        )
    except FileExistsError:
        IceliteTable.load(spark, args.table)  # resume into the existing table
    pipe = ChangeFeedEnrich(
        spark=spark, fact_path=args.facts, dim_path=args.dim,
        table_path=args.table, checkpoint_dir=args.checkpoint,
        suffix=args.suffix, name=args.name,
        max_commits_per_batch=args.max_commits_per_batch, shard=args.shard,
    )
    if args.follow:
        q = pipe.start()
        q.awaitTermination()
    else:
        pipe.run_available()
        t = IceliteTable.load(spark, args.table)
        print(f"enriched at seq {t.current_seq()}: {t.read().count()} rows")
    return 0


def cmd_scd2_read(args) -> int:
    """Read an SCD2 version log as JSON lines: the full interval history,
    or the reconstructed key state at --as-of-seq."""
    from etl_rust_spark.streaming.scd2 import ChangeFeedScd2

    spark = _spark(args)
    df = (
        ChangeFeedScd2.as_of(spark, args.table, args.as_of_seq)
        if args.as_of_seq is not None
        else ChangeFeedScd2.read_history(spark, args.table)
    )
    for row in df.toJSON().toLocalIterator(prefetchPartitions=True):
        print(row, flush=True)
    return 0


def cmd_rollup(args) -> int:
    """Deployable materialized view: windowed per-key aggregates
    continuously upserted into an Icelite rollup table."""
    from pyspark.sql import types as T

    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.streaming.driver import WindowedRollupIngest

    spark = _spark(args)
    schema = T.StructType.fromDDL(args.schema_ddl)
    key_field = next(f for f in schema.fields if f.name == args.key_col)
    try:
        WindowedRollupIngest.create_table(
            spark, args.table, key_field, n_buckets=args.n_buckets
        )
    except FileExistsError:
        IceliteTable.load(spark, args.table)  # resume into the existing table
    pipe = WindowedRollupIngest(
        spark=spark, wal_dir=args.wal_dir, table_path=args.table,
        checkpoint_dir=args.checkpoint, schema=schema, name=args.name,
        window=args.window, ts_col=args.ts_col, key_col=args.key_col,
        value_col=args.value_col, watermark=args.watermark,
    )
    if args.follow:
        q = pipe.start()
        q.awaitTermination()
    else:
        pipe.run_available()
        t = IceliteTable.load(spark, args.table)
        print(f"rollup at seq {t.current_seq()}: {t.read().count()} window rows")
    return 0


def cmd_feed_rollup(args) -> int:
    """Deployable table→table additive rollup: tail a source table's
    change feed and maintain per-key accumulated aggregates in an
    agg_cols target — O(delta) per micro-batch at both ends."""
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.streaming.driver import ChangeFeedRollup

    spark = _spark(args)
    keys = tuple(args.keys.split(","))
    aggs = {}
    for spec in args.agg:
        tcol, _, rest = spec.partition("=")
        if not rest:
            raise SystemExit(
                f"--agg {spec!r}: expected <target_col>=count|sum:<col>|"
                "min:<col>|max:<col>"
            )
        aggs[tcol] = rest
    try:
        ChangeFeedRollup.create_target(
            spark, args.table, args.source, key_cols=keys, aggs=aggs,
            n_buckets=args.n_buckets,
        )
    except FileExistsError:
        IceliteTable.load(spark, args.table)  # resume into the existing table
    pipe = ChangeFeedRollup(
        spark=spark, source_path=args.source, table_path=args.table,
        checkpoint_dir=args.checkpoint, key_cols=keys, aggs=aggs,
        name=args.name, max_commits_per_batch=args.max_commits_per_batch,
        shard=args.shard, allow_reprocess=args.allow_reprocess,
    )
    if args.follow:
        q = pipe.start()
        q.awaitTermination()
    else:
        pipe.run_available()
        t = IceliteTable.load(spark, args.table)
        print(f"feed rollup at seq {t.current_seq()}: {t.read().count()} keys")
    return 0


def cmd_feed_transform(args) -> int:
    """Deployable table→table materialized transform: tail a source's
    change feed and maintain a target equal to selectExpr(...) over the
    source's live rows (1→N fan-out + group replacement, exactly-once).
    The target's schema is inferred from the expressions; pass --keys
    (and --bucket-key, one of the source's key columns) on first run to
    create it."""
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.streaming.transform import ChangeFeedTransform

    spark = _spark(args)
    exprs = args.expr

    def transform(df):
        return df.selectExpr(*exprs)

    src = IceliteTable.load(spark, args.source)
    if args.keys:
        keys = args.keys.split(",")
        out_schema = transform(
            spark.createDataFrame([], src.schema)
        ).schema
        try:
            IceliteTable.create(
                spark, args.table, out_schema, key_cols=keys,
                bucket_key=args.bucket_key or keys[0],
                n_buckets=args.n_buckets, order_cols=keys,
                seq_col=src.pointer()["seq_col"],
            )
        except FileExistsError:
            pass  # resume into the existing target
    pipe = ChangeFeedTransform(
        spark=spark, source_path=args.source, table_path=args.table,
        checkpoint_dir=args.checkpoint, transform=transform,
        name=args.name, max_commits_per_batch=args.max_commits_per_batch,
        shard=args.shard,
    )
    if args.follow:
        q = pipe.start()
        q.awaitTermination()
    else:
        pipe.run_available()
        t = IceliteTable.load(spark, args.table)
        print(
            f"feed transform at seq {t.current_seq()}: "
            f"{t.read().count()} derived rows (incl. tombstones)"
        )
    return 0


def cmd_feed_join(args) -> int:
    """Deployable incremental JOIN materialization: tail BOTH tables'
    change feeds and maintain a target equal to their inner equi-join on
    the shared key columns — a change on either side re-derives the
    joined rows it touches (bidirectional, unlike `enrich`). The target
    is derived and created on first run (A's columns + B's suffixed)."""
    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.streaming.join import ChangeFeedJoin

    spark = _spark(args)
    join_cols = args.on.split(",")
    try:
        ChangeFeedJoin.create_target(
            spark, args.table, args.a, args.b, join_cols=join_cols,
            suffix=args.suffix, n_buckets=args.n_buckets,
        )
    except FileExistsError:
        IceliteTable.load(spark, args.table)  # resume into the existing one
    pipe = ChangeFeedJoin(
        spark=spark, a_path=args.a, b_path=args.b, table_path=args.table,
        checkpoint_dir=args.checkpoint, join_cols=join_cols,
        suffix=args.suffix, name=args.name, how=args.how,
        shard=args.shard,
        max_commits_per_batch=args.max_commits_per_batch,
    )
    if args.follow:
        q = pipe.start()
        q.awaitTermination()
    else:
        pipe.run_available()
        t = IceliteTable.load(spark, args.table)
        print(
            f"feed join at seq {t.current_seq()}: "
            f"{t.read().count()} joined rows (incl. tombstones)"
        )
    return 0


def cmd_delete_where(args) -> int:
    """Predicate delete (GDPR/retention job): tombstone every live key
    matching the condition; deletes flow to consumers via the change
    feed. Purge pipeline: delete-where -> compact -> expire -> GC."""
    import json as _json

    from etl_rust_spark.lake.format import IceliteTable

    caster = {
        "string": str, "long": int, "double": float,
        "ts": lambda v: v,  # ISO string; read() normalizes vs epoch stats
    }[args.value_type]
    t = IceliteTable.load(_spark(args), args.table)
    rec = t.delete_where(
        [(args.col, args.op, caster(args.value))],
        at_seq=args.at_seq, batch_key=args.batch_key,
    )
    if rec is None:
        print('{"deleted": 0}')
    else:
        print(_json.dumps({"deleted": rec["n_deletes"],
                           "commit_seq": rec["commit_seq"]}))
    return 0


def cmd_fsck(args) -> int:
    """Read-only integrity check: metadata <-> filesystem consistency
    for every retained snapshot (--deep adds a parquet-footer pass).
    Exit 0 when clean, 1 when any error is found."""
    import json as _json

    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    report = t.fsck(deep=args.deep)
    print(_json.dumps(report))
    return 0 if report["ok"] else 1


def cmd_clone(args) -> int:
    """Snapshot export: one snapshot as a NEW independent table (hard-
    linked data, ledger carried — restore-and-continue DR / dev fork)."""
    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    src_seq = t.current_seq() if args.at_seq is None else args.at_seq
    c = t.clone(args.dest, seq=args.at_seq)
    print(f"cloned {args.table}@{src_seq} -> {args.dest} "
          f"(clone seq {c.current_seq()})")
    return 0


def cmd_update_where(args) -> int:
    """Predicate update (backfill/redaction job): rewrite the matching
    live rows in place via SET expressions evaluated against the old
    row; updates flow to consumers via the change feed."""
    import json as _json

    from etl_rust_spark.lake.format import IceliteTable

    caster = {
        "string": str, "long": int, "double": float,
        "ts": lambda v: v,  # ISO string; read() normalizes vs epoch stats
    }[args.value_type]
    assignments = {}
    for s in args.set:
        col, eq, expr = s.partition("=")
        if not eq:
            raise SystemExit(f"--set needs col=sql_expr, got {s!r}")
        assignments[col.strip()] = expr.strip()
    t = IceliteTable.load(_spark(args), args.table)
    rec = t.update_where(
        [(args.col, args.op, caster(args.value))],
        assignments,
        at_seq=args.at_seq, batch_key=args.batch_key,
    )
    if rec is None:
        print('{"updated": 0}')
    else:
        print(_json.dumps({"updated": rec["n_upserts"],
                           "commit_seq": rec["commit_seq"]}))
    return 0


def cmd_compact(args) -> int:
    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    if getattr(args, "deltas_only", False):
        if args.zorder:
            raise SystemExit("--deltas-only cannot z-order (base untouched)")
        snap = t.compact_deltas(
            min_delta_files_per_bucket=(
                args.min_files_per_bucket
                if args.min_files_per_bucket is not None else 4
            ),
        )
    else:
        snap = t.compact(
            min_files_per_bucket=args.min_files_per_bucket,
            zorder=args.zorder.split(",") if args.zorder else None,
            files_per_bucket=args.files_per_bucket,
        )
    print(f"compacted to seq {snap['seq']} ({len(snap['files'])} live files)")
    return 0


def cmd_expire(args) -> int:
    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    older = None
    if args.older_than is not None:
        try:
            older = float(args.older_than)  # epoch seconds
        except ValueError:
            import datetime as _dt

            older = _dt.datetime.fromisoformat(args.older_than)
    removed = t.expire_snapshots(keep_last=args.keep_last, older_than=older)
    print(f"removed {len(removed)} files")
    return 0


def cmd_rollback(args) -> int:
    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    rec = t.rollback(args.to_seq)
    print(
        f"rolled back to seq {rec['rolled_back_to']} "
        f"(from {rec['rolled_back_from']}) at seq {rec['commit_seq']}"
    )
    return 0


def cmd_rewrite_manifests(args) -> int:
    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    before = t.describe()["n_manifests"]
    snap = t.rewrite_manifests(
        target_files_per_manifest=args.target_files_per_manifest
    )
    print(
        f"manifests {before} -> {len(snap['manifests'])} at seq {snap['seq']}"
        " (metadata-only; no data files touched)"
    )
    return 0


def cmd_rebucket(args) -> int:
    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    snap = t.rebucket(args.n_buckets)
    print(f"rebucketed to n_buckets={args.n_buckets} at seq {snap['seq']}")
    return 0


def cmd_maintain(args) -> int:
    """One-shot threshold-driven table service (Iceberg's maintenance
    jobs as one idempotent command, cron-able against a live writer —
    every action rebases over concurrent appends): PARTIAL compaction
    only when some bucket's file count exceeds the threshold (O(hot
    buckets), the only affordable policy at scale), then snapshot
    expiry, then grace-aged orphan GC. Reads health from metadata only
    (describe()), so a no-op run costs no data I/O."""
    import json as _json

    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    health = t.describe()
    did: dict = {"before": health}
    if args.retention_days is not None:
        # row-level TTL as a first-class CDC event (delete_where), BEFORE
        # compaction so the tombstones can fold in the same service run.
        # The batch key quantizes the cutoff to a day: a same-day cron
        # re-run replays into the exactly-once ledger as a no-op; the
        # next day's run carries a fresh key and purges the next slice.
        import datetime as _dt
        import time as _time

        cutoff_day = int(
            (_time.time() - args.retention_days * 86400.0) // 86400
        )
        cutoff = _dt.datetime.fromtimestamp(
            cutoff_day * 86400, tz=_dt.timezone.utc
        ).replace(tzinfo=None)
        rec = t.delete_where(
            [(args.retention_ts_col, "<", cutoff)],
            batch_key=f"retention:{args.retention_ts_col}:{cutoff_day}",
            source="retention",
        )
        did["retention_cutoff"] = cutoff.isoformat()
        did["retention_deleted"] = int(rec["n_deletes"]) if rec else 0
    if health["max_files_per_bucket"] > args.compact_threshold:
        snap = t.compact(min_files_per_bucket=args.compact_threshold)
        did["compacted_to_seq"] = snap["seq"]
    elif args.delta_threshold is not None:
        # buckets below the full-compaction threshold may still carry a
        # delta trickle worth folding cheaply (base never rewritten)
        seq_now = t.current_seq()
        snap = t.compact_deltas(
            min_delta_files_per_bucket=args.delta_threshold
        )
        if snap["seq"] != seq_now:
            did["delta_compacted_to_seq"] = snap["seq"]
    if (
        args.manifest_threshold is not None
        and t.describe()["n_manifests"] > args.manifest_threshold
    ):
        # files healthy but metadata fragmented: fold manifests without
        # a data rewrite (compaction above may already have folded them)
        snap = t.rewrite_manifests()
        did["manifests_rewritten_to_seq"] = snap["seq"]
    if args.keep_last is not None or args.expire_older_than_days is not None:
        import time as _time

        older = (
            _time.time() - args.expire_older_than_days * 86400.0
            if args.expire_older_than_days is not None
            else None
        )
        did["expired"] = len(
            t.expire_snapshots(
                keep_last=args.keep_last
                if args.keep_last is not None
                else 2,
                older_than=older,
            )
        )
    if args.orphan_grace_sec is not None:
        did["orphans_removed"] = len(
            t.remove_orphans(grace_sec=args.orphan_grace_sec)
        )
    did["after"] = t.describe()
    print(_json.dumps(did))
    return 0


def cmd_branch(args) -> int:
    # pure metadata ops — no SparkSession (and no JVM startup) needed
    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable(None, args.table)
    if args.action != "list" and not args.name:
        raise SystemExit(f"branch {args.action} requires --name")
    if args.action == "create":
        t.create_branch(args.name, at_seq=args.at_seq)
        info = t.branches()[args.name]
        print(f"created branch {args.name!r} at seq {info['fork_seq']}")
    elif args.action == "list":
        for name, info in sorted(t.branches().items()):
            print(f"{name}\tfork={info['fork_seq']}\ttip={info['tip_seq']}")
    elif args.action == "delete":
        t.delete_branch(args.name)
        print(f"deleted branch {args.name!r}")
    elif args.action == "fast-forward":
        res = t.fast_forward(args.name)
        print(
            f"published {res['published']} commit(s) from {args.name!r} "
            f"(fork seq {res['fork_seq']} -> tip seq {res['tip_seq']})"
        )
    return 0


def cmd_tag(args) -> int:
    # pure metadata ops — no SparkSession (and no JVM startup) needed
    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable(None, args.table)
    if args.action != "list" and not args.name:
        raise SystemExit(f"tag {args.action} requires --name")
    if args.action == "create":
        seq = t.tag_snapshot(args.name, seq=args.at_seq)
        print(f"tagged snapshot {seq} as {args.name!r}")
    elif args.action == "list":
        for name, seq in sorted(t.tags().items()):
            print(f"{name}\tseq={seq}")
    elif args.action == "drop":
        t.drop_tag(args.name)
        print(f"dropped tag {args.name!r}")
    return 0


def cmd_rename_column(args) -> int:
    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    snap = t.rename_column(args.old, args.new)
    print(f"renamed {args.old} -> {args.new} at seq {snap['seq']} (metadata-only)")
    return 0


def cmd_add_column(args) -> int:
    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    snap = t.add_column(args.column, args.type, agg=args.agg)
    print(
        f"added {args.column} {args.type} at seq {snap['seq']} "
        "(metadata-only; existing rows read NULL)"
    )
    return 0


def cmd_drop_column(args) -> int:
    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    snap = t.drop_column(args.column)
    print(f"dropped {args.column} at seq {snap['seq']} (metadata-only)")
    return 0


def cmd_check(args) -> int:
    """Manage writer-enforced CHECK constraints: --add NAME EXPR adds one
    (validating existing rows unless --no-validate), --drop NAME removes
    one, no flags lists the table's checks as JSON."""
    import json as _json

    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    if args.report:
        extra = dict(r.split("=", 1) for r in args.rule or [])
        rep = t.check_report(extra=extra)
        print(_json.dumps(rep, indent=2))
        return 1 if any(rep.values()) else 0
    if args.add:
        name, expr = args.add
        snap = t.add_check(name, expr, validate=not args.no_validate)
        print(f"added CHECK {name} at seq {snap['seq']} (metadata-only)")
    elif args.drop:
        snap = t.drop_check(args.drop)
        print(f"dropped CHECK {args.drop} at seq {snap['seq']} (metadata-only)")
    else:
        print(_json.dumps(t.pointer().get("checks") or {}, indent=2))
    return 0


def cmd_sync_snapshot(args) -> int:
    """Reconcile the table's live state against a full upstream snapshot
    (parquet dir/file): diff → one CDC commit of exactly the changes."""
    import json as _json

    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.operators.apply import sync_snapshot

    spark = _spark(args)
    t = IceliteTable.load(spark, args.table)
    snap = spark.read.parquet(args.snapshot)
    where = [(c, "=", v) for c, v in
             (s.split("=", 1) for s in args.scope or [])] or None
    rep = sync_snapshot(
        t, snap, batch_key=args.batch_key, at_seq=args.at_seq,
        mode=args.mode, where=where,
    )
    if rep is None:
        print('{"status": "no-op (already applied or zero diff)"}')
    else:
        rep.pop("lineage", None)
        print(_json.dumps(rep))
    return 0


def cmd_remove_orphans(args) -> int:
    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    removed = t.remove_orphans(grace_sec=args.grace_sec, dry_run=args.dry_run)
    verb = "would remove" if args.dry_run else "removed"
    print(f"{verb} {len(removed)} orphaned files")
    for p in removed if args.dry_run else ():
        print(p)
    return 0


def cmd_lineage(args) -> int:
    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    t.lineage().orderBy("commit_seq").show(args.limit, truncate=False)
    return 0


def cmd_changes(args) -> int:
    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    since = args.since
    if args.since_timestamp is not None:
        # source semantics, not table time travel: pre-creation instants
        # mean the FULL feed; pre-retention instants fail loud
        from etl_rust_spark.sources.icelite_source import _TableMeta, _epoch

        since = _TableMeta(args.table).seq_as_of(_epoch(args.since_timestamp))
    feed = (
        t.read_changes_with_preimage(since)
        if args.preimage
        else t.read_changes(since)
    )
    feed.orderBy("_commit_seq").show(args.limit, truncate=False)
    return 0


def cmd_describe(args) -> int:
    import json as _json

    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    print(_json.dumps(t.describe(), indent=2))
    return 0


def cmd_count(args) -> int:
    """Exact live-row count, metadata-first (count_live's tier split is
    printed so an operator sees whether the snapshot's count was free or
    paid a scan — a big tombstone_scan/dedup tier is the cue to run
    maintain)."""
    import json as _json

    from etl_rust_spark.lake.format import IceliteTable

    t = IceliteTable.load(_spark(args), args.table)
    d = t.count_live(col=args.col, seq=args.seq, detail=True)
    print(_json.dumps(d, indent=2))
    return 0


def cmd_tail(args) -> int:
    """Continuously tail the table's commit log as a STREAM (the
    format('icelite') source) and emit each micro-batch of changes as
    JSON lines — the deployable change-consumer (an index builder or
    feature job replaces the print with its own sink). --once drains
    what exists and exits; the checkpoint makes either mode resume
    exactly-once."""
    from etl_rust_spark.sources import register_icelite_source

    spark = _spark(args)
    register_icelite_source(spark)

    def emit(df, epoch_id):
        # toLocalIterator streams one partition at a time to the driver,
        # so a catch-up over a large backlog never materializes a whole
        # micro-batch driver-side (each partition is one change file)
        for row in df.toJSON().toLocalIterator(prefetchPartitions=True):
            print(row, flush=True)

    src = spark.readStream.format("icelite").option("path", args.table)
    if args.since_timestamp is not None:
        src = src.option("sinceTimestamp", args.since_timestamp)
    else:
        src = src.option("sinceSeq", str(args.since))
    if args.max_commits_per_batch:
        # source-side bound: a backlog drains in ceil(N/k) micro-batches
        src = src.option("maxCommitsPerBatch", str(args.max_commits_per_batch))
    if args.shard:
        # consumer i of k: file-level bucket sharding — k parallel tails
        # partition the feed disjointly with metadata-only pruning
        src = src.option("shard", args.shard)
    w = (
        src.load()
        .writeStream.foreachBatch(emit)
        .option("checkpointLocation", args.checkpoint)
    )
    if args.once:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = w.trigger(processingTime=args.interval).start()
        q.awaitTermination(args.timeout_sec)
        q.stop()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="etl_rust_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create", help="create the transcripts sink table")
    c.add_argument("--table", required=True)
    c.add_argument("--n-buckets", type=int, default=32)
    c.set_defaults(fn=cmd_create)

    fr = sub.add_parser(
        "feed-rollup",
        help="additive rollup maintained from a table's change feed "
             "(table→table materialized aggregate, O(delta) per batch)",
    )
    fr.add_argument("--source", required=True, help="source Icelite table")
    fr.add_argument("--table", required=True, help="additive target table")
    fr.add_argument("--checkpoint", required=True)
    fr.add_argument("--keys", default="conv_id",
                    help="comma-separated group keys")
    fr.add_argument("--agg", action="append", required=True,
                    help="target_col=count|sum:<col>|min:<col>|max:<col> "
                         "(repeatable)")
    fr.add_argument("--name", default="feed_rollup")
    fr.add_argument("--n-buckets", type=int, default=32)
    fr.add_argument("--max-commits-per-batch", type=int, default=None)
    fr.add_argument("--shard", default=None, help='consumer shard "i/k"')
    fr.add_argument("--allow-reprocess", action="store_true",
                    help="override the fresh-checkpoint double-count "
                         "guard (only safe after a target rollback)")
    fr.add_argument("--follow", action="store_true")
    fr.set_defaults(fn=cmd_feed_rollup)

    ft = sub.add_parser(
        "feed-transform",
        help="materialized transform maintained from a table's change "
             "feed: target == selectExpr(...) over the source's live "
             "rows (1→N fan-out, group replacement, exactly-once)",
    )
    ft.add_argument("--source", required=True, help="source Icelite table")
    ft.add_argument("--table", required=True, help="derived target table")
    ft.add_argument("--checkpoint", required=True)
    ft.add_argument("--expr", action="append", required=True,
                    help="selectExpr projection (repeatable); must produce "
                         "the target keys and carry the source seq column")
    ft.add_argument("--keys", default=None,
                    help="comma-separated target key columns — creates the "
                         "target (schema inferred from --expr) if missing")
    ft.add_argument("--bucket-key", default=None,
                    help="target bucket key (default: first of --keys; "
                         "must be one of the source's key columns)")
    ft.add_argument("--name", default="feed_transform")
    ft.add_argument("--n-buckets", type=int, default=32)
    ft.add_argument("--max-commits-per-batch", type=int, default=None)
    ft.add_argument("--shard", default=None, help='consumer shard "i/k"')
    ft.add_argument("--follow", action="store_true")
    ft.set_defaults(fn=cmd_feed_transform)

    fj = sub.add_parser(
        "feed-join",
        help="incremental join materialization from two tables' change "
             "feeds: target == A ⋈ B on the shared keys, bidirectional "
             "(either side's change re-derives), exactly-once",
    )
    fj.add_argument("--a", required=True, help="left Icelite table")
    fj.add_argument("--b", required=True, help="right Icelite table")
    fj.add_argument("--table", required=True, help="join target table")
    fj.add_argument("--checkpoint", required=True)
    fj.add_argument("--on", required=True,
                    help="comma-separated join columns (key columns on "
                         "both sides; both bucket keys must be among "
                         "them)")
    fj.add_argument("--suffix", default="_b",
                    help="suffix for B's non-join columns in the target")
    fj.add_argument("--how", default="inner", choices=["inner", "left"],
                    help="left keeps unmatched A rows with NULL B payload")
    fj.add_argument("--shard", default=None,
                    help='consumer shard "i/k" — requires both sources '
                         "bucketed on the same join column with equal "
                         "n_buckets")
    fj.add_argument("--name", default="feed_join")
    fj.add_argument("--n-buckets", type=int, default=32)
    fj.add_argument("--max-commits-per-batch", type=int, default=None)
    fj.add_argument("--follow", action="store_true")
    fj.set_defaults(fn=cmd_feed_join)

    i = sub.add_parser("ingest", help="tail WAL segments into the table")
    i.add_argument("--wal-dir", required=True)
    i.add_argument("--table", required=True)
    i.add_argument("--checkpoint", required=True)
    i.add_argument("--name", default="transcripts_ingest")
    i.add_argument("--wal-format", choices=["parquet", "json"], default="parquet")
    i.add_argument("--mode", choices=["cow", "mor"], default="mor")
    i.add_argument("--max-files-per-trigger", type=int, default=1)
    i.add_argument("--compact-every", type=int, default=None)
    i.add_argument("--compact-min-files", type=int, default=None)
    i.add_argument("--salt-buckets", type=int, default=None)
    i.add_argument("--evolved", action="store_true",
                   help="WAL schema includes the evolved meta column")
    i.add_argument("--audit-reject-regex", default=None,
                   help="WAP gate: stage each micro-batch and REJECT it "
                        "(drop, quarantine the epoch) when any text matches "
                        "this regex; requires --mode mor")
    i.add_argument("--follow", action="store_true",
                   help="keep tailing (default: drain available and exit)")
    i.add_argument("--quarantine-dir", default=None,
                   help="dead-letter sink: rows failing validation rules "
                        "divert here as parquet with a _violations array "
                        "instead of killing the pipeline")
    i.add_argument("--rule", action="append", default=None,
                   help="<name>=<sql predicate a VALID row satisfies> "
                        "(repeatable; default rules derive from the table: "
                        "keys/lsn non-null, op valid); requires "
                        "--quarantine-dir")
    i.add_argument("--no-quarantine-checks", action="store_true",
                   help="do NOT auto-derive quarantine rules from the "
                        "table's CHECK constraints (violations then fail "
                        "the batch via merge's enforcement instead of "
                        "diverting rows)")
    i.set_defaults(fn=cmd_ingest)

    s2 = sub.add_parser(
        "scd2",
        help="SCD2 version log maintained from a table's change feed "
             "(type-2 history: valid_from/valid_to intervals, as-of "
             "reconstruction; O(delta) appends per batch)",
    )
    s2.add_argument("--source", required=True, help="source Icelite table")
    s2.add_argument("--table", required=True, help="SCD2 version-log table")
    s2.add_argument("--checkpoint", required=True)
    s2.add_argument("--name", default="scd2")
    s2.add_argument("--n-buckets", type=int, default=32)
    s2.add_argument("--max-commits-per-batch", type=int, default=None)
    s2.add_argument("--shard", default=None, help='consumer shard "i/k"')
    s2.add_argument("--follow", action="store_true")
    s2.set_defaults(fn=cmd_scd2)

    en = sub.add_parser(
        "enrich",
        help="maintain a fact table's enriched replica: change-feed tail "
             "+ pinned dim time-travel snapshot per micro-batch "
             "(deterministic replay)",
    )
    en.add_argument("--facts", required=True, help="fact Icelite table")
    en.add_argument("--dim", required=True, help="dimension Icelite table")
    en.add_argument("--table", required=True, help="enriched target table")
    en.add_argument("--checkpoint", required=True)
    en.add_argument("--suffix", default="_dim",
                    help="suffix for dim payload columns in the target")
    en.add_argument("--name", default="enrich")
    en.add_argument("--n-buckets", type=int, default=32)
    en.add_argument("--max-commits-per-batch", type=int, default=None)
    en.add_argument("--shard", default=None, help='consumer shard "i/k"')
    en.add_argument("--follow", action="store_true")
    en.set_defaults(fn=cmd_enrich)

    s2r = sub.add_parser(
        "scd2-read",
        help="print an SCD2 version log as JSON lines (full interval "
             "history, or --as-of-seq N for the state at source commit N)",
    )
    s2r.add_argument("--table", required=True)
    s2r.add_argument("--as-of-seq", type=int, default=None)
    s2r.set_defaults(fn=cmd_scd2_read)

    ru = sub.add_parser(
        "rollup", help="windowed aggregate table continuously upserted (mat. view)"
    )
    ru.add_argument("--wal-dir", required=True)
    ru.add_argument("--table", required=True)
    ru.add_argument("--checkpoint", required=True)
    ru.add_argument("--schema-ddl", required=True,
                    help='input schema DDL, e.g. "event_id long, ts timestamp,'
                         ' user_id long, value double"')
    ru.add_argument("--name", default="rollup")
    ru.add_argument("--window", default="1 hour")
    ru.add_argument("--ts-col", default="ts")
    ru.add_argument("--key-col", default="user_id")
    ru.add_argument("--value-col", default="value")
    ru.add_argument("--watermark", default="2 hours")
    ru.add_argument("--n-buckets", type=int, default=8)
    ru.add_argument("--follow", action="store_true")
    ru.set_defaults(fn=cmd_rollup)

    dw = sub.add_parser(
        "delete-where",
        help="tombstone every live key matching a predicate "
             "(GDPR/retention; deletes flow through the change feed)",
    )
    dw.add_argument("--table", required=True)
    dw.add_argument("--col", required=True)
    dw.add_argument("--op", default="=",
                    choices=["=", "<", "<=", ">", ">="])
    dw.add_argument("--value", required=True)
    dw.add_argument("--value-type", default="string",
                    choices=["string", "long", "double", "ts"])
    dw.add_argument("--at-seq", type=int, default=None,
                    help="tombstone sequence (default: 1 + max matched seq)")
    dw.add_argument("--batch-key", default=None,
                    help="exactly-once ledger key for the delete job")
    dw.set_defaults(fn=cmd_delete_where)

    fk = sub.add_parser(
        "fsck",
        help="read-only integrity check (pointers, manifests, ledger, "
             "data-file existence + sizes; --deep adds footer row "
             "counts); exit 1 on any error",
    )
    fk.add_argument("--table", required=True)
    fk.add_argument("--deep", action="store_true",
                    help="also open every live parquet footer and "
                         "compare row counts")
    fk.set_defaults(fn=cmd_fsck)

    cl = sub.add_parser(
        "clone",
        help="export one snapshot as a new independent table "
             "(hard-linked data + carried ledger; backup/DR/dev fork)",
    )
    cl.add_argument("--table", required=True)
    cl.add_argument("--dest", required=True)
    cl.add_argument("--at-seq", type=int, default=None,
                    help="snapshot to export (default: current) — "
                         "point-in-time restore")
    cl.set_defaults(fn=cmd_clone)

    uw = sub.add_parser(
        "update-where",
        help="rewrite every live row matching a predicate via SET "
             "expressions (backfill/redaction; updates flow through "
             "the change feed)",
    )
    uw.add_argument("--table", required=True)
    uw.add_argument("--col", required=True)
    uw.add_argument("--op", default="=",
                    choices=["=", "<", "<=", ">", ">="])
    uw.add_argument("--value", required=True)
    uw.add_argument("--value-type", default="string",
                    choices=["string", "long", "double", "ts"])
    uw.add_argument("--set", action="append", required=True,
                    metavar="COL=SQL_EXPR",
                    help="assignment evaluated against the OLD row "
                         "(repeatable; simultaneous semantics)")
    uw.add_argument("--at-seq", type=int, default=None,
                    help="rewrite sequence (default: 1 + max matched seq)")
    uw.add_argument("--batch-key", default=None,
                    help="exactly-once ledger key for the update job")
    uw.set_defaults(fn=cmd_update_where)

    k = sub.add_parser("compact", help="fold delta files")
    k.add_argument("--table", required=True)
    k.add_argument("--min-files-per-bucket", type=int, default=None)
    k.add_argument(
        "--zorder", default=None,
        help="comma-separated numeric/temporal columns for morton-ordered layout",
    )
    k.add_argument(
        "--files-per-bucket", type=int, default=None,
        help="target files per compacted bucket: with --zorder the "
        "morton-range split (default 4); without, a key-range split "
        "capping file size (default: one file per bucket)",
    )
    k.add_argument(
        "--deltas-only", action="store_true",
        help="minor compaction: fold only each hot bucket's delta files "
        "(base files never rewritten; write cost bounded by delta bytes)",
    )
    k.set_defaults(fn=cmd_compact)

    e = sub.add_parser("expire", help="expire old snapshots")
    e.add_argument(
        "--older-than", default=None,
        help="age cutoff (ISO datetime, UTC, or epoch seconds): only "
        "snapshots committed before this expire; --keep-last still "
        "retains that many most-recent regardless of age",
    )
    e.add_argument("--table", required=True)
    e.add_argument("--keep-last", type=int, default=2)
    e.set_defaults(fn=cmd_expire)

    rk = sub.add_parser(
        "rollback",
        help="restore a prior snapshot as a new commit (history kept)",
    )
    rk.add_argument("--table", required=True)
    rk.add_argument("--to-seq", type=int, required=True)
    rk.set_defaults(fn=cmd_rollback)

    rw = sub.add_parser(
        "rewrite-manifests",
        help="fold many small per-commit manifests into few large ones "
        "(metadata-only; no data rewrite)",
    )
    rw.add_argument("--table", required=True)
    rw.add_argument(
        "--target-files-per-manifest", type=int, default=4096,
        help="max file entries per consolidated manifest (default 4096)",
    )
    rw.set_defaults(fn=cmd_rewrite_manifests)

    rb = sub.add_parser("rebucket", help="rewrite under a new bucket count")
    rb.add_argument("--table", required=True)
    rb.add_argument("--n-buckets", type=int, required=True)
    rb.set_defaults(fn=cmd_rebucket)

    mt = sub.add_parser(
        "maintain",
        help="one-shot table service: partial compact + expire + orphan GC "
        "by threshold (safe to cron against a live writer)",
    )
    mt.add_argument("--table", required=True)
    mt.add_argument(
        "--compact-threshold", type=int, default=8,
        help="partial-compact buckets holding more than this many files",
    )
    mt.add_argument(
        "--keep-last", type=int, default=None,
        help="expire snapshots beyond the last N (skip expiry if unset)",
    )
    mt.add_argument(
        "--expire-older-than-days", type=float, default=None,
        help="age-based snapshot expiry: only snapshots older than this "
        "many days are candidates (composes with --keep-last, which "
        "still retains that many most-recent regardless of age; "
        "defaults to keeping the last 2 when only age is given)",
    )
    mt.add_argument(
        "--orphan-grace-sec", type=float, default=None,
        help="remove crash orphans older than this (skip GC if unset)",
    )
    mt.add_argument(
        "--manifest-threshold", type=int, default=None,
        help="rewrite (consolidate) manifests when more than this many "
        "are live — metadata-only, no data rewrite (skip if unset)",
    )
    mt.add_argument(
        "--delta-threshold", type=int, default=None,
        help="minor-compact buckets holding more than this many DELTA "
        "files when full compaction did not fire (skip if unset)",
    )
    mt.add_argument(
        "--retention-days", type=float, default=None,
        help="tombstone rows whose --retention-ts-col is older than this "
        "many days (delete_where through the change feed; skip if unset)",
    )
    mt.add_argument(
        "--retention-ts-col", default="ts",
        help="timestamp column the retention cutoff applies to",
    )
    mt.set_defaults(fn=cmd_maintain)

    bp = sub.add_parser(
        "branch",
        help="named branches: create/list/delete/fast-forward (metadata-only)",
    )
    bp.add_argument("action", choices=["create", "list", "delete", "fast-forward"])
    bp.add_argument("--table", required=True)
    bp.add_argument("--name", help="branch name (all actions but list)")
    bp.add_argument("--at-seq", type=int, default=None, help="fork point (create)")
    bp.set_defaults(fn=cmd_branch)

    tg = sub.add_parser(
        "tag",
        help="snapshot tags: create/list/drop (metadata-only pins — "
             "read(tag=...) resolves them; expiry never drops a tagged "
             "snapshot)",
    )
    tg.add_argument("action", choices=["create", "list", "drop"])
    tg.add_argument("--table", required=True)
    tg.add_argument("--name", help="tag name (create/drop)")
    tg.add_argument("--at-seq", type=int, default=None,
                    help="snapshot to pin (create; default: current)")
    tg.set_defaults(fn=cmd_tag)

    rn = sub.add_parser(
        "rename-column", help="metadata-only column rename (field-id evolution)"
    )
    rn.add_argument("--table", required=True)
    rn.add_argument("--old", required=True)
    rn.add_argument("--new", required=True)
    rn.set_defaults(fn=cmd_rename_column)

    ac = sub.add_parser(
        "add-column",
        help="metadata-only explicit ADD COLUMN (fresh field id; existing "
             "rows read NULL)",
    )
    ac.add_argument("--table", required=True)
    ac.add_argument("--column", required=True)
    ac.add_argument("--type", required=True,
                    help="Spark SQL type string, e.g. string, bigint, "
                         "decimal(14,2), array<float>")
    ac.add_argument("--agg", default=None, choices=["sum", "min", "max"],
                    help="register the new column as an accumulator on an "
                         "additive (agg_cols) table")
    ac.set_defaults(fn=cmd_add_column)

    dc = sub.add_parser(
        "drop-column", help="metadata-only column drop (field-id evolution)"
    )
    dc.add_argument("--table", required=True)
    dc.add_argument("--column", required=True)
    dc.set_defaults(fn=cmd_drop_column)

    ck = sub.add_parser(
        "check", help="manage writer-enforced CHECK constraints"
    )
    ck.add_argument("--table", required=True)
    ck.add_argument("--add", nargs=2, metavar=("NAME", "EXPR"), default=None,
                    help="add a CHECK: boolean SQL expr every live row "
                         "must satisfy")
    ck.add_argument("--drop", default=None, help="drop a CHECK by name")
    ck.add_argument("--no-validate", action="store_true",
                    help="skip the existing-rows validation scan on --add")
    ck.add_argument("--report", action="store_true",
                    help="one-pass violation counts of every CHECK over "
                         "live rows (exit 1 on findings, never raises)")
    ck.add_argument("--rule", action="append", default=None,
                    help="<name>=<expr> ad-hoc rule added to --report")
    ck.set_defaults(fn=cmd_check)

    sy = sub.add_parser(
        "sync-snapshot",
        help="reconcile live state against a full upstream snapshot "
             "(binlog-less CDC): diff -> one commit of the changes",
    )
    sy.add_argument("--table", required=True)
    sy.add_argument("--snapshot", required=True,
                    help="parquet path holding the upstream's full state")
    sy.add_argument("--batch-key", default=None,
                    help="exactly-once ledger key for this sync")
    sy.add_argument("--at-seq", type=int, default=None,
                    help="LWW seq assigned to the sync's events "
                         "(default: 1 + max stored seq)")
    sy.add_argument("--mode", default="mor", choices=["mor", "cow"])
    sy.add_argument("--scope", action="append", default=None,
                    help="<keycol>=<value> (repeatable, ANDed): sharded "
                         "sync — diff and delete only within this key "
                         "scope; the snapshot must be scoped to match")
    sy.set_defaults(fn=cmd_sync_snapshot)

    ro = sub.add_parser("remove-orphans", help="delete crash debris")
    ro.add_argument("--table", required=True)
    ro.add_argument("--grace-sec", type=float, default=3600.0)
    ro.add_argument("--dry-run", action="store_true",
                    help="list what would be deleted; touch nothing")
    ro.set_defaults(fn=cmd_remove_orphans)

    ln = sub.add_parser("lineage", help="show the lineage ledger")
    ln.add_argument("--table", required=True)
    ln.add_argument("--limit", type=int, default=50)
    ln.set_defaults(fn=cmd_lineage)

    de = sub.add_parser(
        "describe", help="metadata-only table health report (JSON)"
    )
    de.add_argument("--table", required=True)
    de.set_defaults(fn=cmd_describe)

    cn = sub.add_parser(
        "count",
        help="exact live-row count, metadata-first (tier breakdown JSON)",
    )
    cn.add_argument("--table", required=True)
    cn.add_argument("--seq", type=int, default=None)
    cn.add_argument("--col", default=None,
                    help="count non-null values of this column instead")
    cn.set_defaults(fn=cmd_count)

    tl = sub.add_parser(
        "tail",
        help="stream the table's change feed (format('icelite') source) "
             "as JSON lines, exactly-once resumable via --checkpoint",
    )
    tl.add_argument("--table", required=True)
    tl.add_argument("--checkpoint", required=True)
    tl.add_argument("--since", type=int, default=0)
    tl.add_argument("--since-timestamp", default=None,
                    help="start AFTER the latest snapshot at-or-before "
                         "this instant (epoch seconds or ISO-UTC) "
                         "instead of --since")
    tl.add_argument("--once", action="store_true",
                    help="drain available commits and exit")
    tl.add_argument("--interval", default="5 seconds")
    tl.add_argument("--timeout-sec", type=int, default=None,
                    help="stop the continuous tail after N seconds")
    tl.add_argument("--max-commits-per-batch", type=int, default=None,
                    help="bound each micro-batch to at most N table "
                         "commits (backpressure for backlog catch-up)")
    tl.add_argument("--shard", default=None, metavar="i/k",
                    help="consume only files whose bucket %% k == i — run "
                         "k tails (each with its own checkpoint) to "
                         "partition the feed across parallel consumers")
    tl.set_defaults(fn=cmd_tail)

    ch = sub.add_parser("changes", help="show the incremental change feed")
    ch.add_argument("--preimage", action="store_true",
                    help="attach Debezium-style _before images to each change")
    ch.add_argument("--table", required=True)
    ch.add_argument("--since", type=int, default=0)
    ch.add_argument("--since-timestamp", default=None,
                    help="resolve the start from a wall-clock instant "
                         "(epoch seconds or ISO-UTC) instead of --since")
    ch.add_argument("--limit", type=int, default=50)
    ch.set_defaults(fn=cmd_changes)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
