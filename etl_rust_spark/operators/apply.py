"""M1 — the reusable micro-batch apply kernel.

One code path for both drivers, mirroring how the reference's ``ETL::run``
reuses ``Bucket`` internally (/root/reference/src/etl/processor.rs:99):
the Structured Streaming path calls ``apply_changes`` from
``foreachBatch`` and the batch-replay path calls it directly.

Correctness note inherited from the reference: its intra-batch transform
fan-out completes *unordered* (``buffer_unordered``,
/root/reference/src/etl/processor.rs:125-128), so final-state correctness
can never depend on arrival order — it must come from keys. Here that
principle is explicit: last-writer-wins by max ``lsn`` per
``(conv_id, turn_idx)``, regardless of both intra-batch and inter-batch
delivery order (a late event with a smaller lsn than the sink's current
row for that key must lose — see the cross-batch guard below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rust_spark.lake.format import IceliteTable

LSN_COL = "__lsn"  # persisted per-key max lsn, the cross-batch late-data guard
DELETED_COL = "__deleted"  # tombstone flag: deletes persist so late (smaller-lsn)
#   events in later batches cannot resurrect a deleted key; read() filters them


def dedup_max_lsn(
    changes: DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    lsn_col: str = "lsn",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Collapse a change-set to one winning row per key (max lsn).

    Implemented as ``groupBy(keys).agg(max(struct(lsn, payload...)))``
    rather than a row_number window: hash aggregation gets map-side
    partial aggregation from Catalyst (duplicate/hot keys collapse
    *before* the shuffle), which a window function never does. At
    10^10 events with Zipf-hot conversations that partial agg is the
    difference between a bounded shuffle and a hot-partition stall —
    and since ``turn_idx`` is in the grouping key, even a conversation
    holding 50% of events spreads over its turn space.

    ``salt_buckets`` adds an *explicit* two-phase variant for the
    degenerate case of a single hot (conv_id, turn_idx) key (e.g. one
    turn updated millions of times): phase 1 reduces within
    (key, salt) groups, phase 2 reduces the ≤salt_buckets survivors.
    """
    payload = [c for c in changes.columns if c not in key_cols and c != lsn_col]
    row = F.struct(F.col(lsn_col), *[F.col(c) for c in payload]).alias("__row")
    if salt_buckets:
        salted = changes.groupBy(
            *key_cols, F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(salt_buckets)).alias("__salt")
        ).agg(F.max(row).alias("__row"))
        winners = salted.groupBy(*key_cols).agg(F.max("__row").alias("__row"))
    else:
        try:
            n_in = changes.rdd.getNumPartitions()
            n_shuffle = int(
                changes.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except Exception:
            n_in = n_shuffle = 0
        if n_in and n_in < n_shuffle // 2:
            # UNDER-PARALLELIZED input (a micro-batch of one or two WAL
            # segments has only as many scan partitions as the files
            # have row groups): hash-repartition by the dedup keys
            # FIRST. It is the exact exchange the aggregation needs,
            # moved before it (guide §2.4 — Catalyst recognizes the
            # partitioning and plans no second exchange), so the heavy
            # max-struct aggregation runs at full parallelism instead
            # of on the scan's few partitions. Measured on a 2-segment
            # 2M-event WAL batch at local[32]: 5.5 s → 3.1 s. The
            # normal path (scan partitions ≥ cores/2, e.g. the bulk
            # ingest benches) is untouched — there the map-side partial
            # aggregation before the exchange is the right plan.
            changes = changes.repartition(n_shuffle, *key_cols)
        winners = changes.groupBy(*key_cols).agg(F.max(row).alias("__row"))
    return winners.select(
        *key_cols,
        F.col(f"__row.{lsn_col}").alias(lsn_col),
        *[F.col(f"__row.{c}").alias(c) for c in payload],
    )


def apply_changes(
    table: IceliteTable,
    batch_df: DataFrame,
    batch_key: str | None = None,
    lsn_col: str = "lsn",
    op_col: str = "op",
    salt_buckets: int | None = None,
    source: str = "batch",
    mode: str = "cow",
    stage_as: str | None = None,
) -> dict | None:
    """Apply one micro-batch of change events to an Icelite table.

    decode → dedup (max-lsn per key) → seq-agg MERGE. Returns the
    commit's lineage record, or None if ``batch_key`` was already applied
    (idempotent re-delivery).

    Cross-batch out-of-order delivery is handled by the persisted
    ``__lsn`` column: the merge unions the touched slice of the table
    with the batch winners and keeps max(lsn) per key in ONE hash
    aggregation — a late event with a smaller lsn than the stored row
    (including a delete tombstone) loses, with no extra guard join.
    """
    ptr = table.pointer()
    if batch_key is not None and table.is_applied(batch_key, ptr):
        return None
    key_cols = tuple(ptr["key_cols"])

    winners = dedup_max_lsn(batch_df, key_cols, lsn_col, salt_buckets)

    # deletes become tombstone upserts (flagged rows), so the lsn ordering
    # also protects deleted keys against late out-of-order events
    changes = (
        winners.withColumnRenamed(lsn_col, LSN_COL)
        .withColumn(DELETED_COL, F.col(op_col) == "D")
        .withColumn(op_col, F.lit("U"))
    )
    return table.merge(
        changes,
        batch_key=batch_key,
        op_col=op_col,
        source=source,
        seq_col=LSN_COL,
        mode=mode,
        stage_as=stage_as,
    )


def sync_snapshot(
    table: IceliteTable,
    snap_df: DataFrame,
    batch_key: str | None = None,
    at_seq: int | None = None,
    mode: str = "mor",
    source: str = "snapshot_sync",
    where: list | None = None,
) -> dict | None:
    """Make the table's LIVE state equal ``snap_df`` by diffing and
    committing ONE synthesized CDC batch — the ingest path for upstream
    systems that cannot emit a binlog (Debezium snapshot mode / Delta
    MERGE ``WHEN NOT MATCHED BY SOURCE DELETE``, public semantics; the
    reference's Mongo cursor scan is exactly such a full-state source,
    /root/reference/src/etl/processor.rs:99).

    Diff semantics (keys = the table's key columns, which ``snap_df``
    must carry):
    - key only in the snapshot (or currently tombstoned)  → INSERT
    - key in both, any payload column differs (null-safe) → UPDATE
    - live key absent from the snapshot                   → DELETE

    Unchanged rows emit NOTHING, so everything downstream of the diff —
    shuffle, delta files, manifests, the change feed — is O(changed),
    not O(table); consumers tailing the feed see exactly the diff. The
    diff itself is one full-outer join, O(table + snapshot), inherent
    to snapshot reconciliation (both sides shuffle on the same key
    columns; at 100 TB, shard the snapshot by key range and sync shards
    independently via ``where=`` — the SHARDED sync path: the table side
    of the diff is then a file-pruned ``read(where=...)`` of just that
    key range, deletes are computed only within it, and rows outside
    the scope are untouched by contract. The snapshot must contain
    exactly the upstream's full state FOR THAT SCOPE — out-of-scope
    snapshot rows fail fast (another shard's sync would otherwise
    delete them right back). Scope on key/bucket columns to get file
    pruning; shard batch keys must differ. Sharded runs should pass an
    EXPLICIT shared ``at_seq`` (the snapshot's upstream watermark): the
    default derives from the SCOPED read's max seq, which is consistent
    within a shard but differs across shards — harmless for per-key LWW
    (keys never cross shards) but an empty scope would default to seq 1,
    letting a late pre-snapshot CDC delivery with a modest lsn wrongly
    beat the sync's rows.

    The snapshot must carry EVERY live payload column (missing ones
    fail fast — a 'U' row would silently null them); extra columns
    evolve the schema through merge, counting as changes only where
    non-null. All sync events share one seq = ``at_seq`` (default
    1 + max stored seq, tombstones included, so re-inserts of deleted
    keys win) — a CDC event with a newer seq still beats the sync,
    an older one still loses (LWW interplay preserved). Exactly-once
    via ``batch_key``; a no-diff sync commits nothing. Returns
    {inserted, updated, deleted, seq, lineage} or None (already
    applied / empty diff)."""
    ptr = table.pointer()
    if batch_key is not None and table.is_applied(batch_key, ptr):
        return None
    if ptr.get("agg_cols"):
        raise ValueError(
            "sync_snapshot targets last-writer-wins tables; additive "
            "(agg_cols) rows are partials with no per-key 'current "
            "state' to diff against"
        )
    seq_col = ptr.get("seq_col")
    if not seq_col:
        raise ValueError("sync_snapshot requires a table seq_col (the "
                         "sync commits as a MoR CDC batch)")
    key_cols = list(ptr["key_cols"])
    missing_keys = [k for k in key_cols if k not in snap_df.columns]
    if missing_keys:
        raise ValueError(f"snapshot is missing key columns {missing_keys}")

    cur = table.read(where=where) if where else table.read()
    if where:
        from etl_rust_spark.lake.format import _where_filter, _where_groups

        bad_cols = {c for g in _where_groups(where) for c, _, _ in g
                    if c not in key_cols}
        if bad_cols:
            raise ValueError(
                f"sync_snapshot where= must use key columns only (got "
                f"{sorted(bad_cols)}): a payload-column scope excludes "
                "tombstones and rows whose current value changed, so the "
                "diff would mis-classify them and sync events could "
                "silently lose the per-key LWW"
            )
        scope = _where_filter(where)
        n_out = snap_df.filter(~F.coalesce(scope, F.lit(False))).count()
        if n_out:
            raise ValueError(
                f"snapshot carries {n_out} row(s) OUTSIDE the where scope "
                f"{where!r} — they would insert here and be deleted by the "
                "shard that owns them; scope the snapshot to match"
            )
    has_del = DELETED_COL in cur.columns
    live_payload = [c for c in cur.columns
                    if c not in key_cols and c not in (seq_col, DELETED_COL)]
    absent = [c for c in live_payload if c not in snap_df.columns]
    if absent:
        raise ValueError(
            f"snapshot is missing live payload columns {absent} — a sync "
            "would silently null them on every updated row; select them "
            "from table.read() into the snapshot if the omission is "
            "intentional"
        )
    new_cols = [c for c in snap_df.columns
                if c not in key_cols and c not in live_payload
                and c not in (seq_col, DELETED_COL)]

    if at_seq is None:
        row = cur.agg(F.max(seq_col).alias("m")).collect()[0]
        at_seq = int(row["m"] or 0) + 1

    l = cur.select(
        *key_cols, *live_payload,
        (F.coalesce(F.col(DELETED_COL), F.lit(False)) if has_del
         else F.lit(False)).alias("__l_dead"),
        F.lit(True).alias("__l_present"),
    )
    l = l.select(*key_cols,
                 *[F.col(c).alias(f"__l_{c}") for c in live_payload],
                 "__l_dead", "__l_present")
    s = snap_df.withColumn("__s_present", F.lit(True))
    j = s.join(l, on=key_cols, how="full_outer")

    s_here = F.coalesce(F.col("__s_present"), F.lit(False))
    l_live = (F.coalesce(F.col("__l_present"), F.lit(False))
              & ~F.col("__l_dead"))
    differs = F.lit(False)
    for c in live_payload:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__l_{c}"))
    for c in new_cols:  # a brand-new column changes a row only if non-null
        differs = differs | F.col(c).isNotNull()

    op = (
        F.when(s_here & ~l_live, F.lit("I"))
        .when(s_here & l_live & differs, F.lit("U"))
        .when(~s_here & l_live, F.lit("D"))
    )
    changes = (
        j.withColumn("__op", op)
        .filter(F.col("__op").isNotNull())
        .select(*key_cols, *live_payload, *new_cols, "__op")
        .withColumn(seq_col, F.lit(at_seq).cast("long"))
        .persist()
    )
    # MoR contract (same conversion apply_changes performs): deletes ride
    # as flagged tombstone upserts so the LWW seq also guards deleted keys
    merged = (
        changes.withColumn(DELETED_COL, F.col("__op") == "D")
        .withColumn("__op", F.lit("U"))
    )
    try:
        by_op = {r["__op"]: r["count"]
                 for r in changes.groupBy("__op").count().collect()}
        counts = {"inserted": by_op.get("I", 0),
                  "updated": by_op.get("U", 0),
                  "deleted": by_op.get("D", 0), "seq": None}
        if not by_op:
            return None  # state already equal: no commit, nothing in the feed
        rec = table.merge(
            merged, batch_key=batch_key, op_col="__op", source=source,
            seq_col=seq_col, mode=mode,
        )
        counts["seq"] = table.current_seq()
        counts["lineage"] = rec
        return counts
    finally:
        changes.unpersist()


def create_transcript_table(
    spark,
    path: str,
    n_buckets: int = 32,
    extra_fields=None,
) -> IceliteTable:
    """Create the transcripts sink table (schema per BASELINE input_hint,
    plus the persisted __lsn guard column)."""
    from pyspark.sql import types as T

    from etl_rust_spark.changelog import TRANSCRIPT_SCHEMA

    fields = list(TRANSCRIPT_SCHEMA.fields) + [
        T.StructField(LSN_COL, T.LongType(), True),
        T.StructField(DELETED_COL, T.BooleanType(), True),
    ]
    for f in extra_fields or []:
        fields.append(f)
    return IceliteTable.create(
        spark,
        path,
        T.StructType(fields),
        key_cols=("conv_id", "turn_idx"),
        bucket_key="conv_id",
        n_buckets=n_buckets,
        order_cols=("conv_id", "turn_idx"),
        seq_col=LSN_COL,
    )


def renumber_turns(
    df: DataFrame,
    key: str = "conv_id",
    turn_col: str = "turn_idx",
    engine: str = "window",
) -> DataFrame:
    """Dense per-conversation turn renumbering (0..n-1 in turn order) —
    the 'turn indices after deletes' fixup a training export needs.

    Engines, by measured cost on this box (100k rows, ~1.5k groups,
    window twin = 1.0 s):

    - ``"window"`` (default): row_number over a keyed window — pure JVM,
      one shuffle, the scale path when the logic is window-expressible.
    - ``"grouped_map_arrow"``: applyInArrow — 0.83 s, within ~20% of the
      JVM window. THE slot for per-group logic a window can't express:
      Arrow tables go straight to Python with no pandas conversion.
    - ``"grouped_map"``: applyInPandas — 4.7-7 s (~2 ms per group burned
      in per-group pandas DataFrame construction; 100k groups took
      213 s). Kept for pandas-native group bodies; prefer Arrow.

    All engines are asserted equal in tests."""
    if engine == "window":
        from pyspark.sql import Window

        dtype = df.schema[turn_col].dataType
        w = Window.partitionBy(key).orderBy(turn_col)
        return df.withColumn(
            turn_col, (F.row_number().over(w) - 1).cast(dtype)
        )
    schema = df.schema
    if engine == "grouped_map_arrow":
        import pyarrow as pa
        import pyarrow.compute as pc

        turn_type = {"integer": pa.int32(), "long": pa.int64()}.get(
            schema[turn_col].dataType.typeName(), pa.int32()
        )

        def op_arrow(t: pa.Table) -> pa.Table:
            t = t.take(pc.sort_indices(t, sort_keys=[(turn_col, "ascending")]))
            return t.set_column(
                t.schema.get_field_index(turn_col),
                turn_col,
                pa.array(range(t.num_rows), type=turn_type),
            )

        return df.groupBy(key).applyInArrow(op_arrow, schema=schema)
    import pandas as pd

    def op(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(turn_col, kind="stable").reset_index(drop=True)
        pdf[turn_col] = pd.Series(range(len(pdf))).astype(
            pdf[turn_col].dtype if pdf[turn_col].dtype.kind == "i" else "int32"
        )
        return pdf

    return df.groupBy(key).applyInPandas(op, schema=schema)


def read_transcripts(
    table: IceliteTable, seq: int | None = None, renumber: bool = False
) -> DataFrame:
    """Final-state view: user-facing columns in stable key order.
    ``renumber=True`` additionally re-indexes each conversation's
    surviving turns densely (deletes leave gaps in turn_idx)."""
    df = table.read(seq=seq)
    df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False))).drop(
        LSN_COL, DELETED_COL
    )
    if renumber:
        df = renumber_turns(df)
    return df.orderBy("conv_id", "turn_idx")
