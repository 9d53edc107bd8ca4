"""ChangeFeedJoin — deployable incremental JOIN materialization: tail
the commit logs of TWO Icelite tables and maintain a target that equals
their inner equi-join on a shared key, exactly-once.

This closes the last gap in the pipeline family: ChangeFeedRollup
materializes aggregates, ChangeFeedScd2 history, ChangeFeedEnrich a
one-sided dimension lookup (only FACT changes re-derive; a dim change
never back-fills), ChangeFeedTransform a one-table flat-map — this one
maintains a BIDIRECTIONAL join view, where a change on EITHER side
re-derives every joined row it touches. Flink's two-input streaming
join operator analog, but with bounded state: Spark's own stream-stream
join buffers both streams in watermarked state forever-growing with the
join window, while this recomputes from the LAKE tables themselves —
the tables ARE the join state, already LWW-resolved, bucketed, and
key-prunable. (Reference analog: the manager runs one pipeline per
source, /root/reference/src/etl/manager.rs:76-102; joining their
outputs is left to the reader there.)

Semantics: at quiescence ``target ≡ A.live ⋈ B.live`` on the join
columns (``how="left"`` keeps unmatched A rows with NULL B payload —
one NULL-subkey row per A key, replaced in place when a B match lands
and restored when the match is deleted; the same group-replacement rule
covers both directions). Each micro-batch:

1. the batch (a UNION of both tables' change feeds, projected to the
   join columns — tombstones carry them because the join columns must
   be key columns on both sides) yields the AFFECTED join keys;
2. the epoch pins ``(A.current_seq, B.current_seq)`` in the checkpoint
   (atomic tmp+rename, first attempt wins — the ChangeFeedEnrich pin
   trick doubled), and every replay recomputes against the SAME pinned
   snapshots, so crash/replay is bit-deterministic;
3. both sides are read AT THEIR PINS, key-pruned to the affected keys
   (per-column IN predicates prune files by bucket + stats — the
   bucket keys of A, B, and the target must all be join columns, so an
   epoch costs O(affected keys), not O(table));
4. the affected keys' join groups are REPLACED: freshly joined rows
   upsert, existing live target rows of those keys that the new join no
   longer produces become tombstones — covers updates, shrinks, and
   deletes on either side in one rule;
5. everything merges under a run-id-namespaced batch key (exactly-once;
   a crash replay is a ledger no-op).

Why recompute-from-snapshot instead of delta×state join algebra: the
round-5 property sweep showed how per-row LWW alone mishandles late
data in derived tables (ChangeFeedTransform needed two extra guards).
Here a batch contributes only KEYS — the derivation always reads the
authoritative LWW-resolved table state, so a stale delivered version
can never insert phantom rows; it only triggers a recompute that sees
the newer state. The carried target seq is ``pin_a + pin_b``: both
components are non-decreasing per consumer, so the sum is monotone
across epochs, and two epochs with EQUAL pins recompute identical
content (state at the pins determines the output) — an equal-seq merge
is content-idempotent.

Retention: both sources must retain an epoch's pinned snapshots for the
life of its replay window (``expire_snapshots`` keep_last); an expired
pin fails loud on replay rather than silently joining newer state. A
rollback on either source in a consumed range fails the feed fast (the
icelite source contract). A RELOCATED checkpoint re-derives everything
under fresh pins ≥ all stored seqs — content-safe, like the transform
(unlike the additive rollup).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.streaming.driver import PipelineError, _checkpoint_run_id

SEQ_COL = "__pair_seq"


def _b_name(c: str, suffix: str) -> str:
    return f"{c}{suffix}"


def _side_cols(ptr: dict, schema: T.StructType, join_cols: list[str]):
    """A side's non-join output columns (its keys included), minus the
    flags the target does not mirror."""
    return [
        f.name
        for f in schema.fields
        if f.name not in join_cols and f.name != "__deleted"
    ]


@dataclass
class ChangeFeedJoin:
    spark: SparkSession
    a_path: str
    b_path: str
    table_path: str
    checkpoint_dir: str
    join_cols: tuple[str, ...] | list[str] = ()
    suffix: str = "_b"
    name: str = "feed_join"
    how: str = "inner"
    shard: str | None = None
    max_commits_per_batch: int | None = None
    key_prune_threshold: int = 10_000

    @classmethod
    def create_target(
        cls,
        spark: SparkSession,
        path: str,
        a_path: str,
        b_path: str,
        join_cols: list[str],
        suffix: str = "_b",
        n_buckets: int = 32,
    ) -> IceliteTable:
        """Derive the join target: join columns + A's remaining columns
        under their own names + B's remaining columns suffixed, keyed by
        the UNION of both sides' keys (that tuple uniquely identifies a
        joined row), LWW-guarded by ``__pair_seq`` (the epoch's pin
        sum), bucketed on A's bucket key (a join column) so group
        lookups stay key-pruned."""
        a = IceliteTable.load(spark, a_path)
        b = IceliteTable.load(spark, b_path)
        aptr, bptr = a.pointer(), b.pointer()
        fields = [f for f in a.schema.fields if f.name != "__deleted"]
        a_names = {f.name for f in fields}
        for f in b.schema.fields:
            if f.name in join_cols or f.name == "__deleted":
                continue
            out = _b_name(f.name, suffix)
            if out in a_names:
                raise ValueError(
                    f"suffixed B column {out!r} collides with an A column "
                    "— pick a different suffix"
                )
            fields.append(T.StructField(out, f.dataType, True))
        fields.append(T.StructField(SEQ_COL, T.LongType(), True))
        keys = list(aptr["key_cols"]) + [
            _b_name(k, suffix)
            for k in bptr["key_cols"]
            if k not in join_cols
        ]
        return IceliteTable.create(
            spark,
            path,
            T.StructType(fields),
            key_cols=keys,
            bucket_key=aptr["bucket_key"],
            n_buckets=n_buckets,
            order_cols=keys,
            seq_col=SEQ_COL,
        )

    def _validate(self, a, b, target) -> None:
        aptr, bptr, tptr = a.pointer(), b.pointer(), target.pointer()
        jc = list(self.join_cols)
        if not jc:
            raise ValueError("ChangeFeedJoin requires join_cols")
        if self.how not in ("inner", "left"):
            raise ValueError(
                f"how must be 'inner' or 'left', got {self.how!r} — "
                "'left' keeps unmatched A rows with NULL B payload (a "
                "NULL-subkey row per A key, replaced when a match lands)"
            )
        a_types = {f.name: f.dataType for f in a.schema.fields}
        b_types = {f.name: f.dataType for f in b.schema.fields}
        for c in jc:
            if c not in a_types or c not in b_types:
                raise ValueError(
                    f"join column {c!r} must exist in both sources"
                )
            if a_types[c] != b_types[c]:
                raise ValueError(
                    f"join column {c!r} type differs between sources "
                    f"({a_types[c]} vs {b_types[c]})"
                )
        for side, ptr in (("A", aptr), ("B", bptr)):
            missing = [c for c in jc if c not in ptr["key_cols"]]
            if missing:
                raise ValueError(
                    f"join column(s) {missing} must be KEY columns of "
                    f"{side} — delete tombstones only carry key columns, "
                    "so a non-key join column would make deletes invisible "
                    "to the view"
                )
            if not ptr.get("seq_col"):
                raise ValueError(f"source {side} must declare a seq_col")
            if ptr["bucket_key"] not in jc:
                raise ValueError(
                    f"{side}'s bucket_key must be a join column — per-epoch "
                    "recompute reads are key-pruned through it"
                )
        if tptr["bucket_key"] not in jc:
            raise ValueError(
                "target bucket_key must be a join column — group "
                "replacement lookups are key-pruned through it"
            )
        if tptr.get("agg_cols"):
            raise ValueError(
                "additive targets accumulate, they cannot be replaced — "
                "use ChangeFeedRollup for aggregate materialization"
            )
        if not tptr.get("seq_col"):
            raise ValueError("target must declare a seq_col (__pair_seq)")
        if self.shard is not None:
            # a sharded consumer must OWN each key on both legs: the
            # source shard filter is bucket % k on each table's own
            # bucketing, so the legs agree iff they bucket on the same
            # join column with the same bucket count (same hash, same
            # bucket id, same shard). Disjoint key ownership also makes
            # concurrent shard writers commute on the target (append
            # rebase, never the same key from two shards).
            if (
                aptr["bucket_key"] != bptr["bucket_key"]
                or aptr["n_buckets"] != bptr["n_buckets"]
            ):
                raise ValueError(
                    "sharded feed-join requires BOTH sources bucketed on "
                    "the same join column with the same n_buckets "
                    f"(A: {aptr['bucket_key']}/{aptr['n_buckets']}, "
                    f"B: {bptr['bucket_key']}/{bptr['n_buckets']}) — "
                    "otherwise a key's changes land in different shards "
                    "per leg and no consumer owns it"
                )
        expected = list(aptr["key_cols"]) + [
            _b_name(k, self.suffix)
            for k in bptr["key_cols"]
            if k not in jc
        ]
        if sorted(tptr["key_cols"]) != sorted(expected):
            raise ValueError(
                f"target key_cols must be the union of both sides' keys "
                f"({expected}) — that tuple uniquely identifies a joined "
                f"row; got {list(tptr['key_cols'])}"
            )

    def _pins(self, epoch_id: int, a, b) -> dict:
        """The (A, B) snapshot pair this epoch joins: first attempt
        records both current seqs, replays read them back."""
        path = os.path.join(
            self.checkpoint_dir, f"join-pin-{epoch_id}.json"
        )
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        pins = {"a_seq": a.current_seq(), "b_seq": b.current_seq()}
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(pins, f)
        os.replace(tmp, path)
        return pins

    def start(self):
        from etl_rust_spark.sources import register_icelite_source
        from etl_rust_spark.streaming.driver import (
            _feed_offsets_reader,
            _feed_shard_tuple,
        )

        register_icelite_source(self.spark)
        a = IceliteTable.load(self.spark, self.a_path)
        b = IceliteTable.load(self.spark, self.b_path)
        target = IceliteTable.load(self.spark, self.table_path)
        self._validate(a, b, target)
        jc = list(self.join_cols)
        tptr = target.pointer()
        tkeys = list(tptr["key_cols"])
        tseq = tptr["seq_col"]
        tfields = {
            f.name: f.dataType
            for f in target.schema.fields
            if f.name != "__deleted"
        }
        payload = [c for c in tfields if c not in (*tkeys, tseq)]
        a_out = _side_cols(a.pointer(), a.schema, jc)
        b_out = _side_cols(b.pointer(), b.schema, jc)
        run_id = _checkpoint_run_id(self.checkpoint_dir)
        os.makedirs(self.checkpoint_dir, exist_ok=True)

        shard_t = _feed_shard_tuple(self.shard)

        def _apply(off_df: DataFrame, epoch_id: int) -> None:
            # JVM fast path: the unioned stream carries only (commit seq,
            # leg) rows; each leg's affected KEYS come from a JVM
            # read_changes over its own range (VERDICT r05 #4). A leg
            # with no commits in the batch contributes no keys.
            spans = {
                int(r["__leg"]): (int(r["lo"]), int(r["hi"]))
                for r in off_df.groupBy("__leg").agg(
                    F.min("_commit_seq").alias("lo"),
                    F.max("_commit_seq").alias("hi"),
                ).collect()
                if r["lo"] is not None
            }
            if not spans:
                return
            legs = []
            for tag, tbl in ((0, a), (1, b)):
                if tag in spans:
                    lo, hi = spans[tag]
                    legs.append(
                        tbl.read_changes(lo - 1, hi, shard=shard_t)
                        .select(*jc)
                    )
            keys_df = legs[0]
            for leg in legs[1:]:
                keys_df = keys_df.unionByName(leg)
            keys_df = keys_df.distinct().localCheckpoint()
            n = keys_df.count()
            if n == 0:
                return
            pins = self._pins(epoch_id, a, b)
            seq_val = int(pins["a_seq"]) + int(pins["b_seq"])
            where = None
            if n <= self.key_prune_threshold:
                vals = keys_df.collect()
                # per-column IN is a SUPERSET of the composite key set —
                # it prunes files; the semi-joins below filter exactly
                where = [
                    (k, "in", sorted({r[k] for r in vals})) for k in jc
                ]

            def _live(df: DataFrame) -> DataFrame:
                if "__deleted" in df.columns:
                    df = df.filter(
                        ~F.coalesce(F.col("__deleted"), F.lit(False))
                    )
                return df

            a_live = _live(a.read(seq=int(pins["a_seq"]), where=where))
            b_live = _live(b.read(seq=int(pins["b_seq"]), where=where))
            a_sel = a_live.select(*jc, *a_out)
            b_sel = b_live.select(
                *jc,
                *[
                    F.col(c).alias(_b_name(c, self.suffix))
                    for c in b_out
                ],
            )
            derived = (
                a_sel.join(b_sel, on=jc, how=self.how)
                .join(keys_df, on=jc, how="left_semi")
                .withColumn(tseq, F.lit(seq_val).cast("long"))
                .select(*tkeys, tseq, *payload)
            )
            if target.current_seq() == 0:
                # BOOTSTRAP fast path (initial load / rebuild): with no
                # target commits there are no stored join groups to
                # replace — the stored read and the gone anti-join are
                # provably empty. (Concurrent sharded bootstraps stay
                # correct: shards own disjoint join keys, so their group
                # replacements never interact.)
                out = derived.withColumn("__deleted", F.lit(False))
            else:
                stored = (
                    target.read(where=where)
                    .join(keys_df, on=jc, how="left_semi")
                )
                gone = (
                    _live(stored)
                    .select(*tkeys)
                    .join(derived.select(*tkeys), on=tkeys, how="left_anti")
                    .select(
                        *tkeys,
                        F.lit(seq_val).cast("long").alias(tseq),
                        *[
                            F.lit(None).cast(tfields[c]).alias(c)
                            for c in payload
                        ],
                        F.lit(True).alias("__deleted"),
                    )
                )
                out = (
                    derived.withColumn("__deleted", F.lit(False))
                    .unionByName(gone)
                )
            target.merge(
                out.withColumn("op", F.lit("U")),
                batch_key=f"{self.name}:{run_id}:{epoch_id}",
                seq_col=tseq,
                mode="mor",
                source=f"join:{self.name}",
            )

        def _leg(path: str, tag: int) -> DataFrame:
            return _feed_offsets_reader(
                self.spark, path, self.max_commits_per_batch
            ).select("_commit_seq", F.lit(tag).alias("__leg"))

        return (
            _leg(self.a_path, 0)
            .unionByName(_leg(self.b_path, 1))
            .writeStream.queryName(self.name)
            .foreachBatch(_apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime="0 seconds")
            .start()
        )

    def run_available(self, max_drains: int = 64) -> None:
        """Drain to quiescence (checkpoint-offset quiescence test — see
        ChangeFeedScd2.run_available; both legs' committed offsets must
        cover their sources' heads)."""
        from etl_rust_spark.streaming.driver import _feed_run_available

        a = IceliteTable.load(self.spark, self.a_path)
        b = IceliteTable.load(self.spark, self.b_path)
        try:
            _feed_run_available(
                f"join {self.name}", self.checkpoint_dir, self.start,
                lambda: [a.current_seq(), b.current_seq()], max_drains,
            )
        except PipelineError:
            raise
        except Exception as e:
            raise PipelineError(self.name, e) from e
