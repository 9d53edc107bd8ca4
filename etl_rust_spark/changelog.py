"""M0 — deterministic transcript-changelog generator + independent oracle.

The reference benches generate synthetic nested records in-process and feed
them through the pipeline (/root/reference/benches/etl_streaming_benchmark.rs:164-273);
crucially their generators are NOT seed-stable (``rand::thread_rng()`` at
:165). Ours are byte-stable from ``(seed, scale)`` — every test and bench
derives from this module.

Two generators, one semantics:

- ``generate_changelog_pandas`` — pure numpy/pandas, for unit-test scales
  (10^3..10^6 events). Supports every fixture knob from FIXTURES.md §F2:
  Zipf conv skew, update/delete fractions, duplicate delivery (same lsn
  emitted twice), out-of-order delivery, and mid-stream schema evolution
  (a ``meta`` column appearing after ``evolve_after`` events).
- ``generate_changelog_spark`` — fully distributed, ``spark.range`` +
  column expressions only (no Python in the loop), for bench scales
  (10^7+). Deterministic per event id.

The oracle (``replay_oracle_pandas``) replays a changelog to final table
state independently of Spark: last-writer-wins by max ``lsn`` per
``(conv_id, turn_idx)``, keys whose winning op is ``D`` are absent, output
sorted by ``(conv_id, turn_idx)`` — the north-rule invariant (per-turn text
equality under stable turn ordering). It mirrors the reference's
sort-then-compare test pattern (/root/reference/src/bucket/bucket.rs:425-430).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["", "search", "bash", "python", "browser"]
_EPOCH_US = 1735689600_000_000  # 2025-01-01T00:00:00Z in microseconds

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
    ]
    + TRANSCRIPT_SCHEMA.fields
)

# CHANGELOG_SCHEMA + the schema-evolution column that appears mid-stream.
CHANGELOG_SCHEMA_EVOLVED = T.StructType(
    CHANGELOG_SCHEMA.fields + [T.StructField("meta", T.StringType(), True)]
)


@dataclass
class ChangelogConfig:
    """Fixture knobs (FIXTURES.md §F2). All randomness seeded."""

    n_conversations: int = 10
    turns_per_conv: int = 20
    n_events: int = 1000
    zipf_s: float = 1.2          # conv popularity skew; higher = hotter head
    hot_share: float | None = None  # if set, top conversation gets this share
    update_fraction: float = 0.35
    delete_fraction: float = 0.05
    dup_fraction: float = 0.02   # same-lsn rows emitted twice
    shuffle_order: bool = True   # emit out of lsn order (late data)
    evolve_after: int | None = None  # event count after which `meta` appears
    seed: int = 42

    def key_space(self) -> int:
        return self.n_conversations * self.turns_per_conv


def _conv_probs(cfg: ChangelogConfig) -> np.ndarray:
    ranks = np.arange(1, cfg.n_conversations + 1, dtype=np.float64)
    p = ranks ** (-cfg.zipf_s)
    p /= p.sum()
    if cfg.hot_share is not None:
        # force the head conversation to an exact share (skew fixture)
        rest = p[1:] / p[1:].sum() * (1.0 - cfg.hot_share)
        p = np.concatenate([[cfg.hot_share], rest])
    return p


def generate_changelog_pandas(cfg: ChangelogConfig) -> pd.DataFrame:
    """Deterministic changelog as a pandas frame, in *emission order*.

    Emission order is the simulated WAL-tail arrival order; ``lsn`` is the
    commit order. With ``shuffle_order`` the two differ (late-data fixture);
    with ``dup_fraction`` some lsn values appear twice (at-least-once
    delivery fixture).
    """
    rng = np.random.default_rng(cfg.seed)
    n = cfg.n_events
    conv = rng.choice(cfg.n_conversations, size=n, p=_conv_probs(cfg))
    turn = rng.integers(0, cfg.turns_per_conv, size=n)
    u = rng.random(n)
    op = np.where(
        u < cfg.delete_fraction,
        "D",
        np.where(u < cfg.delete_fraction + cfg.update_fraction, "U", "I"),
    )
    lsn = np.arange(n, dtype=np.int64)
    role = np.array(ROLES)[lsn % len(ROLES)]
    tool = np.array(TOOLS)[(lsn * 7 + conv) % len(TOOLS)]
    conv_id = np.char.add("conv-", np.char.zfill(conv.astype("U10"), 6))
    text = np.array(
        [
            f"turn {t} of {c} @lsn={l}" if o != "D" else None
            for c, t, l, o in zip(conv_id, turn, lsn, op)
        ],
        dtype=object,
    )
    ts = pd.to_datetime(_EPOCH_US + lsn * 1_000_000, unit="us")
    df = pd.DataFrame(
        {
            "lsn": lsn,
            "op": op,
            "conv_id": conv_id,
            "turn_idx": turn.astype(np.int32),
            "role": np.where(op == "D", None, role),
            "text": text,
            "tool": np.where(op == "D", None, tool),
            "ts": ts,
        }
    )
    df.loc[df.op == "D", "ts"] = pd.NaT
    if cfg.evolve_after is not None:
        meta = np.where(
            lsn >= cfg.evolve_after, "meta-" + pd.Series(lsn % 97).astype(str), None
        )
        df["meta"] = np.where(df.op.to_numpy() == "D", None, meta)
    if cfg.dup_fraction > 0:
        k = int(n * cfg.dup_fraction)
        dup_idx = rng.choice(n, size=k, replace=False)
        df = pd.concat([df, df.iloc[dup_idx]], ignore_index=True)
    if cfg.shuffle_order:
        df = df.sample(frac=1.0, random_state=cfg.seed).reset_index(drop=True)
    return df


def replay_oracle_pandas(changelog: pd.DataFrame) -> pd.DataFrame:
    """Independent replay: max-lsn wins per key, deletes drop the key,
    stable (conv_id, turn_idx) ordering. No Spark involved."""
    df = changelog.sort_values("lsn", kind="stable")
    # whole-row last per key (groupby().last() would skip NaNs per-column,
    # wrongly resurrecting overwritten values)
    last = df.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    live = last[last.op != "D"].drop(columns=["op", "lsn"])
    return live.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def generate_changelog_spark(
    spark: SparkSession,
    n_events: int,
    n_conversations: int = 100_000,
    turns_per_conv: int = 64,
    delete_fraction: float = 0.05,
    update_fraction: float = 0.35,
    skew_alpha: float = 1.1,
    parallelism: int | None = None,
    seed: int = 42,
    start: int = 0,
) -> DataFrame:
    """Distributed deterministic changelog — pure column expressions.

    Every attribute is a hash-derived function of the event id, so the
    dataset is identical regardless of partitioning or cluster size (the
    property the reference's thread_rng-based generator lacks). Conv
    popularity is log-uniform over ranks (each decade of ranks gets equal
    mass): the top conversation holds ~ln(2)/ln(N) of all events (a few
    percent — hot but not degenerate), while the tail keeps the distinct
    key count near the key-space size. ``skew_alpha`` sharpens the head
    (>1) or flattens it (<1).
    """
    import math

    df = spark.range(
        start, start + n_events, 1,
        numPartitions=parallelism or spark.sparkContext.defaultParallelism,
    )
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    u = (h % 1_000_000_000).cast("double") / 1.0e9  # uniform [0,1)
    rank = F.least(
        F.lit(n_conversations - 1),
        (
            F.exp(F.pow(u, F.lit(float(skew_alpha))) * F.lit(math.log(n_conversations)))
            - 1
        ).cast("long"),
    )
    h2 = F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1)))
    u2 = (h2 % 1_000_000_000).cast("double") / 1.0e9
    op = (
        F.when(u2 < delete_fraction, "D")
        .when(u2 < delete_fraction + update_fraction, "U")
        .otherwise("I")
    )
    turn = (h2 % turns_per_conv).cast("int")
    conv_id = F.concat(F.lit("conv-"), F.lpad(rank.cast("string"), 9, "0"))
    is_del = op == "D"
    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), (F.col("id") % 4 + 1).cast("int"))
    tool = F.element_at(F.array(*[F.lit(t) for t in TOOLS]), ((h % 5) + 1).cast("int"))
    text = F.concat(
        F.lit("turn "), turn.cast("string"), F.lit(" of "), conv_id,
        F.lit(" @lsn="), F.col("id").cast("string"),
    )
    ts = F.timestamp_micros(F.lit(_EPOCH_US) + F.col("id") * 1_000_000)
    return df.select(
        F.col("id").alias("lsn"),
        op.alias("op"),
        conv_id.alias("conv_id"),
        turn.alias("turn_idx"),
        F.when(~is_del, role).alias("role"),
        F.when(~is_del, text).alias("text"),
        F.when(~is_del, tool).alias("tool"),
        F.when(~is_del, ts).alias("ts"),
    )


def write_wal_segments(
    changelog: pd.DataFrame,
    wal_dir: str,
    n_segments: int,
    spark: SparkSession,
    schema: T.StructType | None = None,
    fmt: str = "parquet",
) -> list[str]:
    """Split a changelog into N 'WAL segment' files (emission-order
    chunks) under ``wal_dir`` — the file-stream source the streaming driver
    tails (the Spark analog of the reference's channel source,
    /root/reference/src/etl/processor.rs:33). ``fmt``: 'parquet' (columnar
    segments) or 'json' (binlog-style JSON-lines text segments)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(wal_dir, exist_ok=True)
    schema = schema or (
        CHANGELOG_SCHEMA_EVOLVED if "meta" in changelog.columns else CHANGELOG_SCHEMA
    )
    type_map = {
        T.LongType(): pa.int64(),
        T.IntegerType(): pa.int32(),
        T.StringType(): pa.string(),
        T.TimestampType(): pa.timestamp("us"),
        T.BooleanType(): pa.bool_(),
        T.DoubleType(): pa.float64(),
    }
    arrow_schema = pa.schema(
        [pa.field(f.name, type_map[f.dataType], f.nullable) for f in schema.fields]
    )
    paths = []
    # each segment is ONE real parquet file: the file-stream source lists
    # plain files in the directory, not nested Spark output dirs
    for i, idx in enumerate(np.array_split(np.arange(len(changelog)), n_segments)):
        pdf = changelog.iloc[idx]
        if fmt == "json":
            path = os.path.join(wal_dir, f"segment-{i:05d}.json")
            pdf.to_json(path, orient="records", lines=True, date_format="iso")
        else:
            path = os.path.join(wal_dir, f"segment-{i:05d}.parquet")
            pq.write_table(
                pa.Table.from_pandas(pdf, schema=arrow_schema, preserve_index=False),
                path,
            )
        paths.append(path)
    return paths
