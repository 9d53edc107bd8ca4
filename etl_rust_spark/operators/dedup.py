"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame/SQL compositions (codegen'd, no Python in
the hot path) and deterministic, so each has an exact ANSI-SQL oracle.

Scale notes (100 TB / 10^9+ docs):
- exact dedup: hash-groupBy on md5(text) — map-side partial agg collapses
  duplicates before the shuffle; the shuffle carries one row per distinct
  hash, not per doc.
- MinHash+LSH: signatures are computed per-row with array functions (zero
  shuffle), then ONE explode to (doc, band) and a self-join per band bucket
  — the classic shingle→minhash→band→bucket-join plan. Candidate
  verification touches only bucket-colliding pairs, never the n² space.
- SimHash: per-row fingerprint (zero shuffle) + groupBy fingerprint.
- n-gram Jaccard: exact pairwise within cheap blocking keys only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rust_spark.functions.hashing import shingles


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: one keeper (min id) + copy count per
    distinct text (hashed — the comparison never ships full text)."""
    grouped = docs.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.min(id_col).alias("keeper_id"),
        F.count("*").alias("n_copies"),
    )
    return grouped


def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature — H lexicographic minima over salted md5
    of word shingles.

    Plan: shingle once → explode → groupBy(doc) with H min() aggregates.
    The explode+agg beats H inline array_min(transform(...)) expressions
    by ~8× because Catalyst inlines (not CSEs) the shingle pipeline into
    every array element; the agg also gets map-side partial aggregation,
    which is what keeps the shuffle bounded at 10^9 docs."""
    base = docs.select(
        F.col(id_col), F.array_distinct(shingles(text_col, shingle_n)).alias("shingle_set")
    ).filter(F.size("shingle_set") > 0)
    base = base.persist()
    exploded = base.select(F.col(id_col), F.explode("shingle_set").alias("__sh"))
    sig = exploded.groupBy(id_col).agg(
        F.array(
            *[
                F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("__sh"))))
                for i in range(n_hashes)
            ]
        ).alias("sig")
    )
    return base.join(sig, on=id_col)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding, verified by exact
    shingle-set Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b."""
    rows = n_hashes // bands
    sigs = minhash_signature(docs, text_col, id_col, n_hashes, shingle_n).persist()
    # band rows carry ONLY (id, band, bucket) — the shingle arrays never
    # ride through the self-join (they'd multiply the shuffle by the
    # candidate fan-out); sets are re-joined per verified candidate pair
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|", *[F.col("sig")[b * rows + r] for r in range(rows)]
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("lsh"),
    ).select(id_col, "lsh.band", "lsh.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sets = sigs.select(F.col(id_col), F.col("shingle_set"))
    pairs = (
        cand.join(sets.alias("sa"), F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(sets.alias("sb"), F.col("id_b") == F.col(f"sb.{id_col}"))
        .select(
            "id_a", "id_b",
            F.col("sa.shingle_set").alias("sh_a"),
            F.col("sb.shingle_set").alias("sh_b"),
        )
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """Per-doc SimHash fingerprint (bit-vote over word hashes).

    Plan: explode distinct words → md5 each word ONCE → groupBy(doc) with
    one SUM aggregate per bit. A previous inline-expression version nested
    the word-md5 pipeline inside the per-bit lambda, so md5 ran ``bits``×
    per word (Catalyst inlines, it does not CSE across lambda bodies);
    the explode+agg shape hashes each word exactly once and gets map-side
    partial aggregation — the same plan move that made MinHash 8× faster.
    """
    from etl_rust_spark.functions.hashing import md5_long

    words = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), " "))
        ).alias("__w"),
    ).select(F.col(id_col), md5_long("__w").alias("__h"))
    votes = words.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("__h").bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1)
            ).alias(f"__v{j}")
            for j in range(bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(F.col(f"__v{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return votes.select(F.col(id_col), fp.cast("long").alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    block_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within blocking keys.

    Blocking (e.g. same lang + source) bounds the pair space; within a
    block the pair join is an equi-join on the block key, so at scale each
    block is one shuffle partition's local problem, never a global n²."""
    sh = F.array_distinct(shingles(text_col, shingle_n))
    d = docs.select(*block_cols, F.col(id_col), sh.alias("sh")).filter(F.size("sh") > 0)
    a, b = d.alias("a"), d.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    jac = F.size(F.array_intersect("a.sh", "b.sh")) / F.size(F.array_union("a.sh", "b.sh"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
