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

from etl_rust_spark.functions.hashing import md5_long, shingles


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
    of word shingles. Entirely per-row (array functions): zero shuffle."""
    sh = F.array_distinct(shingles(text_col, shingle_n))
    sig = F.array(
        *[
            F.array_min(F.transform(sh, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s))))
            for i in range(n_hashes)
        ]
    )
    return docs.select(
        F.col(id_col), F.col(text_col), sh.alias("shingle_set"), sig.alias("sig")
    ).filter(F.size("shingle_set") > 0)


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
    sigs = minhash_signature(docs, text_col, id_col, n_hashes, shingle_n)
    banded = sigs.select(
        id_col,
        "shingle_set",
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
    ).select(id_col, "shingle_set", "lsh.band", "lsh.bucket")
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
            F.col("a.shingle_set").alias("sh_a"),
            F.col("b.shingle_set").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """Per-doc SimHash fingerprint (bit-vote over word hashes), zero
    shuffle. Duplicate groups = equal fingerprints."""
    fp = F.expr(
        f"""
        aggregate(
          transform(sequence(0, {bits - 1}), j ->
            CASE WHEN aggregate(array_distinct(split(lower({text_col}), ' ')), 0,
                  (acc, w) -> acc + CASE WHEN
                    ((CAST(conv(substring(md5(w), 1, 15), 16, 10) AS LONG) >> j) & 1) = 1
                    THEN 1 ELSE -1 END) >= 0
            THEN CAST(shiftleft(1, j) AS LONG) ELSE 0L END),
          0L, (s, v) -> s + v)
        """
    )
    return docs.select(F.col(id_col), fp.alias("simhash"))


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
