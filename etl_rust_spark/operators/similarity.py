"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (small) query
set against the corpus, dot products computed with JVM higher-order array
functions (zip_with + aggregate fold), no Python. At 100 TB the corpus side
stays partition-parallel and the query side broadcasts; the top-k is a
per-query window over corpus partitions with partial top-k pushed into the
shuffle by Catalyst (TakeOrderedAndProject for small k).

Scale path: sign-LSH (random-hyperplane-style) bucketing — here the
hyperplanes are fixed coordinate subsets so the operator stays exactly
reproducible in ANSI SQL. Buckets shrink each query's candidate set by
~2^bits; recall/latency trade via n_bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    )


def _norm(a: str):
    return F.sqrt(_dot(a, a))


def cosine(a: str, b: str):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query id (excluding self)."""
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = embeddings.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine("qvec", vec_col), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def sign_lsh_bucket(vec_col: str, n_bits: int = 4):
    """Bucket id from the signs of the first n_bits coordinates — a fixed,
    SQL-reproducible stand-in for random-hyperplane LSH."""
    return F.expr(
        f"aggregate(transform(sequence(0, {n_bits - 1}),"
        f" j -> CASE WHEN element_at({vec_col}, j + 1) >= 0 THEN shiftleft(1, j) ELSE 0 END),"
        f" 0, (s, v) -> s + v)"
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only the query's sign-LSH bucket.

    The bucket equi-join replaces the all-pairs crossJoin; at scale the
    corpus is pre-bucketed (partitioned by bucket) so each query probes
    one partition."""
    with_bucket = embeddings.withColumn("bucket", sign_lsh_bucket(vec_col, n_bits))
    q = with_bucket.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    joined = with_bucket.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col(id_col) != F.col("query_id")),
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine("qvec", vec_col), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
