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


def _shingle_base(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    carry_cols: list[str] | None,
) -> DataFrame:
    return docs.select(
        *(carry_cols or []),
        F.col(id_col),
        F.array_distinct(shingles(text_col, shingle_n)).alias("shingle_set"),
    ).filter(F.size("shingle_set") > 0)


def _signature_from_base(base: DataFrame, id_col: str, n_hashes: int) -> DataFrame:
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


def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    shingle_n: int = 3,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-doc MinHash signature — H lexicographic minima over salted md5
    of word shingles. ``carry_cols`` ride along (e.g. blocking keys).

    Plan: shingle once → explode → groupBy(doc) with H min() aggregates.
    The explode+agg beats H inline array_min(transform(...)) expressions
    by ~8× because Catalyst inlines (not CSEs) the shingle pipeline into
    every array element; the agg also gets map-side partial aggregation,
    which is what keeps the shuffle bounded at 10^9 docs.

    Pure plan builder (no caching side effects): a caller that evaluates
    the result more than once should persist it — ``minhash_lsh_pairs``
    does, and unpersists before returning (round-3 cache hygiene)."""
    base = _shingle_base(docs, text_col, id_col, shingle_n, carry_cols)
    return _signature_from_base(base, id_col, n_hashes)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding, verified by exact
    shingle-set Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b.

    ``block_cols``: optional blocking keys hashed INTO the band bucket, so
    only same-block docs can collide — this is how oversized blocks from
    ngram_jaccard_pairs_guarded keep their block semantics on the
    approximate path.

    Caching: ``base`` (the shingle sets) and ``sigs`` are each consumed
    twice, so both persist for the duration of the call; the result is
    materialized via an eager ``localCheckpoint`` (pairs are tiny —
    (id, id, jaccard)) and the caches are dropped in ``finally``, so no
    persisted RDDs outlive the call (round-3 cache hygiene; the
    checkpointed result is released by the ContextCleaner with the
    returned DataFrame)."""
    rows = n_hashes // bands
    base = _shingle_base(docs, text_col, id_col, shingle_n, block_cols).persist()
    sigs = _signature_from_base(base, id_col, n_hashes).persist()
    try:
        return _lsh_pairs_from_sigs(
            sigs, id_col, bands, rows, jaccard_threshold, block_cols
        ).localCheckpoint(eager=True)
    finally:
        sigs.unpersist()
        base.unpersist()


def minhash_lsh_pairs_plan(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """The same pair computation as ``minhash_lsh_pairs`` but fully LAZY
    (no caching, no checkpoint): the signature subtree is recomputed at
    each of its two uses. For plan inspection (scripts/explain_audit.py)
    and callers that manage persistence themselves."""
    base = _shingle_base(docs, text_col, id_col, shingle_n, block_cols)
    sigs = _signature_from_base(base, id_col, n_hashes)
    return _lsh_pairs_from_sigs(
        sigs, id_col, bands, n_hashes // bands, jaccard_threshold, block_cols
    )


def _lsh_pairs_from_sigs(
    sigs: DataFrame,
    id_col: str,
    bands: int,
    rows: int,
    jaccard_threshold: float,
    block_cols: list[str] | None,
) -> DataFrame:
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
                                "|",
                                *[F.col("sig")[b * rows + r] for r in range(rows)],
                                *[F.col(c) for c in (block_cols or [])],
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
    # threshold compares the ROUNDED value (exact-path parity: both engines
    # then agree even when the raw ratio sits within 5e-7 of the cut)
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Cluster ids from near-duplicate PAIR edges — the step a dedup
    pipeline actually consumes (keep min-id per component, drop the rest).

    Min-label propagation: every node starts labeled with itself; each
    round every node takes the min of its own and its neighbors' labels;
    converged when no label changes. Rounds needed = graph diameter —
    near-dup components are clique-ish (diameter ~2-3). Each round is one
    join + one aggregation, labels localCheckpoint'ed so the plan doesn't
    grow; edges carry only (id, id) — at 10^9 docs the label table is one
    long column, never the text.

    Raises when ``max_iters`` rounds pass without convergence (component
    diameter > max_iters): silently returning partial labels would split
    one component into several cluster ids and a dedup consumer would
    keep duplicates (round-3 guard; ADVICE r02).

    Returns (doc_id, cluster_id) for every node that appears in an edge
    (singletons aren't dup-group members by definition)."""
    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionAll(
        pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    ).distinct().persist()
    labels = (
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iters):
        incoming = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(incoming, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(a component's diameter exceeds max_iters) — raise max_iters; "
            "partial labels would silently split a component"
        )
    return labels


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    shingle_n: int = 5,
    min_shared: int = 1,
) -> DataFrame:
    """Test-set DECONTAMINATION: flag training docs that share ≥
    ``min_shared`` distinct word n-grams with any benchmark item — the
    standard n-gram-overlap contamination check (GPT-3 §C / PaLM-style,
    usually 8-13 grams at scale; n is a knob). Returns
    (doc_id, bench_id, n_shared).

    Plan: both sides explode to (id, shingle); the benchmark side is tiny
    (eval sets are thousands of items) so it BROADCASTS — the corpus side
    streams through map tasks with no shuffle of the corpus text; the
    only aggregation is over matched (doc, bench) pairs. At 10^9 docs the
    cost is one broadcast-hash-join probe per corpus shingle. Zero
    Python."""
    d = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles(text_col, shingle_n))
        ).alias("__g"),
    )
    b = benchmark.select(
        F.col(bench_id_col),
        F.explode(
            F.array_distinct(shingles(text_col, shingle_n))
        ).alias("__g"),
    )
    return (
        d.join(F.broadcast(b), "__g")
        .groupBy(id_col, bench_id_col)
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def dedup_incremental(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    checkpoint: bool = True,
) -> DataFrame:
    """INCREMENTAL near-dup check: new documents against an EXISTING
    corpus (the daily-ingest shape — never re-pair the corpus against
    itself). Returns (new_id, corpus_id, jaccard) with exact-Jaccard
    verification. ``checkpoint=False`` returns the lazy uncached plan
    (for plan inspection; caching hygiene then falls to the caller).

    Same MinHash+LSH machinery as ``minhash_lsh_pairs`` but the band join
    is CROSS-SET only (new × corpus): band rows carry one extra `side`
    bit and the join keeps new-vs-corpus collisions, so candidate volume
    is |new| × collision-rate, independent of corpus² . In production the
    corpus side's signatures/bands are a persisted table maintained by
    the ingest pipeline (computable once via ``minhash_signature``), so
    the per-increment cost is shingling the NEW docs only."""
    rows = n_hashes // bands

    def prep(df):
        base = _shingle_base(df, text_col, id_col, shingle_n, None)
        return _signature_from_base(base, id_col, n_hashes)

    nsig = prep(new_docs)
    csig = prep(corpus)
    if checkpoint:
        nsig = nsig.persist()
        csig = csig.persist()
    try:

        def band(df):
            return df.select(
                id_col,
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band"),
                                F.md5(
                                    F.concat_ws(
                                        "|",
                                        *[
                                            F.col("sig")[b * rows + r]
                                            for r in range(rows)
                                        ],
                                    )
                                ).alias("bucket"),
                            )
                            for b in range(bands)
                        ]
                    )
                ).alias("lsh"),
            ).select(id_col, "lsh.band", "lsh.bucket")

        cand = (
            band(nsig).alias("n")
            .join(
                band(csig).alias("c"),
                (F.col("n.band") == F.col("c.band"))
                & (F.col("n.bucket") == F.col("c.bucket")),
            )
            .select(
                F.col(f"n.{id_col}").alias("new_id"),
                F.col(f"c.{id_col}").alias("corpus_id"),
            )
            .distinct()
        )
        pairs = (
            cand.join(
                nsig.select(F.col(id_col), F.col("shingle_set").alias("sh_n")),
                F.col("new_id") == F.col(id_col),
            )
            .drop(id_col)
            .join(
                csig.select(F.col(id_col), F.col("shingle_set").alias("sh_c")),
                F.col("corpus_id") == F.col(id_col),
            )
            .drop(id_col)
        )
        jac = F.size(F.array_intersect("sh_n", "sh_c")) / F.size(
            F.array_union("sh_n", "sh_c")
        )
        out = (
            pairs.withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= jaccard_threshold)
            .select("new_id", "corpus_id", "jaccard")
        )
        return out.localCheckpoint(eager=True) if checkpoint else out
    finally:
        if checkpoint:
            nsig.unpersist()
            csig.unpersist()


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


def ngram_jaccard_pairs_guarded(
    docs: DataFrame,
    block_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_block: int = 1000,
    n_hashes: int = 8,
    bands: int = 8,
) -> DataFrame:
    """Block-size-guarded exact Jaccard pairs.

    The unguarded version degenerates to a LOCAL n² self-join when one
    block is hot (a single (lang, source) holding 10^6 docs = 10^12
    candidate rows on one shuffle partition). The guard counts block
    sizes and routes:

    - blocks ≤ ``max_block``: exact pairwise (complete within the block);
    - oversized blocks: MinHash+LSH banding WITH the block key hashed into
      the bucket (same-block candidates only), verified by the same exact
      shingle Jaccard — candidate volume is bounded by band-bucket
      collisions instead of block², at the cost of LSH recall on the
      oversized blocks.

    Fully deterministic → still has an exact SQL oracle."""
    d = docs.select(*block_cols, F.col(id_col), F.col(text_col))
    counts = d.groupBy(*block_cols).agg(F.count("*").alias("__bn"))
    d2 = d.join(counts, on=block_cols)
    small = d2.filter(F.col("__bn") <= max_block).drop("__bn")
    big = d2.filter(F.col("__bn") > max_block).drop("__bn")
    exact = ngram_jaccard_pairs(
        small, block_cols, text_col, id_col, shingle_n, threshold
    )
    approx = minhash_lsh_pairs(
        big, text_col, id_col, n_hashes, bands, shingle_n, threshold,
        block_cols=block_cols,
    )
    return exact.unionByName(approx)


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
    block is one shuffle partition's local problem — but an UNBOUNDED
    block is still block-quadratic: use ``ngram_jaccard_pairs_guarded``
    unless block sizes are known-capped."""
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
