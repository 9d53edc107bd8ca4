"""Block-size guard for ngram_jaccard_pairs: a skew fixture with one giant
block must complete with BOUNDED candidate volume (no local n² join), find
a rich pair set (≥ 20 pairs), and match an independently computed DuckDB
oracle on the union of exact-path and approximate-path results."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_rust_spark.operators import dedup as dd

N_HASHES, BANDS, TAU, MAX_BLOCK = 8, 8, 0.4, 50


@pytest.fixture(scope="module")
def skew_docs(spark):
    """One giant (en, hot) block of 400 docs — 30 planted near-dup pairs,
    the rest distinct — plus small blocks with 5 more planted pairs."""
    rows = []
    did = 0

    def doc(lang, source, text):
        nonlocal did
        rows.append((did, lang, source, text))
        did += 1

    for i in range(30):  # 30 near-dup pairs inside the giant block,
        # each pair on its own vocabulary so cross-pair jaccard is ~0
        base = " ".join(f"p{i}base{j}" for j in range(14))
        doc("en", "hot", f"{base} alpha beta gamma")
        doc("en", "hot", f"{base} alpha beta delta")
    for i in range(340):  # padding: distinct docs, same giant block
        doc("en", "hot", f"completely unrelated text number {i} " + " ".join(f"tok{i}w{j}" for j in range(12)))
    for i in range(5):  # small blocks, one planted pair each
        doc("de", f"s{i}", f"kleiner block text nummer {i} eins zwei drei vier fünf sechs")
        doc("de", f"s{i}", f"kleiner block text nummer {i} eins zwei drei vier fünf sieben")
        doc("de", f"s{i}", f"andere sache {i} " + " ".join(f"w{i}x{j}" for j in range(10)))
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )


def test_guarded_matches_duckdb_oracle_and_is_bounded(spark, skew_docs):
    got = (
        dd.ngram_jaccard_pairs_guarded(
            skew_docs, ["lang", "source"], shingle_n=3, threshold=TAU,
            max_block=MAX_BLOCK, n_hashes=N_HASHES, bands=BANDS,
        )
        .orderBy("id_a", "id_b")
        .collect()
    )
    assert len(got) >= 20, f"fixture should yield >=20 pairs, got {len(got)}"

    # independent DuckDB replay of the same guarded algorithm
    from etl_rust_spark.queries import _guarded_jaccard_oracle

    con = duckdb.connect()
    pdf = skew_docs.toPandas()
    con.register("documents", pdf)
    oracle = con.sql(
        _guarded_jaccard_oracle(
            shingle_n=3, tau=TAU, max_block=MAX_BLOCK,
            n_hashes=N_HASHES, bands=BANDS,
        )
    ).fetchall()
    got_set = {(r["id_a"], r["id_b"], r["jaccard"]) for r in got}
    oracle_set = {(a, b, j) for a, b, j in oracle}
    assert got_set == oracle_set

    # the guard really bounds the candidate space: the giant block's exact
    # n² would be ~80k pairs; band-bucket candidates must stay far below
    big = skew_docs.join(
        skew_docs.groupBy("lang", "source").agg(F.count("*").alias("n")),
        on=["lang", "source"],
    ).filter(F.col("n") > MAX_BLOCK)
    cand = (
        dd.minhash_signature(big, carry_cols=["lang", "source"], n_hashes=N_HASHES)
        .count()
    )
    assert cand == 400  # all giant-block docs got signatures (none dropped)
    n_big = 400
    n_exact_pairs = n_big * (n_big - 1) // 2
    assert len([r for r in got if r["id_a"] >= 0]) < n_exact_pairs / 100


def test_guard_routes_small_blocks_exact(spark, skew_docs):
    """Small-block pairs must be found EXACTLY (recall 1.0 there): every
    planted small-block pair appears regardless of LSH luck."""
    got = dd.ngram_jaccard_pairs_guarded(
        skew_docs, ["lang", "source"], shingle_n=3, threshold=TAU,
        max_block=MAX_BLOCK, n_hashes=N_HASHES, bands=BANDS,
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    # small-block planted pairs live at ids (400+3i, 401+3i)
    for i in range(5):
        assert (400 + 3 * i, 401 + 3 * i) in pairs


def test_connected_components_chain_and_cliques(spark):
    """Min-label propagation must converge on a long CHAIN (diameter >>
    1), merge overlapping pairs into one component, and keep disjoint
    components apart."""
    edges = [(i, i + 1) for i in range(10, 20)]       # chain 10-…-20
    edges += [(1, 2), (2, 3), (1, 3)]                 # clique {1,2,3}
    edges += [(100, 101)]                             # pair {100,101}
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.connected_components(pairs).collect()
    }
    assert {got[i] for i in range(10, 21)} == {10}
    assert {got[i] for i in (1, 2, 3)} == {1}
    assert got[100] == got[101] == 100
    assert len(got) == 11 + 3 + 2


def test_connected_components_nonconvergence_raises(spark):
    """A component whose diameter exceeds max_iters must error loudly —
    silently returning split labels would keep duplicates (round-3 guard;
    ADVICE r02). With enough rounds the same chain converges to one
    cluster."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.connected_components(chain, max_iters=3)
    labels = dd.connected_components(chain, max_iters=15)
    assert {r["cluster_id"] for r in labels.collect()} == {0}
    assert labels.count() == 13


def test_minhash_lsh_pairs_releases_caches(spark):
    """Round-3 cache hygiene: the shingle base and signature caches must
    not outlive the call — at most the materialized result (one local
    checkpoint) may remain, and it is still fully usable afterwards."""
    docs = spark.createDataFrame(
        [
            (i, f"group {i % 5} shared shingle text body word{i % 5} "
                + " ".join(f"t{i % 5}x{j}" for j in range(10)))
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    sc = spark.sparkContext
    before = sc._jsc.getPersistentRDDs().size()
    out = dd.minhash_lsh_pairs(docs, jaccard_threshold=0.5)
    after = sc._jsc.getPersistentRDDs().size()
    assert after - before <= 1, "base/sigs caches leaked past the call"
    assert out.count() > 0  # result independent of the dropped caches
