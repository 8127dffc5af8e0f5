"""Property tests for the round-4 additions: SemDeDup and Bloom
decontamination.

- SemDeDup only ever *restricts* the brute-force pair set: every
  (kept, dropped) pair it emits must also be an above-threshold pair under
  the exact all-pairs cosine (cluster scoping can miss cross-cluster dups —
  that is the accepted recall trade of Abbas et al. 2023 — but it must
  never invent a pair).
- Bloom filters have NO false negatives by construction: every document
  with an exact benchmark hit must appear in the bloom output with
  ``n_bloom >= n_exact``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.bloom import bloom_contamination
from spotify_etl_pipeline_spark.operators.curation import benchmark_ngram_hits
from spotify_etl_pipeline_spark.operators.dedup import (
    embedding_neardup_pairs,
    semdedup_dropped,
)
from spotify_etl_pipeline_spark.schemas import load_fixture

THR = 0.45


def test_semdedup_pairs_subset_of_brute_force(spark, sf_dir):
    emb = load_fixture(spark, sf_dir, "embeddings")
    sem = semdedup_dropped(emb, n_centroids=8, threshold=THR)
    brute = embedding_neardup_pairs(emb, threshold=THR)
    sem_pairs = {
        (r["kept_id"], r["dropped_id"]) for r in sem.collect()
    }
    brute_pairs = {(r["vec_a"], r["vec_b"]) for r in brute.collect()}
    assert sem_pairs <= brute_pairs
    # each dropped id appears exactly once (lowest-id witness is unique)
    dropped = [r["dropped_id"] for r in sem.collect()]
    assert len(dropped) == len(set(dropped))


def test_semdedup_witness_map_matches_differential(spark, sf_dir):
    # the contract: each dropped id's witness is its lowest-id same-cluster
    # near-dup — which may ITSELF be dropped in a transitive chain (survivors
    # are the ids never appearing in dropped_id; see semdedup_dropped's
    # docstring).
    # differential recomputation of the expected witness map: assignment
    # via the shared helper, pairs via the independent all-pairs operator,
    # minimum taken in local Python — a wrong-but-still-lower witness (or
    # a missing/extra dropped id) fails here, unlike chain-shape checks
    # that kept_id < dropped_id already implies
    from pyspark.sql import functions as F2

    from spotify_etl_pipeline_spark.operators.dedup import _semdedup_assign

    emb = load_fixture(spark, sf_dir, "embeddings")
    sem = semdedup_dropped(emb, n_centroids=8, threshold=THR).collect()
    witness = {r["dropped_id"]: r["kept_id"] for r in sem}
    for r in sem:
        assert r["kept_id"] < r["dropped_id"]

    e = emb.select(
        "vec_id", F2.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cluster_of = {
        r["vec_id"]: r["cluster"]
        for r in _semdedup_assign(e, 8, "literal").collect()
    }
    brute = embedding_neardup_pairs(emb, threshold=THR).collect()
    expected: dict = {}
    for p in brute:
        a, b = p["vec_a"], p["vec_b"]
        if cluster_of[a] == cluster_of[b]:
            expected[b] = min(expected.get(b, a), a)
    assert witness == expected


def test_bloom_has_no_false_negatives(spark, sf_dir):
    docs = load_fixture(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 29 == 0)
    corpus = docs.filter(F.col("doc_id") % 29 != 0)
    bloom = bloom_contamination(corpus, bench, n=5).collect()
    exact = benchmark_ngram_hits(corpus, bench, n=5).collect()
    bloom_by_doc = {r["doc_id"]: (r["n_bloom"], r["n_exact"]) for r in bloom}
    for r in exact:
        assert r["doc_id"] in bloom_by_doc, "exact hit missing from bloom"
        n_bloom, n_exact = bloom_by_doc[r["doc_id"]]
        assert n_exact == r["n_hits"], "exact count drifted from exact pass"
        assert n_bloom >= n_exact, "bloom under-flagged (false negative)"


def test_semdedup_assign_paths_agree(spark, sf_dir):
    """literal vs join assignment must produce identical output (same
    pinned centroids, same (d2, cid) tie-break) — the regime switch is a
    cost decision, never a semantics change."""
    emb = load_fixture(spark, sf_dir, "embeddings")
    for c in (8, 64):
        lit = {
            tuple(r)
            for r in semdedup_dropped(emb, c, THR, assign="literal").collect()
        }
        jon = {
            tuple(r)
            for r in semdedup_dropped(emb, c, THR, assign="join").collect()
        }
        assert lit == jon, f"assign paths diverge at C={c}"


def test_semdedup_rejects_unknown_assign(spark, sf_dir):
    import pytest as _pytest

    emb = load_fixture(spark, sf_dir, "embeddings")
    with _pytest.raises(ValueError, match="assign"):
        semdedup_dropped(emb, 8, THR, assign="bogus")


def test_semdedup_auto_centroids_matches_pinned(spark, sf_dir):
    """n_centroids="auto" must behave exactly like passing the derived
    sqrt-n C by hand — the dial changes WHERE C comes from, never what the
    operator computes (this is what keeps the dynamic-C oracle, which
    rederives C with FLOOR(SQRT(COUNT(*))), hash-identical)."""
    from spotify_etl_pipeline_spark.operators.dedup import semdedup_auto_centroids

    emb = load_fixture(spark, sf_dir, "embeddings")
    c = semdedup_auto_centroids(emb.count())
    auto = {
        tuple(r) for r in semdedup_dropped(emb, "auto", THR).collect()
    }
    pinned = {
        tuple(r) for r in semdedup_dropped(emb, c, THR).collect()
    }
    assert auto == pinned


def test_semdedup_auto_centroids_formula():
    from spotify_etl_pipeline_spark.operators.dedup import semdedup_auto_centroids

    assert semdedup_auto_centroids(1) == 2  # floored so tiny corpora partition
    assert semdedup_auto_centroids(4) == 2
    assert semdedup_auto_centroids(500) == 22  # sf0.01 fixture -> literal regime
    assert semdedup_auto_centroids(2_000) == 44  # sf0.1 fixture -> join regime
    assert semdedup_auto_centroids(10**8) == 10_000


def test_semdedup_rejects_bad_n_centroids(spark, sf_dir):
    import pytest as _pytest

    emb = load_fixture(spark, sf_dir, "embeddings")
    with _pytest.raises(ValueError, match="n_centroids"):
        semdedup_dropped(emb, "bogus", THR)
