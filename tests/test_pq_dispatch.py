"""|Q|-aware PQ search dispatch (operators/pq.py::pq_route/pq_topk_auto):
the routing model picks exhaustive ADC vs IVFADC by the candidate pairs
probing would avoid, and the dispatcher wires the chosen arm unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

import spotify_etl_pipeline_spark.operators.pq as PQ
from spotify_etl_pipeline_spark.operators.pq import (
    pq_adc_rerank_topk,
    pq_encode,
    pq_fit,
    pq_ivfadc_topk,
    pq_route,
    pq_topk_auto,
)
from spotify_etl_pipeline_spark.schemas import load_fixture


def test_route_reproduces_measured_crossover():
    # the two sf10 calibration points (SCALE.md): 200K vectors, C=10, p=3
    assert pq_route(200_000, 10, 3, 10) == "exhaustive"  # 2M pairs: measured faster exhaustive
    assert pq_route(200_000, 500, 3, 10) == "ivfadc"  # 100M pairs: measured 3.5x via IVFADC
    # scale monotonicity: bigger corpora/query batches route to IVFADC
    assert pq_route(10**9, 100, 8, 1000) == "ivfadc"
    # probing everything saves nothing -> exhaustive by construction
    assert pq_route(10**9, 10**6, 10, 10) == "exhaustive"
    assert pq_route(10**9, 10**6, 20, 10) == "exhaustive"
    # fixture scale is far below the crossover
    assert pq_route(2_000, 10, 3, 10) == "exhaustive"


def _fixture(spark, sf_dir):
    emb = load_fixture(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    books = pq_fit(emb, m=4, k=16)
    codes = pq_encode(emb, books, keep_cols=("label",))
    return emb, queries, books, codes


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_dispatch_takes_exhaustive_arm_below_crossover(spark, sf_dir):
    emb, queries, books, codes = _fixture(spark, sf_dir)
    auto = pq_topk_auto(emb, codes, queries, books, k=5, shortlist=50, n_probe=3)
    exhaustive = pq_adc_rerank_topk(emb, codes, queries, books, k=5, shortlist=50)
    assert _rows(auto) == _rows(exhaustive)


def test_dispatch_takes_ivfadc_arm_above_crossover(spark, sf_dir, monkeypatch):
    # zero overhead pushes the crossover below fixture scale
    monkeypatch.setattr(PQ, "PQ_DISPATCH_OVERHEAD_PAIRS", 0)
    emb, queries, books, codes = _fixture(spark, sf_dir)
    auto = pq_topk_auto(emb, codes, queries, books, k=5, shortlist=50, n_probe=3)
    ivfadc = pq_ivfadc_topk(emb, codes, queries, books, k=5, shortlist=50, n_probe=3)
    assert _rows(auto) == _rows(ivfadc)
    # and the two arms genuinely differ here (n_probe=3 of 10 restricts
    # candidates), so the equality above identifies the arm, not a no-op
    exhaustive = pq_adc_rerank_topk(emb, codes, queries, books, k=5, shortlist=50)
    assert _rows(auto) != _rows(exhaustive)


def test_dispatch_accepts_precomputed_sizes(spark, sf_dir):
    """The stored-index serving path: metadata passed in, no count jobs —
    and a forced-large |Q| routes to IVFADC without touching the data."""
    emb, queries, books, codes = _fixture(spark, sf_dir)
    auto = pq_topk_auto(
        emb, codes, queries, books, k=5, shortlist=50, n_probe=3,
        n_corpus=10**9, n_queries=500, n_clusters=10,
    )
    ivfadc = pq_ivfadc_topk(emb, codes, queries, books, k=5, shortlist=50, n_probe=3)
    assert _rows(auto) == _rows(ivfadc)
