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


def test_forced_entry_sizes_route_to_ivfadc():
    """The driver entry knn_pq_auto_forced_ivfadc supplies (10^7 corpus,
    500 queries, C=10, n_probe=3); saved pairs 3.5e9 >> the 1e7 overhead,
    so the dispatcher provably takes the IVFADC arm — the full-hash
    driver row exercises that arm, not exhaustive."""
    from spotify_etl_pipeline_spark.operators.pq import pq_route

    assert pq_route(10_000_000, 500, 3, 10) == "ivfadc"


def test_pinned_ivfadc_matches_mean_recall_contract(spark, sf_dir):
    """probe_mode='pinned' + int_units=True is a determinism dial, not a
    different algorithm: same schema, k rows per query, and candidates
    still restricted to probed clusters (a neighbor outside every probed
    cluster of its query cannot appear)."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.pq import (
        pq_encode,
        pq_fit,
        pq_ivfadc_topk,
    )
    from spotify_etl_pipeline_spark.operators.similarity import ivf_probe_routing
    from spotify_etl_pipeline_spark.schemas import load_fixture

    emb = load_fixture(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    books = pq_fit(emb, m=4, k=16, max_iter=0)
    codes = pq_encode(emb, books, keep_cols=("label",))
    out = pq_ivfadc_topk(
        emb, codes, queries, books, k=5, shortlist=50, n_probe=3,
        probe_mode="pinned", int_units=True,
    )
    assert out.columns == ["query_id", "neighbor_id", "rank", "d2_micro"]
    probes = ivf_probe_routing(emb, queries, 3, "label", mode="pinned")
    stray = (
        out.join(emb.select(F.col("vec_id").alias("neighbor_id"), "label"),
                 "neighbor_id")
        .join(
            probes.withColumnRenamed("cluster", "label"),
            ["query_id", "label"],
            "left_anti",
        )
    )
    assert stray.count() == 0, "candidate outside every probed cluster"
    per_q = out.groupBy("query_id").count().collect()
    assert per_q and all(r["count"] == 5 for r in per_q)


def test_probe_routing_rejects_unknown_mode(spark, sf_dir):
    import pytest
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.similarity import ivf_probe_routing
    from spotify_etl_pipeline_spark.schemas import load_fixture

    emb = load_fixture(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="mode"):
        ivf_probe_routing(emb, q, 2, "label", mode="median")
