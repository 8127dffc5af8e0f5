"""K-means index builder tests: loss decreases, assignment is truly the
nearest centroid, and a kmeans-built IVF index reaches useful recall."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.kmeans import (
    assign_clusters,
    inertia,
    kmeans_fit,
)
from spotify_etl_pipeline_spark.operators.similarity import brute_force_topk, ivf_topk
from spotify_etl_pipeline_spark.schemas import load_fixture


def _vectors(spark, sf_dir):
    return load_fixture(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def test_kmeans_monotone_loss(spark, sf_dir):
    vecs = _vectors(spark, sf_dir)
    c1 = kmeans_fit(vecs, k=4, max_iter=1)
    c5 = kmeans_fit(vecs, k=4, max_iter=5)
    assert inertia(vecs, c5) <= inertia(vecs, c1) + 1e-9


def test_assignment_is_nearest(spark, sf_dir):
    vecs = _vectors(spark, sf_dir)
    cents = kmeans_fit(vecs, k=3, max_iter=3)
    sample = assign_clusters(vecs, cents).limit(50).collect()
    for row in sample:
        dists = [
            sum((a - b) ** 2 for a, b in zip(row["v"], c)) for c in cents
        ]
        assert row["cluster"] == dists.index(min(dists))
        assert math.isclose(row["_d2"], min(dists), rel_tol=1e-9)


def test_ivf_over_kmeans_clusters_recall(spark, sf_dir):
    """IVF with a kmeans-built index (no label column needed) must reach
    >=60% recall@5 vs brute force at n_probe=2 of 4 clusters."""
    emb = load_fixture(spark, sf_dir, "embeddings")
    vecs = _vectors(spark, sf_dir)
    cents = kmeans_fit(vecs, k=4, max_iter=3)
    clustered = (
        assign_clusters(vecs, cents)
        .select("vec_id", "cluster")
        .join(emb, "vec_id")
    )
    queries = clustered.limit(20)
    exact = brute_force_topk(emb, queries.select("vec_id", "embedding"), k=5)
    approx = ivf_topk(
        clustered, queries, k=5, n_probe=2, cluster_col="cluster"
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.6


def test_train_sample_cap_and_determinism(spark, sf_dir):
    """Hash-stride training sample: no-op under the cap, ~cap rows and
    bit-stable across invocations when it binds."""
    from spotify_etl_pipeline_spark.operators.kmeans import train_sample

    vecs = _vectors(spark, sf_dir)
    n = vecs.count()
    # cap above n: identity (same object, zero extra plan nodes)
    assert train_sample(vecs, n + 1, "vec_id") is vecs
    # binding cap: expected size ~= cap (hash stride, +/- sampling noise)
    cap = max(10, n // 5)
    s1 = train_sample(vecs, cap, "vec_id")
    ids1 = sorted(r["vec_id"] for r in s1.select("vec_id").collect())
    assert 0 < len(ids1) < n
    assert len(ids1) < 2 * cap
    ids2 = sorted(
        r["vec_id"]
        for r in train_sample(vecs, cap, "vec_id").select("vec_id").collect()
    )
    assert ids1 == ids2


def test_fit_unchanged_when_cap_not_binding(spark, sf_dir):
    """Centroids with the default Faiss-style cap == uncapped fit at
    fixture scale — the guarantee that driver correctness rows are
    untouched by the training cap."""
    vecs = _vectors(spark, sf_dir)
    capped = kmeans_fit(vecs, k=3, max_iter=2)
    uncapped = kmeans_fit(vecs, k=3, max_iter=2, max_points_per_centroid=0)
    assert capped == uncapped
