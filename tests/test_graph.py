"""operators/graph.py — PageRank invariants on hand-checkable graphs."""

from __future__ import annotations

import pytest

from spotify_etl_pipeline_spark.operators.graph import pagerank


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_two_node_cycle_is_uniform(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    r = _ranks(pagerank(edges, iterations=5))
    assert r["a"] == pytest.approx(0.5, abs=1e-12)
    assert r["b"] == pytest.approx(0.5, abs=1e-12)


def test_mass_conserved_with_dangling_node(spark):
    # b has no out-edges: its rank must be redistributed, not leaked
    edges = spark.createDataFrame([("a", "b"), ("c", "b")], ["src", "dst"])
    r = _ranks(pagerank(edges, iterations=4))
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    assert r["b"] > r["a"] == r["c"]


def test_one_iteration_matches_hand_computation(spark):
    # a->b, a->c (equal weight); b->a; c->a. n=3, d=0.85, r0=1/3 each.
    # contrib(b)=contrib(c)=r0/2; contrib(a)=r0+r0; no dangling.
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")], ["src", "dst"]
    )
    r = _ranks(pagerank(edges, iterations=1))
    third = 1.0 / 3
    assert r["a"] == pytest.approx(0.15 / 3 + 0.85 * (2 * third), rel=1e-12)
    assert r["b"] == pytest.approx(0.15 / 3 + 0.85 * (third / 2), rel=1e-12)
    assert r["b"] == pytest.approx(r["c"], abs=1e-15)


def test_edge_weights_split_contributions(spark):
    # a sends 3/4 of its rank to b and 1/4 to c
    edges = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        ["src", "dst", "w"],
    )
    r = _ranks(pagerank(edges, iterations=1, weight="w"))
    third = 1.0 / 3
    assert r["b"] == pytest.approx(0.15 / 3 + 0.85 * (third * 0.75), rel=1e-12)
    assert r["c"] == pytest.approx(0.15 / 3 + 0.85 * (third * 0.25), rel=1e-12)


def test_invalid_params_rejected(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(edges, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(edges, iterations=0)


def test_lpa_separates_disjoint_cliques(spark):
    from spotify_etl_pipeline_spark.operators.graph import label_propagation

    # two disjoint triangles: {1,2,3} and {10,11,12}
    tri = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(tri, ["src", "dst"])
    out = {r["node"]: r["label"] for r in label_propagation(edges, iterations=3).collect()}
    assert {out[1], out[2], out[3]} != {out[10], out[11], out[12]}
    assert len({out[1], out[2], out[3]}) == 1
    assert len({out[10], out[11], out[12]}) == 1
    # min tie-break: every member of a triangle converges to its min id
    assert out[1] == 1 and out[10] == 10


def test_lpa_weight_beats_degree(spark):
    from spotify_etl_pipeline_spark.operators.graph import label_propagation

    # node 5 has two light edges into the {1,2} pair and one heavy edge
    # to 9: the weighted majority must pull it to 9's label after round 1
    edges = spark.createDataFrame(
        [(1, 2, 10.0), (5, 1, 1.0), (5, 2, 1.0), (5, 9, 5.0)],
        ["src", "dst", "w"],
    )
    out = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=1, weight="w").collect()
    }
    assert out[5] == 9


def test_lpa_rejects_zero_iterations(spark):
    from spotify_etl_pipeline_spark.operators.graph import label_propagation

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        label_propagation(edges, iterations=0)


def test_iterative_operators_release_their_cache(spark):
    """pagerank/label_propagation persist loop-invariant tables and a
    per-round vector; every handle must be unpersisted before return —
    session-lifetime cache leaks compound across a 163-query sweep. The
    returned DataFrame is an eager localCheckpoint, so releasing the cache
    costs no recomputation on the caller's action."""
    from spotify_etl_pipeline_spark.operators.graph import label_propagation

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cm.isEmpty()

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")], ["src", "dst"]
    )
    pr = pagerank(edges, iterations=3)
    assert cm.isEmpty(), "pagerank left DataFrames in the session cache"
    lp = label_propagation(edges, iterations=3)
    assert cm.isEmpty(), "label_propagation left DataFrames in the session cache"
    # results stay usable (checkpointed, not recomputed-from-released-cache)
    assert pr.count() == 4 and lp.count() == 4
