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
