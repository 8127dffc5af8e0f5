"""Unit tests for iterative connected components (operators/components.py)."""

from __future__ import annotations

from spotify_etl_pipeline_spark.operators.components import (
    connected_components,
    resolve_duplicates,
)


def test_chain_converges_to_min_label(spark):
    # 1-2-3-4-5 chain (diameter 4, forces several propagation rounds)
    # plus a separate 10-11 pair and isolated-by-absence node semantics.
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (5, 4), (10, 11)], "src long, dst long"
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_resolve_marks_survivors_and_singletons(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long")
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_survivor"])
        for r in resolve_duplicates(df, pairs, id_col="doc_id").collect()
    }
    assert out == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        4: (4, True),  # singleton: own cluster, survives
        5: (5, True),
        6: (5, False),
    }


def test_nonconvergence_raises(spark):
    """A chain deeper than max_iter must raise, never return a silently
    wrong labeling."""
    import pytest

    deep_chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(deep_chain, max_iter=2)
    # and with enough rounds the same graph resolves fine
    comp = {r["node"]: r["component"] for r in connected_components(deep_chain).collect()}
    assert set(comp.values()) == {0}


def test_star_contraction_matches_propagation_on_random_graphs(spark):
    """large-star/small-star must produce the identical (node, component)
    map as min-label propagation — components are algorithm-independent."""
    import random

    from spotify_etl_pipeline_spark.operators.components import (
        connected_components_star,
    )

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(25 + 10 * trial)
        ]
        df = spark.createDataFrame(edges, "src long, dst long")
        a = {
            r["node"]: r["component"]
            for r in connected_components(df, max_iter=50).collect()
        }
        b = {
            r["node"]: r["component"]
            for r in connected_components_star(df).collect()
        }
        assert a == b, f"trial {trial}: {a} != {b}"


def test_star_contraction_handles_adversarial_diameter(spark):
    """A 200-edge path has diameter 200: min-label propagation needs ~200
    rounds (it moves labels one hop per round), while star contraction
    halves component height per round pair — 12 rounds must suffice. This
    is the documented reason the variant exists (SCALE.md dedup tier)."""
    from spotify_etl_pipeline_spark.operators.components import (
        connected_components_star,
    )

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "src long, dst long"
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components_star(path, max_iter=12).collect()
    }
    assert len(comp) == 201
    assert set(comp.values()) == {0}


def test_star_contraction_self_loops_and_empty(spark):
    from spotify_etl_pipeline_spark.operators.components import (
        connected_components_star,
    )

    # self-loops only: every node is its own singleton component
    loops = spark.createDataFrame([(3, 3), (9, 9)], "src long, dst long")
    comp = {
        r["node"]: r["component"]
        for r in connected_components_star(loops).collect()
    }
    assert comp == {3: 3, 9: 9}
    # empty edge set: converged at entry, no nodes, no rounds
    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components_star(empty).collect() == []
