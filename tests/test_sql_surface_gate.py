"""The recursive-CTE row-limit gate: sql_recursive_order_chain re-arms
Spark's cteRecursionRowLimit guard proportional to its input (the walk
emits each order exactly once, so COUNT(orders) bounds total recursion
rows) instead of eating the fixed 1M default at scale."""

from __future__ import annotations

from spotify_etl_pipeline_spark.queries.sql_surface import (
    sql_recursive_order_chain,
)
from spotify_etl_pipeline_spark.schemas import load_fixture

KEY = "spark.sql.cteRecursionRowLimit"


def test_recursive_cte_guard_scales_with_input(spark, sf_dir):
    orig = spark.conf.get(KEY, "1000000")
    n_orders = load_fixture(spark, sf_dir, "orders").count()
    try:
        # strangle the guard below the input: without the gate the walk
        # aborts with RECURSION_ROW_LIMIT_EXCEEDED at <input> total rows
        spark.conf.set(KEY, "10")
        out = sql_recursive_order_chain(spark, sf_dir)
        assert out.count() == n_orders  # every order appears exactly once
        assert int(spark.conf.get(KEY)) >= 2 * n_orders
    finally:
        spark.conf.set(KEY, orig)


def test_recursive_cte_guard_is_monotonic(spark, sf_dir):
    """A caller-raised guard is never lowered — the gate only widens."""
    orig = spark.conf.get(KEY, "1000000")
    try:
        spark.conf.set(KEY, str(10**9))
        sql_recursive_order_chain(spark, sf_dir).count()
        assert int(spark.conf.get(KEY)) == 10**9
    finally:
        spark.conf.set(KEY, orig)
