"""Grouped-agg pandas UDF surface + incremental aggregate maintenance."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.etl.incremental import (
    agg_state,
    incremental_agg_merge,
)
from spotify_etl_pipeline_spark.functions.udaf_demo import (
    order_value_by_priority_udaf,
    weighted_mean_builtin,
)
from spotify_etl_pipeline_spark.schemas import load_fixture


def test_udaf_matches_builtin_formulation(spark, sf_dir):
    """The pandas grouped-agg UDF must produce exactly the built-in
    sum(x*w)/sum(w) values (same double arithmetic over the same groups;
    pandas sums in group order just like the single-partition agg)."""
    orders = load_fixture(spark, sf_dir, "orders").withColumn(
        "weight", (F.col("o_orderkey") % 5 + 1).cast("double")
    )
    via_udaf = {
        r["o_orderpriority"]: r["weighted_price"]
        for r in order_value_by_priority_udaf(orders).collect()
    }
    via_builtin = {
        r["o_orderpriority"]: r["weighted_price"]
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.round(
                weighted_mean_builtin("o_totalprice", "weight"), 2
            ).alias("weighted_price")
        )
        .collect()
    }
    assert set(via_udaf) == set(via_builtin)
    for k in via_builtin:
        assert abs(via_udaf[k] - via_builtin[k]) <= 0.01, (
            k, via_udaf[k], via_builtin[k],
        )


METRICS = {
    "n_items": ("count", "l_quantity"),
    "qty_total": ("sum", "l_quantity"),  # integral-valued → exact double sums
    "first_ship": ("min", "l_shipdate"),
    "last_ship": ("max", "l_shipdate"),
}


def test_incremental_agg_merge_equals_full_recompute(spark, sf_dir):
    """Merging per-batch partial aggregates must equal the one-shot
    aggregate over everything — for ANY batching (associativity), here
    three batches applied in sequence."""
    li = load_fixture(spark, sf_dir, "lineitem")
    keys = ["l_returnflag"]
    batches = [li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]
    state = agg_state(batches[0], keys, METRICS)
    for delta in batches[1:]:
        state = incremental_agg_merge(state, delta, keys, METRICS)
    full = agg_state(li, keys, METRICS)
    diff = state.exceptAll(full).count() + full.exceptAll(state).count()
    assert diff == 0


def test_incremental_agg_merge_new_group_appears(spark):
    """A delta introducing an unseen key must create its group row."""
    base = spark.createDataFrame([("a", 1.0)], "k string, x double")
    delta = spark.createDataFrame([("b", 2.0), ("b", 3.0)], "k string, x double")
    metrics = {"n": ("count", "x"), "total": ("sum", "x")}
    merged = incremental_agg_merge(
        agg_state(base, ["k"], metrics), delta, ["k"], metrics
    )
    got = {r["k"]: (r["n"], r["total"]) for r in merged.collect()}
    assert got == {"a": (1, 1.0), "b": (2, 5.0)}


def test_agg_state_rejects_non_reaggregable(spark):
    import pytest

    df = spark.createDataFrame([("a", 1.0)], "k string, x double")
    with pytest.raises(ValueError):
        agg_state(df, ["k"], {"bad": ("avg", "x")})
