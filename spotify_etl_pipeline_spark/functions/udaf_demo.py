"""Grouped-aggregate pandas UDF (Arrow-vectorized UDAF) — API-surface demo.

Completes the §2.9 extension-point matrix: scalar pandas_udf
(operators/similarity historic path), grouped-map (operators/multimodal
mapInPandas), UDTF (functions/udtf_demo), and — here — the grouped
AGGREGATE form: a custom reduction Spark's built-ins don't ship, executed
per group over Arrow batches.

Same production rule as the UDTF demo: this exists to prove the extension
point, and the test asserts it equals the built-in sum(x*w)/sum(w)
formulation — which is what you actually deploy (stays in codegen, gets
partial aggregation; the pandas UDF evaluates whole groups in Python and
cannot map-side combine).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def make_weighted_mean_udaf():
    """Build the grouped-agg pandas UDF. Constructed lazily — the
    ``pandas_udf`` decorator parses its DDL return type against the
    active session, so a module-level decoration would require a
    SparkSession at import time."""

    @pandas_udf("double")
    def weighted_mean(value: pd.Series, weight: pd.Series) -> float:
        denom = weight.sum()
        if denom == 0:
            return float("nan")
        return float((value * weight).sum() / denom)

    return weighted_mean


def weighted_mean_builtin(value: str, weight: str):
    """The built-in-expression twin: identical math, full codegen +
    map-side partial aggregation — the production path."""
    return F.sum(F.col(value) * F.col(weight)) / F.sum(weight)


def order_value_by_priority_udaf(orders: DataFrame) -> DataFrame:
    """Weight-normalized mean order price per priority via the pandas
    UDAF (one Arrow batch per group, no partial aggregation — see module
    docstring for why the built-in twin is the production path)."""
    weighted_mean = make_weighted_mean_udaf()
    return orders.groupBy("o_orderpriority").agg(
        F.round(
            weighted_mean("o_totalprice", "weight"), 2
        ).alias("weighted_price")
    )
