"""operators/ml.py — batch-GD logistic regression invariants."""

from __future__ import annotations

import math

import pytest

from spotify_etl_pipeline_spark.operators.ml import logistic_fit


def test_separable_data_gets_correct_signs(spark):
    # y=1 iff x1 large: weight on x1 must come out positive
    rows = [(1.0, 2.0 + 0.1 * i) for i in range(20)] + [
        (0.0, -2.0 - 0.1 * i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "y double, x1 double")
    w = logistic_fit(df, ["x1"], "y", iterations=10, lr=0.5)
    assert w[1] > 0.5
    assert all(math.isfinite(x) for x in w)


def test_zero_iterations_rejected_and_empty_input(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "y double, x1 double")
    with pytest.raises(ValueError):
        logistic_fit(df, ["x1"], "y", iterations=0)
    with pytest.raises(ValueError):
        logistic_fit(df.filter("y > 5"), ["x1"], "y")


def test_balanced_symmetric_data_keeps_zero_bias(spark):
    # perfectly symmetric classes: bias stays ~0, slope positive
    rows = [(1.0, 1.0), (0.0, -1.0), (1.0, 2.0), (0.0, -2.0)]
    df = spark.createDataFrame(rows, "y double, x1 double")
    w = logistic_fit(df, ["x1"], "y", iterations=5, lr=0.5)
    assert abs(w[0]) < 1e-12
    assert w[1] > 0
