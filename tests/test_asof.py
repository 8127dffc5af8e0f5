"""Unit tests for the sort-based as-of join operator (operators/asof.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00")),  # after r2 → matches v=20
            (2, "k1", _ts("2024-01-01 08:30:00")),  # between r1,r2 → v=10
            (3, "k1", _ts("2024-01-01 07:00:00")),  # before any right → no match
            (4, "k2", _ts("2024-01-01 09:00:00")),  # equal ts → at-or-before matches
            (5, "k3", _ts("2024-01-01 09:00:00")),  # key with no right rows
        ],
        "id long, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01 08:00:00"), 10.0, 100),
            ("k1", _ts("2024-01-01 09:00:00"), 20.0, 101),
            ("k2", _ts("2024-01-01 09:00:00"), 30.0, 102),
            ("k2", _ts("2024-01-01 09:00:00"), 40.0, 103),  # tie on (k2, ts)
        ],
        "k string, rts timestamp, v double, seq int",
    )
    return left, right


def test_inner_asof_matches_latest_at_or_before(spark):
    left, right = _fixture(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_values=["v"], tiebreak="seq", how="inner",
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    # id 3 (before all rights) and id 5 (key without rights) are dropped;
    # id 4 ties on ts → at-or-before includes it, tiebreak picks seq=103.
    assert got == {1: 20.0, 2: 10.0, 4: 40.0}


def test_left_asof_keeps_unmatched_rows(spark):
    left, right = _fixture(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_values=["v"], tiebreak="seq", how="left",
    )
    rows = {r["id"]: r["v"] for r in out.collect()}
    assert rows[3] is None and rows[5] is None
    assert len(rows) == 5


def test_asof_plans_single_shuffle(spark):
    """The whole join must cost ONE exchange (on the key) — that's the
    point of the union+window formulation."""
    left, right = _fixture(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_values=["v"], how="inner",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
