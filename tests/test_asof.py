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


def test_forward_asof_matches_earliest_at_or_after(spark):
    left, right = _fixture(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_values=["v"], tiebreak="seq", how="inner",
        direction="forward",
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    # id 1 (10:00) has no right row at-or-after; id 2 (08:30) → 09:00 v=20;
    # id 3 (07:00) → 08:00 v=10; id 4 ties at 09:00 → tiebreak picks
    # seq=103 (sorting last wins, same rule as backward); id 5: no rights.
    assert got == {2: 20.0, 3: 10.0, 4: 40.0}


def test_asof_tolerance_drops_distant_matches(spark):
    left, right = _fixture(spark)
    # backward with 30-minute tolerance: id 1 (10:00 ← 09:00, 60 min) is
    # now out of range; id 2 (08:30 ← 08:00, 30 min) is exactly at it.
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_values=["v"], tiebreak="seq", how="left",
        tolerance=30 * 60 * 1_000_000,
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == {1: None, 2: 10.0, 3: None, 4: 40.0, 5: None}


def test_forward_asof_still_single_shuffle(spark):
    left, right = _fixture(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_values=["v"], how="inner", direction="forward",
        tolerance=3_600_000_000,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_zero_tolerance_is_exact_ts_match(spark):
    left, right = _fixture(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_values=["v"], tiebreak="seq", how="inner", tolerance=0,
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    # only id 4 has a right row at exactly its timestamp (ties → seq 103)
    assert got == {4: 40.0}
