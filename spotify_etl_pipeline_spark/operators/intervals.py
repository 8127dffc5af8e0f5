"""Interval overlap join (temporal extension of the range-join family).

``queries/advanced_joins.events_range_pair_join`` handles POINT×window
proximity; this operator handles INTERVAL×INTERVAL overlap — ad exposure
vs session windows, maintenance windows vs incidents, any two sets of
[start, end] spans. Spark has no native interval join, and the naive
formulation (inequality-only join condition) plans a nested-loop cross
product — the classic scale-killer.

The blocked plan: quantize time into buckets of width ≥ the maximum
interval length, register each interval under every bucket it touches
(≤ 2 when width == max length), equi-join on bucket, then apply the exact
overlap predicate. An interval pair can co-occur in two buckets, so the
join would emit duplicates; rather than a DISTINCT over the whole result
(an extra shuffle carrying every pair), each pair is counted ONLY in the
bucket containing ``greatest(a.start, b.start)`` — every overlapping pair
has exactly one such bucket, so the dedup is a free filter. This is the
standard interval-bucketing scheme documented for Spark range joins
(e.g. Databricks' range-join bin optimization) implemented in plain
DataFrame ops.

Cost at scale: shuffle keyed on bucket; pairs only form inside a bucket,
so candidate volume is sum over buckets of |A_bucket|·|B_bucket| — bounded
by temporal density, never |A|·|B|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucketed(df: DataFrame, width_sec: int, side: str) -> DataFrame:
    """Explode each interval to the (≤2 distinct) buckets it touches.
    Expects columns (id, start_us, end_us); emits (id, start_us, end_us,
    bucket) prefixed with ``side``."""
    w_us = width_sec * 1_000_000
    # `div`, never a double quotient: epoch-µs magnitudes push double
    # division within an ulp of integer boundaries, where cast-truncate
    # lands in the wrong bucket (the same integer-exactness rule as
    # schemas.normalize_events_ts)
    return df.select(
        F.col("id").alias(f"{side}_id"),
        F.col("start_us").alias(f"{side}_start"),
        F.col("end_us").alias(f"{side}_end"),
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"start_us div {w_us}"),
                    F.expr(f"end_us div {w_us}"),
                )
            )
        ).alias("bucket"),
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    max_len_sec: int,
) -> DataFrame:
    """Overlapping pairs between interval sets ``a`` and ``b`` (columns:
    id, start_us, end_us; start ≤ end; length ≤ ``max_len_sec``).

    Returns (a_id, b_id, overlap_sec) — overlap_sec is the integer floor
    of the overlap duration, ≥ 0 (touching endpoints count as overlap 0).
    """
    av = _bucketed(a, max_len_sec, "a")
    bv = _bucketed(b, max_len_sec, "b")
    w_us = max_len_sec * 1_000_000
    later_start = F.greatest(F.col("a_start"), F.col("b_start"))
    return (
        av.join(bv, "bucket")
        # exact overlap predicate (closed intervals)
        .filter(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
        )
        # count each pair only in the bucket that owns the later start
        .filter(
            F.expr(f"greatest(a_start, b_start) div {w_us}") == F.col("bucket")
        )
        .select(
            "a_id",
            "b_id",
            (
                (F.least(F.col("a_end"), F.col("b_end")) - later_start)
            ).alias("_ov_us"),
        )
        .select(
            "a_id", "b_id", F.expr("_ov_us div 1000000").alias("overlap_sec")
        )
    )
