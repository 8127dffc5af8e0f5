"""Skew mitigation: salted aggregation and salted broadcast-replicated join.

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the explicit
fallback for the two cases AQE cannot fix:

- **hot-key aggregation**: one key holding 10% of a 100 TB fact table makes
  one reducer process 10 TB regardless of partition splitting, because all
  rows of a key must meet. Salting splits the KEY itself: aggregate on
  (key, salt) first (parallel partials), then re-aggregate on key — the
  second stage sees n_salt rows per key, not billions.
- **hot-key join against a small side**: replicate the small side across
  all salt values and join on (key, salt) — each hot key's rows spread over
  n_salt tasks.

Salts are deterministic (hash of a caller-named unique column, mod n_salt)
so results are reproducible and testable — never ``rand()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def widen_narrow_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism — but ONLY
    when the current plan has fewer partitions.

    The inverse of skew: a *narrow* scan. A small parquet table arrives as
    one or two file splits, and any per-row-expensive stage evaluated before
    the first shuffle (LSH signatures, shingle explosion, pairwise cosines
    after a broadcast join) then serializes on one core no matter how many
    the session has. At warehouse scale file scans already exceed
    ``defaultParallelism``, so this is a no-op exactly when the shuffle it
    would add is the thing that doesn't scale; below it, one round-robin
    exchange of a small input unlocks every core for the compute-bound map.
    """
    try:
        # JVM-side physical-plan probe, no job: toRdd() is the InternalRow
        # RDD, so unlike df.rdd there is no Python Row-serializer layer to
        # build per call. Spark Connect has no _jdf/sparkContext API, so
        # there we skip widening rather than fail five operators
        target = df.sparkSession.sparkContext.defaultParallelism
        narrow = (
            df._jdf.queryExecution().toRdd().getNumPartitions() < target
        )
    except Exception:
        return df
    return df.repartition(target) if narrow else df


def with_salt(df: DataFrame, unique_col: str, n_salt: int) -> DataFrame:
    """Deterministic salt in [0, n_salt) from a unique column's hash."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salt)).cast("int")
    )


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    sum_col: str,
    unique_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(count, sum) in two salted stages.

    Stage 1 shuffles on (keys, salt) — hot keys split n_salt ways; stage 2
    shuffles n_salt rows per key. Both aggregates are algebraic, so
    partial-merge is exact.
    """
    partial = (
        with_salt(df, unique_col, n_salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(sum_col).alias("_s"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n"), F.sum("_s").alias("total")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a small side on ``key``, spreading each hot
    key across ``n_salt`` tasks by replicating the small side per salt.

    Only inner/left are supported: replication would emit every unmatched
    small-side row once per salt under right/full outer semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} "
            "(outer-preserving the replicated side would duplicate rows)"
        )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    b = with_salt(big, unique_col, n_salt)
    out = b.join(small_rep, [key, "_salt"], how)
    return out.drop("_salt")
