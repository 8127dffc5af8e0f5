"""Incremental loading (reference README.md:51 'Only new/updated tracks
processed') — MERGE semantics without a table format (SURVEY.md J3).

Two modes:

- insert-only: ``left_anti`` against existing keys (new rows only);
- upsert: union + latest-wins window — the Delta/Iceberg MERGE emulation
  (SURVEY.md common-OLAP 'CDC/SCD2' pattern).

Scale: both shuffle once on the primary key. With the gold table bucketed by
the key (write_gold note), the existing side arrives pre-partitioned and
only the (small) increment shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def insert_only(increment: DataFrame, existing: DataFrame, pk: str) -> DataFrame:
    """Rows of ``increment`` whose key is not yet present."""
    return increment.join(existing.select(pk), pk, "left_anti")


def upsert(
    increment: DataFrame,
    existing: DataFrame,
    pk: str,
    version_col: str = "extracted_at",
) -> DataFrame:
    """Latest-wins merge of increment into existing (ties → increment wins).

    Equivalent to ``MERGE INTO existing USING increment ON pk WHEN MATCHED
    AND increment.version >= existing.version THEN UPDATE ... WHEN NOT
    MATCHED THEN INSERT``.
    """
    tagged_new = increment.select(existing.columns).withColumn(
        "_src", F.lit(1)
    )
    tagged_old = existing.withColumn("_src", F.lit(0))
    # full-struct tiebreak: two same-version rows on the same side must
    # resolve identically on every run (deterministic golden hashes)
    others = [c for c in existing.columns if c != pk]
    w = Window.partitionBy(pk).orderBy(
        F.desc(version_col), F.desc("_src"), F.desc(F.struct(*others))
    )
    return (
        tagged_old.unionByName(tagged_new)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


#: Re-aggregable metric specs for :func:`incremental_agg_merge` — each
#: metric keeps a partial state that merges associatively, so a 100 TB
#: aggregate table updates from a delta without touching history.
_MERGE_FNS = {
    "count": lambda c: F.sum(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
_INIT_FNS = {
    "count": lambda src: F.count(F.lit(1)),
    "sum": lambda src: F.sum(src),
    "min": lambda src: F.min(src),
    "max": lambda src: F.max(src),
}


def agg_state(df: DataFrame, keys: list[str], metrics: dict[str, tuple[str, str]]) -> DataFrame:
    """Partial-aggregate state table for ``df``: one row per key group,
    one column per metric. ``metrics`` maps output column → (fn, source
    column) with fn ∈ {count, sum, min, max} — the associatively
    re-aggregable set (avg = sum/count at read time; distinct counts need
    a sketch state, see approx_count_distinct).
    """
    aggs = []
    for out, (fn, src) in metrics.items():
        if fn not in _INIT_FNS:
            raise ValueError(f"non-re-aggregable metric fn: {fn}")
        aggs.append(_INIT_FNS[fn](src).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def incremental_agg_merge(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    metrics: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merge a delta batch into an aggregate state table WITHOUT
    re-reading history: aggregate the delta alone (:func:`agg_state`),
    union with the existing state, and re-reduce each metric with its
    merge function (count/sum merge by SUM, min by MIN, max by MAX).

    The incremental-view-maintenance pattern for append-only facts: cost
    is O(delta) + a shuffle whose key cardinality is the GROUP's, not the
    fact table's. Equivalence with a full recompute over base ∪ delta is
    asserted in tests/test_etl_golden.py — by construction it holds for
    any partition of the input into batches (associativity), so the same
    code path serves first load, daily increments, and backfills.
    """
    delta_state = agg_state(delta, keys, metrics)
    merges = []
    for out, (fn, _src) in metrics.items():
        merges.append(_MERGE_FNS[fn](out).alias(out))
    return state.unionByName(delta_state).groupBy(*keys).agg(*merges)


def scd2_apply(
    existing: DataFrame,
    increment: DataFrame,
    pk: str,
    attrs: list[str],
    effective_col: str = "effective_from",
    end_col: str = "effective_to",
    current_col: str = "is_current",
    version_col: str = "extracted_at",
) -> DataFrame:
    """Slowly-changing-dimension Type 2: keep history instead of overwriting.

    ``existing`` is an SCD2 table (one current row per key, closed rows
    carry ``effective_to``); ``increment`` is a fresh snapshot with
    ``version_col`` as its as-of timestamp. Changed or new keys get a new
    current row effective from the increment's version; the superseded
    current row is closed at that same instant. Unchanged keys pass
    through untouched — change detection compares the tracked ``attrs``
    null-safely.

    Scale: one shuffle on the key (the union + window), same exchange the
    plain upsert costs; history rows never move. This is the MERGE-free
    formulation of the Delta/Iceberg SCD2 recipe (reference README.md:51
    tracks only latest state; this keeps the full lineage the warehouse
    layer would want).
    """
    cur = existing.filter(F.col(current_col))
    hist = existing.filter(~F.col(current_col))

    # collapse the increment to one row per key (latest snapshot wins):
    # applying two snapshots of the same key in one batch would otherwise
    # open two "current" rows; struct tiebreak keeps equal-version
    # collapses deterministic
    w = Window.partitionBy(pk).orderBy(
        F.desc(version_col), F.desc(F.struct(*attrs))
    )
    inc = (
        increment.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            pk,
            *attrs,
            F.col(version_col).alias(effective_col),
        )
    )
    changed_or_new = inc.alias("n").join(
        cur.alias("c"), on=pk, how="left_outer"
    ).filter(
        F.col(f"c.{pk}").isNull()
        | ~F.struct(*[F.col(f"n.{a}") for a in attrs]).eqNullSafe(
            F.struct(*[F.col(f"c.{a}") for a in attrs])
        )
    )
    new_rows = changed_or_new.select(
        pk,
        *[F.col(f"n.{a}").alias(a) for a in attrs],
        F.col(f"n.{effective_col}").alias(effective_col),
        F.lit(None).cast("timestamp").alias(end_col),
        F.lit(True).alias(current_col),
    )
    closing_keys = changed_or_new.filter(F.col(f"c.{pk}").isNotNull()).select(
        F.col(pk), F.col(f"n.{effective_col}").alias("_close_at")
    )
    closed = (
        cur.join(closing_keys, pk, "left")
        .withColumn(
            current_col,
            F.when(F.col("_close_at").isNotNull(), F.lit(False)).otherwise(
                F.col(current_col)
            ),
        )
        .withColumn(
            end_col,
            F.when(F.col("_close_at").isNotNull(), F.col("_close_at")).otherwise(
                F.col(end_col)
            ),
        )
        .drop("_close_at")
    )
    return hist.unionByName(closed).unionByName(new_rows.select(hist.columns))
