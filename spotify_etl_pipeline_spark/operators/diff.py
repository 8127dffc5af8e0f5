"""Snapshot reconciliation: keyed diff of two table versions.

The migration/backfill companion tool: after replaying a pipeline, or
before swapping a gold-table pointer (streaming/pipeline.py's
snapshot-and-flip), you want the exact delta between old and new —
added / removed keys and changed rows with the columns that changed.

Shape: ONE full-outer join on the primary key with null-safe struct
comparison — no per-column re-scans, no driver-side row loops. At scale
this is the same single co-partitioned shuffle a MERGE costs (bucket both
snapshots by the key and even that exchange disappears); the change-column
detection is a narrow map over the joined row. Unchanged rows are dropped
as early as possible so the output is O(|delta|), not O(|table|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk: str,
    compare_cols: list[str],
) -> DataFrame:
    """(pk, change_type ∈ {added, removed, changed}, changed_cols) —
    keys present only in ``new`` are ``added``, only in ``old`` are
    ``removed``, present in both with any null-safe difference in
    ``compare_cols`` are ``changed`` (with the offending column names
    comma-joined, in ``compare_cols`` order). Identical rows are absent
    from the output."""
    o = old.select(
        F.col(pk), *[F.col(c).alias(f"_o_{c}") for c in compare_cols]
    ).withColumn("_in_old", F.lit(True))
    n = new.select(
        F.col(pk), *[F.col(c).alias(f"_n_{c}") for c in compare_cols]
    ).withColumn("_in_new", F.lit(True))
    joined = o.join(n, pk, "full_outer")
    changed_cols = F.array_join(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        ),
        ",",
    )
    change_type = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(changed_cols != "", "changed")
    )
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .withColumn(
            "changed_cols",
            F.when(F.col("change_type") == "changed", changed_cols).otherwise(
                F.lit("")
            ),
        )
        .select(pk, "change_type", "changed_cols")
    )
