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
    w = Window.partitionBy(pk).orderBy(F.desc(version_col), F.desc("_src"))
    return (
        tagged_old.unionByName(tagged_new)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
