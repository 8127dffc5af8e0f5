"""Bucketed tables: co-located, shuffle-free joins (SURVEY.md §4 scale notes).

At 100 TB the single biggest win on repeated fact-fact joins is not doing
the shuffle at all: write both sides bucketed (and sorted) by the join key
into the catalog, and Spark's bucketed scan lines partitions up so the join
plans with ZERO Exchange. This is the batch analogue of co-partitioned
stream-stream joins, and the layout incremental upserts want anyway
(ETL star.py's scale note: bucket tblSongs by song_id).

Plain ``parquet(path)`` writes cannot carry bucket metadata — bucketing
lives in the table catalog, hence ``saveAsTable`` with an explicit
``path`` option (external table: data stays where the caller chose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """External bucketed+sorted parquet table registered as ``table``."""
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
