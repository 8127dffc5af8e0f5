"""Table maintenance: small-file compaction and range-clustered layout.

The two background chores every 100 TB parquet lake needs:

- **compact** — streaming/incremental ingest produces files sized by
  trigger cadence, not by optimal scan granularity; thousands of KB-files
  make listing + footer reads dominate scan time. Compaction rewrites a
  table at a target file size (row-count estimated from the existing
  files' average row width).
- **write_range_clustered** — repartitionByRange + sortWithinPartitions on
  a filter column gives each output file a tight, near-disjoint min/max
  range for that column, so parquet row-group statistics let scans skip
  whole files (poor man's Z-order for one dimension — the layout half of
  predicate pushdown: the filter reaches the scan either way, but only a
  clustered layout makes the scan skip).
"""

from __future__ import annotations

import math
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_rows_per_file: int | None = None,
    target_file_mb: int = 128,
) -> int:
    """Rewrite ``path`` into ``out_path`` with ~target-sized files.

    Returns the number of output files. Row target derives from the
    source's average bytes/row when not given explicitly. Writes to a NEW
    path (swap via rename/pointer outside) — never overwrite in place
    without a transactional table format.
    """
    df = spark.read.parquet(path)
    n_rows = df.count()
    if n_rows == 0:
        df.repartition(1).write.mode("overwrite").parquet(out_path)
        return 1
    if target_rows_per_file is None:
        src_bytes = sum(
            f.stat().st_size for f in Path(path).rglob("*.parquet")
        )
        bytes_per_row = max(src_bytes / n_rows, 1.0)
        target_rows_per_file = max(int(target_file_mb * 1024 * 1024 / bytes_per_row), 1)
    n_files = max(math.ceil(n_rows / target_rows_per_file), 1)
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def write_range_clustered(
    df: DataFrame, out_path: str, cluster_col: str, n_files: int
) -> None:
    """Range-partitioned, sorted-within-file layout on ``cluster_col``."""
    (
        df.repartitionByRange(n_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(out_path)
    )


def export_training_shards(
    docs: DataFrame,
    out_path: str,
    n_shards: int = 8,
    seed: int = 0,
) -> None:
    """Materialize a training-ready corpus layout: parquet partitioned by
    ``split=train|valid|test`` and ``shard=k``, one file per leaf, rows in
    shuffled order.

    Composes the deterministic operators into the physical layout a
    training job actually mounts: the 80/10/10 split keyed on the content
    fingerprint (re-ingest-stable, leak-proof — same formula as the
    dataset_split query), the :func:`..operators.packing.seeded_shuffle`
    permutation for within-shard order, and a ``repartition(split, shard)``
    so each (split, shard) combination lands in exactly one task — hence
    exactly one parquet file per leaf directory, which is what sharded
    data loaders address. The within-task sort leads with (split, shard):
    two leaves can hash into the SAME task, and the parquet writer's own
    inserted sort on partition columns is not guaranteed stable, so
    ordering by leaf first (satisfying the writer's requirement outright)
    then ``pos_in_shard`` is what actually bakes the shuffle order into
    each file.

    At warehouse scale raise ``n_shards`` so a shard fits a task; the
    repartition is the only shuffle beyond the operators' own.
    """
    from pyspark.sql import functions as F

    from ..operators.packing import seeded_shuffle
    from ..operators.text import fingerprint_expr

    bucket = fingerprint_expr() % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    placed = seeded_shuffle(docs, n_shards=n_shards, seed=seed)
    (
        docs.withColumn("split", split)
        .join(placed, "doc_id")
        .repartition(F.col("split"), F.col("shard"))
        .sortWithinPartitions("split", "shard", "pos_in_shard")
        .write.partitionBy("split", "shard")
        .mode("overwrite")
        .parquet(out_path)
    )
