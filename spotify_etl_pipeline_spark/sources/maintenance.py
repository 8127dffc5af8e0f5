"""Table maintenance: small-file compaction and clustered layouts.

The background chores every 100 TB parquet lake needs:

- **compact** — streaming/incremental ingest produces files sized by
  trigger cadence, not by optimal scan granularity; thousands of KB-files
  make listing + footer reads dominate scan time. Compaction rewrites a
  table at a target file size (row-count estimated from the existing
  files' average row width).
- **write_range_clustered** — repartitionByRange + sortWithinPartitions on
  a filter column gives each output file a tight, near-disjoint min/max
  range for that column, so parquet row-group statistics let scans skip
  whole files (the layout half of predicate pushdown: the filter
  reaches the scan either way, but only a clustered layout makes the
  scan skip).
- **write_zorder_clustered** — the two-dimensional upgrade: Morton
  bit-interleave of two columns' bucket ranks, so predicates on EITHER
  column skip files (measured in tests: both dimensions skip where the
  1-D layout skips on only one).
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


def _morton_interleave(xb, yb, bits: int):
    """Bit-interleave two bucket ranks into one Morton (Z-order) key.

    ``xb``/``yb`` are integer columns in [0, 2^bits). Even bit positions
    take x's bits, odd take y's; disjoint positions mean the per-bit adds
    can never carry, so + is bitwise OR here.
    """
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def write_zorder_clustered(
    df: DataFrame,
    out_path: str,
    col_x: str,
    col_y: str,
    n_files: int,
    bits: int = 8,
) -> None:
    """Two-dimensional Z-order (Morton curve) clustered layout.

    ``write_range_clustered`` gives ONE column tight per-file ranges; a
    filter on any other column still reads every file. Interleaving the
    bit-ranks of two columns puts rows close in BOTH dimensions into the
    same files, so parquet min/max statistics skip files for predicates
    on either column (at ~sqrt the single-dim tightness each — the
    classic Z-order trade). Ranks are min/max-scaled bucket ids
    (2 scalar aggregates, one pass); the Morton key is pure bit
    arithmetic in whole-stage codegen, and the write is the same
    repartitionByRange + sortWithinPartitions shape as the 1-D layout —
    nothing here is local-mode-specific.
    """
    from pyspark.sql import functions as F

    nb = 1 << bits
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).collect()[0]
    span_x = max(float(hi_x) - float(lo_x), 1e-300)
    span_y = max(float(hi_y) - float(lo_y), 1e-300)
    xb = F.least(
        F.floor((F.col(col_x) - F.lit(float(lo_x))) / F.lit(span_x) * nb),
        F.lit(nb - 1),
    ).cast("long")
    yb = F.least(
        F.floor((F.col(col_y) - F.lit(float(lo_y))) / F.lit(span_y) * nb),
        F.lit(nb - 1),
    ).cast("long")
    (
        df.withColumn("_zkey", _morton_interleave(xb, yb, bits))
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def export_packed_shards(
    packed: DataFrame, out_path: str, group_col: str = "lang"
) -> None:
    """Materialize packed training batches (operators/packing.py::
    pack_token_ids output) in the layout a training data loader mounts:
    parquet partitioned by ``(group, shard)``, ONE file per leaf, rows
    in ``seq_id`` order — the physical twin of the
    ``packed_shard_manifest`` reader contract (the manifest's
    n_sequences/n_tokens/checksum describe exactly one file each).

    Same mechanics as :func:`export_training_shards`: repartition on
    the leaf key so each (group, shard) lands in one task, and lead the
    within-task sort with the leaf columns (two leaves can hash into
    the same task; the writer's inserted partition-column sort is not
    guaranteed stable) so seq_id order is what actually lands in each
    file.  At warehouse scale raise the packer's ``n_shards`` so a
    shard fits a task — the manifest and the layout scale together.
    """
    from pyspark.sql import functions as F

    (
        packed.repartition(F.col(group_col), F.col("shard"))
        .sortWithinPartitions(group_col, "shard", "seq_id")
        .write.partitionBy(group_col, "shard")
        .mode("overwrite")
        .parquet(out_path)
    )
