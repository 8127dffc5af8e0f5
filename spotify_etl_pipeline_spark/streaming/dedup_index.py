"""Streaming near-dup index maintenance: the LSH index as a live artifact.

Composes the file-source incremental pipeline (pipeline.py) with the
vocabulary-free incremental LSH (operators/dedup.py): each arriving batch
of documents computes ONLY its own signatures, joins its buckets against
the stored index for cross-batch candidates, finds within-batch
candidates, then appends its signatures to the index — per-batch cost
O(batch), never O(corpus). Checkpointing makes the whole thing
exactly-once: a replayed file neither duplicates signatures nor emits its
pairs twice.

Over a finite input with ``Trigger.AvailableNow`` the union of all emitted
pairs equals a full-corpus LSH recompute (asserted in tests) — every pair
is discovered by whichever of its two documents arrives second.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.dedup import MINHASH_A, lsh_candidates_incremental
from ..schemas import DOCUMENTS_SCHEMA

_SIG_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType())]
    + [T.StructField(f"h{i}", T.LongType()) for i in range(len(MINHASH_A))]
)

#: Schema of a dedup-index tombstone feed file: document ids to delete.
DOC_TOMBSTONE_SCHEMA = T.StructType([T.StructField("doc_id", T.LongType())])


def read_documents_stream(
    spark: SparkSession, directory: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(directory)
    )


def _existing_sigs(
    spark: SparkSession, index_path: str, exclude_epoch: int | None = None
) -> DataFrame:
    from pyspark.sql import functions as F

    from .stores import store_has_epochs

    if store_has_epochs(spark, index_path):
        # drop any stale file-listing cache a writer session holds (the
        # shared store-reader rule — see cms_stream.read_merged_sketch)
        spark.catalog.refreshByPath(index_path)
        df = spark.read.parquet(index_path)
        if exclude_epoch is not None:
            df = df.filter(F.col("epoch") != exclude_epoch)
        return df.drop("epoch")
    return spark.createDataFrame([], _SIG_SCHEMA)


def run_dedup_index_stream(
    spark: SparkSession,
    docs_dir: str,
    index_path: str,
    pairs_path: str,
    checkpoint: str,
    n: int = 3,
) -> None:
    """Drive the incremental index to completion over current files."""

    def step(batch: DataFrame, epoch: int) -> None:
        # foreachBatch is at-least-once: writes are keyed by epoch and
        # overwritten in place, so a replayed batch re-produces its own
        # partition instead of appending duplicate signatures/pairs.
        # Replays also re-join against an index that may already contain
        # this epoch's signatures — _existing_sigs drops them first so the
        # join sees the index as-of batch start.
        sess = batch.sparkSession
        existing = _existing_sigs(sess, index_path, exclude_epoch=epoch)
        new_sigs, pairs = lsh_candidates_incremental(existing, batch, n)
        pairs.write.mode("overwrite").parquet(f"{pairs_path}/epoch={epoch}")
        new_sigs.write.mode("overwrite").parquet(f"{index_path}/epoch={epoch}")

    q = (
        read_documents_stream(spark, docs_dir)
        .writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_dedup_delete_stream(
    spark: SparkSession,
    deletes_dir: str,
    out_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
) -> None:
    """TOMBSTONE feed for the signature index — the dedup twin of
    ``pq_index_stream.run_pq_delete_stream``: each micro-batch of
    delete requests (``doc_id`` rows — retired/redacted documents)
    lands under ``epoch=<n>`` with the shared epoch-keyed exactly-once
    scheme.  Serving scrubs via
    ``operators.dedup.lsh_index_apply_tombstones`` (see
    :func:`read_index`); ids are idempotent under replays and
    re-deletes, unknown ids are no-ops."""

    def step(batch: DataFrame, epoch: int) -> None:
        batch.select("doc_id").write.mode("overwrite").parquet(
            f"{out_path}/epoch={epoch}"
        )

    q = (
        spark.readStream.schema(DOC_TOMBSTONE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(deletes_dir)
        .writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_index(
    spark: SparkSession, index_path: str, tombstones_path: str | None = None
) -> DataFrame:
    """The SERVING view of the signature index: union of the epoch
    partitions, scrubbed against the tombstone feed when one exists —
    what incremental appends and candidate generation should join
    against so retired documents stop producing pairs."""
    from ..operators.dedup import lsh_index_apply_tombstones

    sigs = _existing_sigs(spark, index_path)
    if tombstones_path is None:
        return sigs
    # same guard as _existing_sigs: a delete feed configured before the
    # first delete epoch arrives serves the index unscrubbed, not a raise
    from .stores import store_has_epochs

    if not store_has_epochs(spark, tombstones_path):
        return sigs
    spark.catalog.refreshByPath(tombstones_path)
    dead = spark.read.parquet(tombstones_path).select("doc_id").distinct()
    return lsh_index_apply_tombstones(sigs, dead)
