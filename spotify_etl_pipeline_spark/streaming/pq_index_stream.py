"""Streaming IVFADC index maintenance — the online half of the
incremental PQ tier (``operators.pq.pq_encode_append``).

An append-maintained PQ index is epoch-trivial by the same argument as
the CMS stream (cms_stream.py): the stored artifact is a CODE TABLE
(id, cell, pq_codes), each appended micro-batch's codes depend only on
that batch's vectors and the FROZEN artifacts (codebooks + coarse
representatives), and the serving index is the plain union of epochs —
no per-key state store, no watermark, and a replayed epoch overwrites
its own partition instead of double-inserting (the epoch-keyed
exactly-once scheme shared by cms_stream.py / dedup_index.py /
decontam_stream.py).

Merged-stream == one-shot-batch-encode is asserted in tests, including
after a forced epoch replay; the served search over (base codes ∪
streamed codes) equals the batch incremental entry
(``knn_ivfadc_incremental_topk``) exactly.

At 100 TB / unbounded append streams: per-trigger cost is one C-row
broadcast probe + one narrow codebook-literal encode over the batch —
no base-corpus scan, no shuffle wider than the batch; the store grows
by |batch| rows per epoch and compaction is a plain rewrite (codes are
immutable rows, not aggregates) — implemented and serve-equality-tested
as ``streaming.compaction.compact_epoch_store``.

DELETES (the other half of maintenance, Faiss ``remove_ids``): a
tombstone id feed maintained by :func:`run_pq_delete_stream` under the
same epoch-keyed exactly-once scheme — replays overwrite their own
partition, and tombstones are idempotent anyway (the serve-time
anti-join in ``operators.pq.index_apply_tombstones`` distincts the ids,
so even a duplicated delete changes nothing).  Serving reads
``(base codes ∪ read_streamed_codes) ∖ read_tombstones``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.pq import pq_encode_append
from ..schemas import EMBEDDINGS_SCHEMA

#: Schema of a tombstone feed file: just the vector ids to delete.
TOMBSTONE_SCHEMA = T.StructType([T.StructField("vec_id", T.LongType())])


def run_pq_index_stream(
    spark: SparkSession,
    delta_dir: str,
    base_corpus: DataFrame,
    codebooks: list[list[list[float]]],
    out_path: str,
    checkpoint: str,
    cluster_col: str = "label",
    max_files_per_trigger: int = 1,
) -> None:
    """Drive the append-maintenance stream over current files: per
    micro-batch, assign the batch's vectors to the FROZEN coarse cells,
    encode with the FROZEN ``codebooks``, and write the code rows under
    ``epoch=<n>``.  ``base_corpus`` supplies the frozen representatives
    (C rows — the only base-derived input; at scale callers pass the
    stored representative table, not the corpus)."""

    def step(batch: DataFrame, epoch: int) -> None:
        codes = pq_encode_append(
            batch, base_corpus, codebooks, cluster_col=cluster_col
        )
        codes.write.mode("overwrite").parquet(f"{out_path}/epoch={epoch}")

    q = (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(delta_dir)
        .writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_streamed_codes(spark: SparkSession, out_path: str) -> DataFrame:
    """The streamed half of the serving index: union of the epoch code
    partitions, identical schema to ``pq_encode(..., keep_cols=(cell,))``
    — union it with the base build's code table and serve
    ``pq_ivfadc_topk(route_corpus=base)`` unchanged."""
    # drop any stale file-listing cache a writer session holds (see
    # cms_stream.read_merged_sketch — the shared store-reader rule)
    spark.catalog.refreshByPath(out_path)
    # whole-path mid-swap guard: the codes store IS a compaction
    # target (compact_index_with_tombstones), and a crashed swap
    # leaves some epochs dot-prefixed — a plain read would serve an
    # index silently missing vectors (code-review r12)
    from .stores import epoch_partitions

    epoch_partitions(spark, out_path)
    df = spark.read.parquet(out_path)
    return df.select([c for c in df.columns if c != "epoch"])


def run_pq_delete_stream(
    spark: SparkSession,
    deletes_dir: str,
    out_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drive the TOMBSTONE feed over current files: each micro-batch of
    delete requests (``vec_id`` rows) lands under ``epoch=<n>`` — the
    identical epoch-keyed exactly-once scheme as the code store, so a
    replayed batch overwrites its own partition.  Ids may reference
    vectors from ANY earlier code epoch or the base build (cross-epoch
    deletes are just ids; the anti-join doesn't care where the row
    lives), and unknown ids are harmless no-ops.  Per-trigger cost is a
    |batch|-row write; nothing is scanned."""

    def step(batch: DataFrame, epoch: int) -> None:
        batch.select("vec_id").write.mode("overwrite").parquet(
            f"{out_path}/epoch={epoch}"
        )

    q = (
        spark.readStream.schema(TOMBSTONE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(deletes_dir)
        .writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_tombstones(spark: SparkSession, out_path: str) -> DataFrame:
    """The merged tombstone set: distinct union of the epoch partitions
    (idempotent under replays AND re-deletes by construction).  Feed it
    to ``operators.pq.index_apply_tombstones`` at serve time.  A store
    with no delete epoch yet (feed configured, nothing deleted) reads
    as the empty set."""
    from .stores import store_has_epochs

    if not store_has_epochs(spark, out_path):
        return spark.createDataFrame([], TOMBSTONE_SCHEMA)
    spark.catalog.refreshByPath(out_path)
    df = spark.read.parquet(out_path)
    return df.select("vec_id").distinct()


def read_live_index(
    spark: SparkSession, codes_path: str, tombstones_path: str | None = None
) -> DataFrame:
    """The SERVING view of the code store (the dedup twin is
    ``dedup_index.read_index``): union of the epoch code partitions —
    including the ``epoch=-1`` base a bootstrap or compaction wrote —
    scrubbed against the tombstone feed when one exists.  Pass the
    result as ``corpus_codes`` to ``pq_ivfadc_topk(route_corpus=base)``
    and the serve is append- and delete-current."""
    from ..operators.pq import index_apply_tombstones

    codes = read_streamed_codes(spark, codes_path)
    if tombstones_path is None:
        return codes
    return index_apply_tombstones(codes, read_tombstones(spark, tombstones_path))
