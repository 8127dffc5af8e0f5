"""Streaming packed-batch maintenance — the online half of the
tokenize→pack capstone (``operators.packing.pack_token_ids``).

Packing is the one artifact in this repo whose rows are NOT independent
per document: a document's placement depends on the cumulative token
count of everything before it in its (group, shard) stream.  The
epoch-keyed scheme still works because the dependency is a SINGLE
NUMBER per packing group — the stream's running token offset:

- each micro-batch encodes its documents with the FROZEN tokenizer
  merge table (the ``bpe_encode_ids`` artifact — the exact analogue of
  frozen PQ codebooks), reads the bounded per-epoch offsets store
  (|groups| rows per epoch), and packs its documents CONTINUING each
  group's stream where prior epochs ended;
- the batch's PARTIAL sequence rows land under ``parts/epoch=<n>`` and
  its per-group token counts under ``counts/epoch=<n>`` — both
  epoch-keyed, so a replay overwrites itself, and the replayed batch's
  base offsets come from the counts of OTHER epochs only (the same
  as-of-batch-start read as ``dedup_index._existing_sigs``);
- a sequence that straddles a batch boundary exists as partial rows in
  two (or more) epochs; serving stitches them with one groupBy on the
  sequence id, ordering partials by their first global position.

Contract: streamed serve == the one-shot ``pack_token_ids`` over the
same documents under the same frozen merges, PROVIDED each group's
documents arrive in ``doc_id`` order across epochs (a doc_id-range file
split — the natural ingest layout; arrival order IS the stream order,
exactly like any log-structured packing run).  Asserted in tests,
including a forced epoch replay of both artifacts.

At 100 TB: per-trigger cost is O(batch) encode + pack (the batch's own
token stream, keyed by sequence id) + a |groups|-row counts write; the
offsets read is |groups|·epochs rows, broadcastable; nothing rescans
prior epochs' documents or tokens.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import _pack_positions, _token_positions
from ..operators.text import bpe_encode_ids
from ..schemas import DOCUMENTS_SCHEMA


def _base_offsets(
    spark: SparkSession,
    counts_path: str,
    group_col: str,
    exclude_epoch: int | None = None,
) -> DataFrame | None:
    from .stores import store_has_epochs

    if not store_has_epochs(spark, counts_path):
        return None
    # drop any stale file-listing cache: this READ happens inside the
    # stream that WROTE the previous epoch's counts moments ago (the
    # shared store-reader rule — see cms_stream.read_merged_sketch)
    spark.catalog.refreshByPath(counts_path)
    df = spark.read.parquet(counts_path)
    if exclude_epoch is not None:
        df = df.filter(F.col("epoch") != exclude_epoch)
    return df.groupBy(group_col, "shard").agg(
        F.sum("cnt").cast("long").alias("base")
    )


def run_packing_stream(
    spark: SparkSession,
    docs_dir: str,
    merges: DataFrame,
    out_path: str,
    checkpoint: str,
    budget: int,
    n_shards: int = 4,
    group_col: str = "lang",
    max_files_per_trigger: int = 1,
) -> None:
    """Drive the packing stream over current files: per micro-batch,
    encode with the frozen ``merges``, continue each (group, shard)
    stream at its stored offset, and write partial sequence rows +
    per-group token counts under ``epoch=<n>``."""
    frozen = merges.collect()  # bounded: the k-rule tokenizer artifact
    schema = merges.schema

    def step(batch: DataFrame, epoch: int) -> None:
        sess = batch.sparkSession
        mdf = sess.createDataFrame(frozen, schema)
        encoded = bpe_encode_ids(batch, merges=mdf)
        base = _base_offsets(
            sess, f"{out_path}/counts", group_col, exclude_epoch=epoch
        )
        toks = _token_positions(
            encoded, batch, n_shards, group_col, "doc_id",
            base_offsets=base,
        )
        parts = _pack_positions(toks, budget, group_col, with_min_gpos=True)
        parts.write.mode("overwrite").parquet(f"{out_path}/parts/epoch={epoch}")
        counts = (
            encoded.join(batch.select("doc_id", group_col), "doc_id")
            .select(
                group_col,
                F.pmod(F.col("doc_id"), F.lit(int(n_shards))).alias("shard"),
                "n_tokens",
            )
            .groupBy(group_col, "shard")
            .agg(F.sum("n_tokens").cast("long").alias("cnt"))
        )
        counts.write.mode("overwrite").parquet(
            f"{out_path}/counts/epoch={epoch}"
        )

    q = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
        .writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_packed_batches(
    spark: SparkSession, out_path: str, group_col: str = "lang"
) -> DataFrame:
    """The SERVING view: stitch partial sequence rows from all epochs
    back into whole sequences — one groupBy on (group, shard, seq_id),
    partials ordered by their first global position (contiguous,
    non-overlapping by construction).  Output schema matches
    ``pack_token_ids`` exactly."""
    spark.catalog.refreshByPath(f"{out_path}/parts")
    parts = spark.read.parquet(f"{out_path}/parts")
    stitched = lambda field, sep: F.array_join(  # noqa: E731
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("min_gpos", F.col(field).alias("v")))
            ),
            lambda x: x["v"],
        ),
        sep,
    )
    return parts.groupBy(group_col, "shard", "seq_id").agg(
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        stitched("token_ids", " ").alias("token_ids"),
        stitched("doc_mask", "").alias("doc_mask"),
    )
