"""Streaming benchmark decontamination behind the Bloom prefilter.

The online half of ``operators.bloom``: the m-bit position set is built
OFFLINE from the benchmark suite (an artifact, same deployment shape as
the frozen LM in :mod:`.curation_stream`) and broadcast into every
micro-batch; arriving documents are dropped if ANY of their n-gram
shingles is bloom-positive. Bloom FPs only over-drop (conservative — the
asymmetry decontamination wants); misses are impossible, so a document
admitted by the stream is guaranteed clean.

A document's verdict depends only on its own text and the frozen bit
set, so batching cannot change any outcome — stream output over a finite
ordered input (availableNow) equals the batch filter by construction,
and the equivalence is asserted in tests against
``operators.bloom.bloom_contamination``'s per-doc counts.

Exactly-once: epoch-keyed overwrite per micro-batch (the idempotency
scheme shared by dedup_index.py / curation_stream.py) — a replayed epoch
rewrites its own partition instead of duplicating output.

Per-batch cost: one narrow shingle explode + one broadcast join + one
per-doc aggregation — O(batch), nothing stateful, no shuffle wider than
the per-doc count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloom import bloom_positive_shingles
from ..operators.dedup import doc_shingles
from ..schemas import DOCUMENTS_SCHEMA


def flag_bloom_contaminated(
    docs: DataFrame, bits: DataFrame, n: int = 5
) -> DataFrame:
    """Per-document bloom verdict against a prebuilt bit table: returns
    (doc_id, n_bloom) for documents with ≥1 bloom-positive shingle.
    Membership itself is :func:`..operators.bloom.bloom_positive_shingles`
    (one definition, so stream and batch cannot drift)."""
    probe = doc_shingles(docs, n=n)
    return (
        bloom_positive_shingles(probe, bits)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bloom"))
    )


def run_decontam_stream(
    spark: SparkSession,
    docs_dir: str,
    out_path: str,
    checkpoint: str,
    bits: DataFrame,
    n: int = 5,
    max_files_per_trigger: int = 1,
) -> None:
    """Drive the decontamination stream to completion over current files,
    writing admitted (bloom-clean) documents epoch-partitioned."""

    def step(batch: DataFrame, epoch: int) -> None:
        flagged = flag_bloom_contaminated(batch, bits, n=n).select("doc_id")
        clean = batch.join(flagged, "doc_id", "left_anti")
        clean.write.mode("overwrite").parquet(f"{out_path}/epoch={epoch}")

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
