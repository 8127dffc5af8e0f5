"""End-to-end streaming curation: quality-filter + exact-dedup as one
incremental pipeline (the online half of the corpus-curation capstone).

Composition per micro-batch (foreachBatch, exactly-once via epoch-keyed
overwrite — same idempotency scheme as dedup_index.py):

1. **LM quality filter** — score each arriving document against a STATIC
   char-bigram LM (trained offline, batch-side; passed in as a small
   DataFrame + total count). Offline-train / online-apply is the realistic
   deployment: the model is an artifact, the stream only does a broadcast
   join + per-doc aggregation. A document's score depends only on its own
   text and the frozen LM, so stream batching cannot change any verdict.
2. **Cross-batch exact dedup** — rolling-hash content fingerprints
   (operators/curation.content_fingerprint, the shared definition) checked
   against a stored fingerprint index; first arrival survives, replays
   re-produce their own epoch partition instead of duplicating.

Per-batch cost is O(batch) + a broadcast of the (alphabet^2)-row LM;
the fingerprint index grows by the batch's survivors only. Equivalence
over a finite ordered input (availableNow) against the batch twin —
score, filter, min-doc_id-per-fingerprint — is asserted in tests.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..operators.curation import content_fingerprint
from ..schemas import DOCUMENTS_SCHEMA

_FP_SCHEMA = T.StructType([T.StructField("fp", T.LongType())])


def train_char_lm(docs: DataFrame) -> tuple[DataFrame, float]:
    """Offline LM fit: corpus char-bigram counts + total (the model
    artifact the stream broadcasts). Same tokenization as the
    ``text_lm_score`` catalog query."""
    bg = (
        docs.filter(F.length("text") >= 2)
        .select(F.lower(F.col("text")).alias("t"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))"
                )
            ).alias("bg")
        )
    )
    lm = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    total = float(lm.agg(F.sum("c")).first()[0])
    return lm, total


def score_documents(docs: DataFrame, lm: DataFrame, total: float) -> DataFrame:
    """Mean bigram log-likelihood per document under the frozen LM.

    Unseen bigrams are ignored (inner join) — deterministic and
    batch-invariant; a document whose bigrams are ALL unseen drops out,
    which is the right verdict for text unlike the training corpus.
    """
    bg = (
        docs.filter(F.length("text") >= 2)
        .select("doc_id", F.lower(F.col("text")).alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))"
                )
            ).alias("bg"),
        )
    )
    scores = (
        bg.join(F.broadcast(lm), "bg")
        .groupBy("doc_id")
        .agg(F.avg(F.log(F.col("c") / F.lit(total))).alias("lm_logp"))
    )
    return docs.join(scores, "doc_id")


def _existing_fps(
    spark: SparkSession, seen_path: str, exclude_epoch: int | None = None
) -> DataFrame:
    from .stores import store_has_epochs

    if store_has_epochs(spark, seen_path):
        df = spark.read.parquet(seen_path)
        if exclude_epoch is not None:
            df = df.filter(F.col("epoch") != exclude_epoch)
        return df.drop("epoch")
    return spark.createDataFrame([], _FP_SCHEMA)


def run_curation_stream(
    spark: SparkSession,
    docs_dir: str,
    out_path: str,
    seen_path: str,
    checkpoint: str,
    lm: DataFrame,
    total: float,
    min_logp: float,
    max_files_per_trigger: int = 1,
) -> None:
    """Drive the curation stream to completion over current files."""

    def step(batch: DataFrame, epoch: int) -> None:
        sess = batch.sparkSession
        kept = score_documents(batch, lm, total).filter(
            F.col("lm_logp") >= min_logp
        )
        fp = kept.withColumn("fp", content_fingerprint())
        # within-batch first-arrival: lowest doc_id per fingerprint
        w = Window.partitionBy("fp").orderBy("doc_id")
        first = (
            fp.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        fresh = first.join(
            _existing_fps(sess, seen_path, exclude_epoch=epoch), "fp", "left_anti"
        )
        fresh.drop("fp").write.mode("overwrite").parquet(
            f"{out_path}/epoch={epoch}"
        )
        fresh.select("fp").write.mode("overwrite").parquet(
            f"{seen_path}/epoch={epoch}"
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
