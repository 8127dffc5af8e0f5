"""UDTF extension point: lateral-join fan-out equals the built-in pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.functions.udtf_demo import register_udtfs
from spotify_etl_pipeline_spark.schemas import load_fixture


def test_chunk_udtf_matches_builtin_explode(spark, sf_dir):
    register_udtfs(spark)
    docs = load_fixture(spark, sf_dir, "documents").limit(50)
    docs.createOrReplaceTempView("docs_for_udtf")

    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_words
        FROM docs_for_udtf d,
             LATERAL chunk_document(d.text, 10) c
        """
    )

    toks = F.split("text", " ")
    n_chunks = F.ceil(F.size(toks) / 10).cast("int")
    via_builtin = (
        docs.select(
            "doc_id",
            toks.alias("toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.slice("toks", F.col("chunk_idx") * 10 + 1, 10).alias("piece"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join("piece", " ").alias("chunk"),
            F.size("piece").alias("n_words"),
        )
    )
    diff = (
        via_udtf.exceptAll(via_builtin).count()
        + via_builtin.exceptAll(via_udtf).count()
    )
    assert diff == 0
    assert via_udtf.count() > 50  # real fan-out happened
