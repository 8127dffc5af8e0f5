"""queries/stats_ops.py::lm_quality_buckets — CCNet-style per-language
quality tiers: exact ntile partitioning properties, head>tail ordering,
and the approx (percentile_approx cutoff) mode's tolerance against the
exact mode."""

from __future__ import annotations

from spotify_etl_pipeline_spark.queries.stats_ops import lm_quality_buckets


def _rows(df):
    return {
        (r["lang"], r["bucket"]): (r["n_docs"], r["sum_score_milli"])
        for r in df.collect()
    }


def test_exact_buckets_partition_each_lang(spark, sf_dir):
    got = _rows(lm_quality_buckets(spark, sf_dir, n_buckets=3))
    langs = {lang for lang, _ in got}
    for lang in langs:
        sizes = [got[(lang, b)][0] for b in (1, 2, 3) if (lang, b) in got]
        # ntile: equal division, earlier tiles take the remainder
        assert max(sizes) - min(sizes) <= 1


def test_head_bucket_scores_dominate_tail(spark, sf_dir):
    got = _rows(lm_quality_buckets(spark, sf_dir, n_buckets=3))
    for lang in {lang for lang, _ in got}:
        n1, s1 = got[(lang, 1)]
        n3, s3 = got[(lang, 3)]
        # bucket 1 holds the best-scoring docs -> higher mean milli-score
        assert s1 / n1 >= s3 / n3


def test_approx_mode_close_to_exact(spark, sf_dir):
    exact = _rows(lm_quality_buckets(spark, sf_dir, n_buckets=3))
    approx = _rows(lm_quality_buckets(spark, sf_dir, n_buckets=3, approx=True))
    # approx assigns by quantile-sketch cutoffs: same keys, bucket sizes
    # within boundary-tie slack of the exact tiers
    assert set(exact) == set(approx)
    for key, (n_exact, _) in exact.items():
        n_approx = approx[key][0]
        assert abs(n_approx - n_exact) <= max(3, 0.2 * n_exact)


# --- r13: the vectorized mapInArrow bigram kernel ---------------------------
def test_bigram_kernel_matches_explode_formulation(spark):
    """The Arrow kernel inside lm_score_per_doc must produce exactly the
    (doc_id, bg, k) rows of the r8 explode + groupBy formulation —
    including multi-byte codepoints, repeated bigrams, and 2-char docs
    (the filter boundary)."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.queries.stats_ops import lm_score_per_doc

    rows = [
        (1, "abab abz"),
        (2, "aa"),
        (3, "x"),  # dropped by the length >= 2 filter
        (4, ""),  # dropped
        (5, "héllo wörld héllo"),
        (6, "中文中文 mixed 中文"),
        (7, "AaBb"),  # lower() stays JVM-side
    ]
    src = spark.createDataFrame(rows, "doc_id long, text string")
    docs = src.filter(F.length("text") >= 2).select(
        "doc_id", F.lower(F.col("text")).alias("t")
    )
    expected = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(t) - 1),"
                    " i -> substring(t, i, 2))"
                )
            ).alias("bg"),
        )
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    got = lm_score_per_doc(src)  # end-to-end: scores over the kernel
    ref = (
        expected.join(
            expected.groupBy("bg").agg(F.sum("k").alias("c")),
            "bg",
        )
        .crossJoin(
            expected.groupBy("bg")
            .agg(F.sum("k").alias("c"))
            .agg(F.sum("c").cast("double").alias("tc"))
        )
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.round(
                F.sum(F.col("k") * F.log(F.col("c") / F.col("tc")))
                / F.sum("k"),
                4,
            ).alias("avg_logp"),
        )
    )
    assert sorted(got.collect()) == sorted(ref.collect())
    # and the weighted table itself, row for row
    from spotify_etl_pipeline_spark.queries.stats_ops import (
        _bigram_count_batches,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    kernel_rows = docs.mapInArrow(
        _bigram_count_batches,
        StructType(
            [
                docs.schema["doc_id"],
                StructField("bg", StringType(), False),
                StructField("k", LongType(), False),
            ]
        ),
    ).collect()
    assert sorted(map(tuple, kernel_rows)) == sorted(
        map(tuple, expected.collect())
    )
