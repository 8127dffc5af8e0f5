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
