"""The auto dials must not pay a sizing scan when the caller already
knows the size: ngram_jaccard_pairs(n_docs=), semdedup_dropped(
n_vectors=), recursive_order_chain(n_orders=) follow pq_topk_auto's
caller-supplied-metadata convention — zero Spark jobs at plan build —
and fall back to ONE bounded scalar count when absent.  Supplying the
size must also not change WHAT is planned/computed."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.dedup import (
    PREFIX_FILTER_AUTO_MIN_DOCS,
    ngram_jaccard_pairs,
    semdedup_dropped,
)
from spotify_etl_pipeline_spark.plans import jobs_triggered
from spotify_etl_pipeline_spark.schemas import load_fixture


def test_ngram_jaccard_auto_with_size_builds_jobless(spark, sf_dir):
    docs = load_fixture(spark, sf_dir, "documents")
    n_with, df_with = jobs_triggered(
        spark, lambda: ngram_jaccard_pairs(docs, prefix_filter="auto", n_docs=500)
    )
    assert n_with == 0, "caller-supplied n_docs must not trigger a sizing job"
    n_wo, df_wo = jobs_triggered(
        spark, lambda: ngram_jaccard_pairs(docs, prefix_filter="auto")
    )
    assert n_wo >= 1, "absent n_docs, the dial sizes from one count job"
    # same route chosen either way (fixture is below the crossover)
    assert sorted(df_with.columns) == sorted(df_wo.columns)
    assert df_with.exceptAll(df_wo).count() == 0


def test_ngram_jaccard_supplied_size_steers_the_route(spark, sf_dir):
    """n_docs is trusted: a size past the crossover plans the
    prefix-filtered route (identical rows by the PPJoin guarantee)."""
    docs = load_fixture(spark, sf_dir, "documents")
    plain = ngram_jaccard_pairs(docs, prefix_filter=False)
    routed = ngram_jaccard_pairs(
        docs, prefix_filter="auto", n_docs=PREFIX_FILTER_AUTO_MIN_DOCS + 1
    )
    assert plain.exceptAll(routed).count() == 0
    assert routed.exceptAll(plain).count() == 0


def test_semdedup_auto_with_size_skips_the_sizing_job(spark, sf_dir):
    emb = load_fixture(spark, sf_dir, "embeddings")
    n = emb.count()
    n_with, _ = jobs_triggered(
        spark,
        lambda: semdedup_dropped(emb, n_centroids="auto", n_vectors=n),
    )
    n_wo, _ = jobs_triggered(
        spark, lambda: semdedup_dropped(emb, n_centroids="auto")
    )
    # (an AQE count() can span several Spark jobs, so assert the saving,
    # not an exact delta; the centroid-init collect is common to both)
    assert n_with < n_wo, (
        f"supplying n_vectors must save the sizing scan "
        f"(with={n_with}, without={n_wo})"
    )


def test_semdedup_supplied_size_matches_counted(spark, sf_dir):
    emb = load_fixture(spark, sf_dir, "embeddings")
    n = emb.count()
    a = semdedup_dropped(emb, n_centroids="auto", n_vectors=n)
    b = semdedup_dropped(emb, n_centroids="auto")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_recursive_chain_with_size_builds_jobless(spark, sf_dir):
    from spotify_etl_pipeline_spark.queries.sql_surface import (
        _view,
        recursive_order_chain,
    )

    o = _view(spark, sf_dir, "orders", "dialtest")
    n = spark.table(o).count()
    n_jobs, df = jobs_triggered(
        spark, lambda: recursive_order_chain(spark, o, n_orders=n)
    )
    assert n_jobs == 0, "caller-supplied n_orders must not trigger a count"
    # the guard still armed correctly: the walk executes
    assert df.count() > 0
    n_wo, _ = jobs_triggered(spark, lambda: recursive_order_chain(spark, o))
    assert n_wo >= 1
