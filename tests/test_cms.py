"""operators/cms.py — count-min sketch guarantees: no undercount ever,
bounded overcount, and SUM-mergeability (the property that makes it the
distributed/streaming frequency sketch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.cms import (
    count_min_build,
    count_min_estimate,
)
from spotify_etl_pipeline_spark.schemas import load_fixture

D, W = 4, 1024


def _words(spark, sf_dir):
    return (
        load_fixture(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
    )


def test_cms_never_undercounts_and_overcount_bounded(spark, sf_dir):
    words = _words(spark, sf_dir)
    n_total = words.count()
    sketch = count_min_build(words, "w", d=D, w=W)
    true_counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("tn"))
    est = count_min_estimate(sketch, true_counts.select("w"), "w", d=D, w=W)
    joined = {
        r["w"]: (r["tn"], r["cms_n"])
        for r in true_counts.join(est, "w").collect()
    }
    assert joined
    slack = max(10, (3 * n_total) // W)  # ~e*N/w expected overcount
    for tn, cn in joined.values():
        assert cn >= tn  # the hard guarantee
        assert cn <= tn + slack  # the probabilistic one, generous


def test_cms_is_sum_mergeable(spark, sf_dir):
    words = _words(spark, sf_dir)
    a = words.filter(F.length("w") % 2 == 0)
    b = words.filter(F.length("w") % 2 != 0)
    merged = (
        count_min_build(a, "w", d=D, w=W)
        .unionByName(count_min_build(b, "w", d=D, w=W))
        .groupBy("row", "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    whole = count_min_build(words, "w", d=D, w=W)
    as_set = lambda df: {  # noqa: E731
        (r["row"], r["bucket"], r["n"]) for r in df.collect()
    }
    assert as_set(merged) == as_set(whole)


def test_cms_estimate_zero_for_absent_key(spark):
    items = spark.createDataFrame([("x",)] * 3 + [("y",)], ["w"])
    sketch = count_min_build(items, "w", d=D, w=W)
    probes = spark.createDataFrame([("x",), ("never-seen",)], ["w"])
    got = {
        r["w"]: r["cms_n"]
        for r in count_min_estimate(sketch, probes, "w", d=D, w=W).collect()
    }
    assert got["x"] >= 3
    # an absent key can only collide upward, but with 4 rows over 1024
    # buckets and 2 live keys the min row is empty -> exact zero
    assert got["never-seen"] == 0
