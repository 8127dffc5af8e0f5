"""Tests for explicit shuffle-management tools: salting and bucketing.

Each proves (a) results identical to the naive formulation and (b) the
plan property that motivates the tool (key split n_salt ways; zero
Exchange on a bucketed join).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.skew import salted_count_sum, salted_join
from spotify_etl_pipeline_spark.schemas import load_fixture
from spotify_etl_pipeline_spark.sources.bucketed import read_table, write_bucketed


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_fixture(spark, sf_dir, "lineitem")
    salted = salted_count_sum(
        li, keys=["l_returnflag"], sum_col="l_quantity",
        unique_col="l_orderkey", n_salt=16,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("total")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_fixture(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        load_fixture(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    salted = salted_join(li, o, key="l_orderkey", unique_col="l_quantity", n_salt=8)
    plain = li.join(o, "l_orderkey")
    assert salted.count() == plain.count()
    diff = salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
    assert diff == 0


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Both sides bucketed by the join key ⇒ SortMergeJoin with ZERO
    shuffle exchanges — the co-located layout repeated fact-fact joins
    want at 100 TB."""
    li = load_fixture(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_fixture(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", str(tmp_path / "li"), "l_orderkey", n_buckets=4)
    write_bucketed(o, "o_b", str(tmp_path / "o"), "o_orderkey", n_buckets=4)
    try:
        joined = read_table(spark, "li_b").join(
            read_table(spark, "o_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # disable broadcast so the join strategy is the bucket-aware SMJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == li.join(
            o, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_widen_narrow_scan_widens_single_partition(spark):
    from spotify_etl_pipeline_spark.operators.skew import widen_narrow_scan

    narrow = spark.range(1000).coalesce(1)
    widened = widen_narrow_scan(narrow)
    target = spark.sparkContext.defaultParallelism
    assert widened.rdd.getNumPartitions() == target
    assert widened.count() == 1000


def test_widen_narrow_scan_noop_when_already_wide(spark):
    from spotify_etl_pipeline_spark.operators.skew import widen_narrow_scan

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(target + 4)
    # already at/above parallelism: no extra exchange is inserted
    assert widen_narrow_scan(wide) is wide
