"""Oracle-differential tests: every catalog query vs its DuckDB SQL.

This mirrors the driver's t2 correctness gate (row count + schema +
order-insensitive values) locally at sf0.001 so regressions surface before
the driver runs at sf0.01.
"""

from __future__ import annotations

import pytest

from spotify_etl_pipeline_spark.queries.catalog import CATALOG, full_catalog

from .oracle_compare import compare_results, frame_problems

# full catalog (incl. driver=False arms) — triggers module registration
ALL = {n: sp.fn for n, sp in full_catalog().items()}


@pytest.mark.parametrize("name", sorted(n for n in ALL if CATALOG[n].oracle))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = CATALOG[name]
    sdf = spec.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    spark_cols = list(spark_pdf.columns)
    spark_rows = [tuple(r) for r in spark_pdf.itertuples(index=False, name=None)]

    duck_pdf = duck.execute(spec.oracle).fetchdf()
    duck_cols = list(duck_pdf.columns)
    duck_rows = [tuple(r) for r in duck_pdf.itertuples(index=False, name=None)]

    # string-normalized value comparison + pandas-level dtype/hashability
    # checks (the driver hashes these exact frames — see oracle_compare)
    problems = compare_results(spark_cols, spark_rows, duck_cols, duck_rows)
    problems += frame_problems(spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(n for n in ALL if not CATALOG[n].oracle))
def test_rows_only_queries_run(name, spark, sf_dir):
    """Queries without an oracle must still execute and return rows."""
    df = CATALOG[name].fn(spark, sf_dir)
    assert df.count() >= 0


def test_approx_count_distinct_accuracy(spark, duck, sf_dir):
    """approx_count_distinct within 5% of the exact count (rsd=0.01)."""
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in ALL["approx_count_distinct"](spark, sf_dir).collect()
    }
    exact = dict(
        duck.execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_partkey) FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    for k, v in exact.items():
        assert abs(approx[k] - v) / max(v, 1) < 0.05, (k, approx[k], v)


def test_percentile_approx_accuracy(spark, duck, sf_dir):
    """percentile_approx close to the exact continuous quantile."""
    approx = {
        r["l_returnflag"]: r["approx_median_qty"]
        for r in ALL["percentile_approx"](spark, sf_dir).collect()
    }
    exact = dict(
        duck.execute(
            "SELECT l_returnflag, quantile_cont(l_quantity, 0.5) FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(0.05 * abs(v), 1.0), (k, approx[k], v)


def test_events_queries_survive_non_utc_session(spark, duck, sf_dir):
    """The driver calls load_fixture on a bare session it configured — a
    non-UTC JVM/session timezone must not shift NTZ-cast wall times (the
    oracle's timestamps are naive). load_fixture pins UTC itself; this
    pins the pin."""
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        # the window-truncating shapes are the TZ-sensitive ones: hour
        # buckets shift wholesale if the NTZ pin ever regresses
        for name in ("events_tumbling_hourly", "events_windowed_distinct_users"):
            spec = CATALOG[name]
            sdf = spec.fn(spark, sf_dir)  # load_fixture repins UTC in here
            spark_pdf = sdf.toPandas()
            duck_pdf = duck.execute(spec.oracle).fetchdf()
            problems = compare_results(
                list(spark_pdf.columns),
                [tuple(r) for r in spark_pdf.itertuples(index=False, name=None)],
                list(duck_pdf.columns),
                [tuple(r) for r in duck_pdf.itertuples(index=False, name=None)],
            )
            assert not problems, (name, problems)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_market_basket_matches_in_group_expansion(spark, sf_dir):
    """The catalog query and its DuckDB twin now share the a<b self-join
    formulation (the measured-faster plan), so the oracle no longer
    cross-checks the algebra — this test restores that power: the
    independent in-group pair expansion (sorted basket arrays + the dedup
    tier's pair expression) must produce the identical support table."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.dedup import _pair_expr
    from spotify_etl_pipeline_spark.schemas import load_fixture

    li = load_fixture(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.array_distinct(F.collect_list("l_partkey"))).alias(
            "parts"
        )
    )
    expansion = (
        baskets.select(
            F.explode(
                F.expr(_pair_expr("parts", "x AS part_a, y AS part_b"))
            ).alias("p")
        )
        .select("p.*")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )
    got = [tuple(r) for r in ALL["market_basket_pairs"](spark, sf_dir).collect()]
    want = [tuple(r) for r in expansion.collect()]
    assert got == want
