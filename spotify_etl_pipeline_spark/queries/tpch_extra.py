"""TPC-H-shaped SQL surface, second tranche (SURVEY.md §2 P2/J1/J2/A4/O1):
q6/q9/q14/q15/q16/q17/q19/q21 adapted to the fixture's columns (no
partsupp table; no shipmode/commit/receipt dates — each query keeps the
canonical plan SHAPE and swaps unavailable columns for present ones).

Scale notes follow the house rules: predicates stated before joins so they
push to scans, no broadcast hints on tables that grow with SF (AQE decides),
explicit hints only on fixed-cardinality dims (nation), deterministic
tie-breaks on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_fixture
from .catalog import register


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    survey="P2,A1,F8",
    doc="TPC-H Q6 shape (forecasting revenue change): pure scan-filter-"
    "aggregate with range predicates on three columns — every predicate "
    "reaches the parquet scan (PushedFilters), no join, no shuffle beyond "
    "the final single-row agg. The canary query for pushdown health.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_fixture(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q9_nation_year_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS amount
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    survey="J1,A4,P2,F3",
    doc="TPC-H Q9 shape (product-type profit, sans partsupp): LIKE-filtered "
    "part dim joined into lineitem with supplier→nation context, revenue "
    "by (nation, year). The substring filter prunes part BEFORE the join; "
    "nation (25 rows) broadcast-hinted, part/supplier AQE-governed.",
)
def q9_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_fixture(spark, sf_dir, "lineitem")
    p = load_fixture(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_fixture(spark, sf_dir, "supplier")
    n = load_fixture(spark, sf_dir, "nation")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("amount")
        )
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           ROUND(SUM(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END), 2) AS promo_revenue,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY ship_month
    """,
    survey="J1,A4,F4",
    doc="TPC-H Q14 shape (promotion effect): conditional aggregation over "
    "a part-typed join, by ship month. Promo and total revenue are emitted "
    "as separate 2dp sums rather than the classic 100*a/b ratio — a "
    "float-division ratio can land on a half-ulp rounding boundary where "
    "the engines' round() rules diverge, while the two sums compare "
    "stably; the ratio is one client-side division away.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_fixture(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    p = load_fixture(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0)), 2
            ).alias("promo_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    ),
    ranked AS (
      SELECT supplier_no, total_revenue,
             MAX(total_revenue) OVER () AS max_rev
      FROM revenue
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN ranked ON s_suppkey = supplier_no
    WHERE total_revenue = max_rev
    """,
    survey="J1,A2,A4,W1",
    doc="TPC-H Q15 shape (top supplier): a quarterly revenue view whose "
    "maximum gates the final join. The max is an unpartitioned window "
    "over the ALREADY-AGGREGATED view — supplier-count-sized input, so "
    "the global window is harmless at any scale — rather than a second "
    "independent aggregation of lineitem: one evaluation of the float "
    "sums serves both sides of the equality, so partial-agg ordering "
    "cannot produce a max that matches no row.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_fixture(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    ranked = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    )
    s = load_fixture(spark, sf_dir, "supplier")
    return (
        s.join(ranked, s.s_suppkey == ranked.supplier_no)
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p_brand, p_type, p_size
    """,
    survey="J1,A4,X6",
    doc="TPC-H Q16 shape (supplier counts per part attribute; lineitem "
    "stands in for the absent partsupp relation): negated equality, "
    "NOT LIKE, and IN-list predicates on the dim side — all pushed before "
    "the join — then COUNT(DISTINCT supplier) per (brand, type, size). "
    "Distinct-within-group is a two-phase hash aggregate, no global sort.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_fixture(spark, sf_dir, "lineitem")
    p = load_fixture(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT COUNT(*) AS n_small_lineitems,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
    survey="J1,A3,A4",
    doc="TPC-H Q17 shape (small-quantity orders): correlated scalar "
    "subquery — each lineitem compares against half the average quantity "
    "of ITS part. Spark side decorrelates by hand: per-part averages are "
    "one hash aggregate, re-joined on partkey (AQE broadcasts the "
    "aggregate when small). Quantities are small integers in doubles, so "
    "the average is exact and the threshold comparison is cross-engine "
    "deterministic.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_fixture(spark, sf_dir, "lineitem")
    p = load_fixture(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_small_lineitems"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_matches
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    survey="J1,P2,A4",
    doc="TPC-H Q19 shape (disjunctive predicates spanning the join): three "
    "OR'd conjunct groups mixing part attributes with lineitem quantity. "
    "Catalyst keeps the equi-join key and evaluates the disjunction as a "
    "post-join filter, while the single-side implications it can extract "
    "(brand IN (...), size <= 35, quantity <= 30) still push to the "
    "scans — the textbook case for predicate-inference testing.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_fixture(spark, sf_dir, "lineitem")
    p = load_fixture(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_matches"),
        )
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    survey="J1,J2,A4,O1",
    doc="TPC-H Q21 shape (suppliers who kept orders waiting; returnflag "
    "stands in for the absent receipt/commit dates): the sole-blame "
    "pattern — EXISTS another supplier on the order, NOT EXISTS another "
    "supplier who ALSO returned — i.e. a semi-join and an anti-join "
    "against the same fact table with a <> correlation, then a "
    "deterministic top-20. Both correlated joins key on l_orderkey, so "
    "they shuffle on the same column as the orders join and AQE can reuse "
    "the exchange.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_fixture(spark, sf_dir, "supplier")
    li = load_fixture(spark, sf_dir, "lineitem")
    o = load_fixture(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    blamed = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        blamed.join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
