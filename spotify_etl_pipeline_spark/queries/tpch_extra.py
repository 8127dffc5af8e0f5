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
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(rev_cents / 100.0, 2) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE rev_cents = (SELECT MAX(rev_cents) FROM revenue)
    """,
    survey="J1,A2,A4,W1",
    doc="TPC-H Q15 shape (top supplier): a quarterly revenue view whose "
    "maximum gates the final join. The max is a SCALAR aggregate attached "
    "by a 1-row broadcast — not an unpartitioned window, which would "
    "funnel the whole revenue view through one WindowExec partition on a "
    "large supplier dimension. The scalar-agg plan evaluates the revenue "
    "view twice (once for the max, once for the rows), which is safe "
    "because revenue is summed in integer CENTS — addition-order-"
    "independent, so both evaluations are bit-identical regardless of "
    "partial-agg scheduling (the hazard that forced the original "
    "single-evaluation window shape with float sums).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_fixture(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
        ).alias("rev_cents")
    )
    max_rev = revenue.agg(F.max("rev_cents").alias("max_cents"))
    s = load_fixture(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(max_rev))
        .filter(F.col("rev_cents") == F.col("max_cents"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_cents") / 100.0, 2).alias("total_revenue"),
        )
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


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
      SELECT l_partkey, l_suppkey, unit_cost, s_acctbal, s_name, n_name
      FROM cost
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    ),
    best AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost
      FROM eligible GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           ROUND(e.unit_cost, 2) AS unit_cost
    FROM eligible e
    JOIN best ON best.l_partkey = e.l_partkey AND e.unit_cost = best.min_cost
    JOIN part ON p_partkey = e.l_partkey
    WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    survey="J1,A4,O1",
    doc="TPC-H Q2 shape (minimum-cost supplier; lineitem unit prices stand "
    "in for the absent partsupp.ps_supplycost): the correlated-MIN "
    "subquery decorrelated into a per-part MIN aggregate joined back on "
    "(partkey, cost = min) in SQL, and into a PARTITIONED window min on "
    "the Spark side — the window evaluates the eligible set once (the "
    "groupBy-min join-back would recompute the whole lineitem aggregate "
    "for both sides of the self-join), shuffles once on partkey, and is "
    "scale-safe because it partitions by a high-cardinality key. Unit "
    "cost is MIN(extendedprice/quantity) — MIN of identical IEEE "
    "divisions is order-independent on both engines, so the equality "
    "filter is cross-engine deterministic (an AVG here would be "
    "partial-agg-order-dependent and flaky). Region filter prunes "
    "eligible suppliers BEFORE the per-part minimum so the min is taken "
    "over the same set the final join sees; nation/region are "
    "fixed-cardinality broadcasts, everything else AQE-governed.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_fixture(spark, sf_dir, "lineitem")
    s = load_fixture(spark, sf_dir, "supplier")
    n = load_fixture(spark, sf_dir, "nation")
    r = load_fixture(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_fixture(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eligible = (
        cost.join(s, cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "l_suppkey", "unit_cost", "s_acctbal", "s_name", "n_name")
    )
    best = eligible.withColumn(
        "min_cost", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("unit_cost") == F.col("min_cost"))
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("unit_cost", 2).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH scoped AS (
      SELECT l_partkey,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'ASIA'
    ),
    per_part AS (
      SELECT l_partkey AS p_key, SUM(cents) AS value_cents
      FROM scoped GROUP BY l_partkey
    ),
    stats AS (
      SELECT SUM(value_cents) AS total_cents, COUNT(*) AS n_parts
      FROM per_part
    )
    SELECT p_key AS l_partkey,
           ROUND(value_cents / 100.0, 2) AS part_value
    FROM per_part, stats
    WHERE value_cents * n_parts > 2 * total_cents
    ORDER BY part_value DESC, l_partkey
    """,
    survey="J1,A2,A4",
    doc="TPC-H Q11 shape (important stock): per-part value within one "
    "region's suppliers, kept only when it exceeds a multiple of the "
    "GLOBAL mean per-part value — the scalar-subquery-in-HAVING pattern, "
    "expressed as a single-row aggregate cross-joined against the "
    "per-part aggregate (Spark broadcasts the one-row side). The "
    "threshold is scale-free (``value * n_parts > 2 * total``) because "
    "part cardinality grows with SF, so a fixed fraction like TPC-H's "
    "0.0001/SF would select everything at small SF and nothing at large. "
    "Money is summed as integer cents and compared in exact BIGINT "
    "arithmetic, so the boundary cannot move with float partial-agg "
    "order on either engine; the scalar side aggregates per_part (not "
    "the base scan) so Spark reuses the grouped exchange.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_fixture(spark, sf_dir, "lineitem")
    s = load_fixture(spark, sf_dir, "supplier")
    n = load_fixture(spark, sf_dir, "nation")
    r = load_fixture(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    scoped = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "l_partkey",
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    per_part = scoped.groupBy("l_partkey").agg(F.sum("cents").alias("value_cents"))
    stats = per_part.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(stats))
        .filter(F.col("value_cents") * F.col("n_parts") > 2 * F.col("total_cents"))
        .select(
            "l_partkey",
            F.round(F.col("value_cents") / 100.0, 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@register(
    "q12_priority_by_returnflag",
    oracle="""
    -- CAST: SUM(INT) returns HUGEINT → float64 via pandas; Spark emits
    -- int64 and the driver hasher compares dtypes.
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    survey="J1,A4,F8",
    doc="TPC-H Q12 shape (shipping modes vs priority; returnflag stands in "
    "for the absent l_shipmode): orders⋈lineitem with a ship-date range "
    "pushed to the fact scan, then conditional counts splitting order "
    "priorities into urgent/other per mode. Counts are integers — "
    "deterministic under any aggregation order. The date filter lands in "
    "PushedFilters on the lineitem scan and prunes before the join.",
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_fixture(spark, sf_dir, "orders")
    li = load_fixture(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q20_excess_shipment_suppliers",
    oracle="""
    WITH red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    shipped AS (
      SELECT l_suppkey, l_partkey,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                       AND l_shipdate <  TIMESTAMP '1998-01-01'
                      THEN l_quantity ELSE 0 END) AS qty_1997,
             SUM(l_quantity) AS qty_total
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM red_parts)
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT l_suppkey FROM shipped WHERE qty_1997 * 2 > qty_total
      )
    ORDER BY s_name
    """,
    survey="J1,J2,A4",
    doc="TPC-H Q20 shape (excess-inventory suppliers; shipped quantity "
    "stands in for the absent ps_availqty): the doubly-nested IN becomes "
    "two semi-joins — lineitem semi-joined to the LIKE-filtered part "
    "list, then supplier semi-joined to (suppkey, partkey) groups whose "
    "1997 quantity exceeds half their all-time quantity. Both period and "
    "total quantities come out of ONE grouped pass (conditional agg), "
    "not two scans; quantities are small integers in doubles so the sums "
    "and the doubled comparison are exact on both engines.",
)
def q20_excess_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_fixture(spark, sf_dir, "lineitem")
    s = load_fixture(spark, sf_dir, "supplier")
    n = load_fixture(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    red = load_fixture(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    in_1997 = (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01"))) & (
        F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01"))
    )
    shipped = (
        li.join(red, li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_1997, F.col("l_quantity")).otherwise(0)).alias(
                "qty_1997"
            ),
            F.sum("l_quantity").alias("qty_total"),
        )
        .filter(F.col("qty_1997") * 2 > F.col("qty_total"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(shipped, s.s_suppkey == shipped.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
