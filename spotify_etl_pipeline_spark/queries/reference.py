"""Reference-parity analytics queries (SURVEY.md §2.3-2.6, §B3).

The reference's authoritative query surface is the inline Snowflake SQL at
reference README.md:206-255: row-count health check, freshness, pipeline
latency, top-10-by-popularity star join, and album-type distribution with a
percent-of-total window. Here each is re-expressed Spark-first and transposed
onto the driver's TPC-H-ish fixtures (the Spotify-domain versions run in the
golden ETL tests over the star schema — see tests/test_etl_golden.py).

Scale notes (100 TB design):
- The star joins carry NO explicit broadcast hints on customer/part/supplier:
  those tables grow linearly with scale factor, so a forced hint would OOM
  executors at warehouse SF. The session's autoBroadcastJoinThreshold + AQE
  pick broadcast at small SF and sort-merge at large SF automatically; only
  fixed-cardinality dims (nation=25, region=5 rows) ever get explicit hints.
- Top-k uses orderBy+limit which Spark plans as TakeOrderedAndProject —
  per-partition heaps + driver merge, no global sort/exchange.
- The ungrouped aggregates are partial+final HashAggregates — a few bytes per
  partition cross the wire regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.scalar import minutes_between
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..schemas import load_fixture

    return load_fixture(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Flagship: revenue top-10 — scan→join→agg→sort→limit through one pipe.
# Shape of reference README.md:234-244 (top-10 songs by popularity via
# fact⋈dim⋈dim) on lineitem⋈orders⋈customer.
# --------------------------------------------------------------------------
@register(
    "flagship_top_revenue",
    oracle="""
    SELECT c.c_custkey,
           c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount)) DESC, c.c_custkey
    LIMIT 10
    """,
    survey="J1,W2,O1,A4",
    doc="Top-10 customers by discounted revenue (reference README.md:234-244 shape).",
)
def flagship_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(revenue.alias("_rev"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("_rev"), F.asc("c_custkey"))
        .limit(10)
        .select("c_custkey", "c_name", F.round("_rev", 2).alias("revenue"), "n_items")
    )


# --------------------------------------------------------------------------
# A1/O2: UNION ALL row-count health check (reference README.md:206-212).
# --------------------------------------------------------------------------
@register(
    "health_rowcounts",
    oracle="""
    SELECT 'orders' AS tbl, COUNT(*) AS n FROM orders
    UNION ALL SELECT 'lineitem' AS tbl, COUNT(*) AS n FROM lineitem
    UNION ALL SELECT 'customer' AS tbl, COUNT(*) AS n FROM customer
    """,
    survey="A1,O2",
    doc="Per-table row counts stacked with UNION ALL (reference README.md:206-212).",
)
def health_rowcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    def one(name: str) -> DataFrame:
        return (
            _t(spark, sf_dir, name)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(name).alias("tbl"), "n")
        )

    return one("orders").unionByName(one("lineitem")).unionByName(one("customer"))


# --------------------------------------------------------------------------
# A2: ungrouped MAX freshness (reference README.md:215 — MAX(loaded_at)).
# --------------------------------------------------------------------------
@register(
    "freshness_latest_ship",
    oracle="""
    SELECT strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S') AS latest_ship
    FROM lineitem
    """,
    survey="A2,F4",
    doc="MAX(loaded_at)-style freshness probe (reference README.md:215).",
)
def freshness_latest_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("latest_ship")
    )


# --------------------------------------------------------------------------
# A3/F6/F7: AVG(TIMESTAMPDIFF(MINUTE, a, b)) over a trailing window
# (reference README.md:221-226). Trailing-7-days is anchored to a fixed date
# for determinism (tests parameterize time, never wall-clock — SURVEY.md §5.4).
# --------------------------------------------------------------------------
@register(
    "pipeline_latency_minutes",
    oracle="""
    SELECT ROUND(AVG(CAST(FLOOR((epoch(l.l_shipdate) - epoch(o.o_orderdate)) / 60) AS BIGINT)), 2)
           AS avg_latency_min,
           COUNT(*) AS n
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '2001-07-25' - INTERVAL 7 DAY
    """,
    survey="A3,F6,F7,J1",
    doc="Average order→ship latency in minutes over a trailing 7-day window "
    "(reference README.md:221-226).",
)
def pipeline_latency_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2001-07-25")) - F.expr("INTERVAL 7 DAY")
    )
    lat = minutes_between(F.col("o_orderdate"), F.col("l_shipdate"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .agg(
            F.round(F.avg(lat), 2).alias("avg_latency_min"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# A4/W1: GROUP BY count + percent-of-total via unpartitioned window
# (reference README.md:249-255 — album_type distribution).
# --------------------------------------------------------------------------
@register(
    "order_priority_distribution",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 2) AS pct
    FROM orders
    GROUP BY o_orderpriority
    """,
    survey="A4,W1,F8,F9",
    doc="Category distribution with percent-of-total window "
    "(reference README.md:249-255).",
)
def order_priority_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    # Percent-of-total as a 1-row ungrouped agg + broadcast attach (the
    # stats_ops lm-score idiom) instead of an unpartitioned window: same
    # values (SUM(COUNT(*)) OVER () == the grand total), but no global
    # WindowExec — no single-partition sort, no "No Partition Defined"
    # warning, and the shape stays safe even if the group-key cardinality
    # ever stopped being tiny.
    total = counts.agg(F.sum("n_orders").alias("tot"))
    return counts.crossJoin(F.broadcast(total)).select(
        "o_orderpriority",
        "n_orders",
        F.round(F.col("n_orders") * 100.0 / F.col("tot"), 2).alias("pct"),
    )


# --------------------------------------------------------------------------
# J1/W2: star join with broadcast dims + deterministic top-10
# (reference README.md:240-244 — songs⋈artist⋈album ORDER BY popularity).
# --------------------------------------------------------------------------
@register(
    "star_join_top_items",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_name, s.s_name,
           ROUND(l.l_extendedprice, 2) AS price
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ORDER BY l.l_extendedprice DESC, l.l_orderkey, l.l_linenumber
    LIMIT 10
    """,
    survey="J1,W2,O1",
    doc="Fact⋈dim⋈dim broadcast star join, top-10 by measure "
    "(reference README.md:240-244).",
)
def star_join_top_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(10)
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_name",
            "s_name",
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q1 shape: wide multi-aggregate GROUP BY — the partial+final
# HashAggregate workhorse (SURVEY.md §7 Phase 2; bench headline).
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="A4,P2,F8",
    doc="TPC-H Q1-shaped pricing summary: 8 aggregates over 2 group keys.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2001-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
