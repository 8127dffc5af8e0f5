"""Core relational operator library (SURVEY.md §2.2-2.7 + X6/X7).

Each query exercises one operator family from the SURVEY inventory with a
DuckDB oracle. Implementation notes per query explain the physical plan we
expect (pushdown, broadcast, TakeOrderedAndProject, partial aggregation) —
the properties that keep the operator viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.scalar import parse_partial_date
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..schemas import load_fixture

    return load_fixture(spark, sf_dir, name)


# --- P1/P2: projection + predicate, both pushed to the parquet scan ---------
@register(
    "filter_pushdown_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_day
    FROM lineitem
    WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '2000-01-01'
    """,
    survey="P1,P2",
    doc="Projection+filter; .explain shows PushedFilters and a 4-column ReadSchema.",
)
def filter_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 45) & (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp")))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
        )
    )


# --- P4: NULL handling (na.fill / coalesce semantics) -----------------------
@register(
    "null_handling",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_prop,
           CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.k') AS INTEGER), 0))
                AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
    survey="P4,F10",
    doc="NULL-handling: coalesce defaults + null counting over JSON props "
    "(reference README.md:49 'NULL handling').",
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    missing = F.get_json_object("props", "$.missing")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(missing.isNull(), 1).otherwise(0)).alias("n_null_prop"),
        F.sum(F.coalesce(k, F.lit(0))).cast("bigint").alias("sum_k"),
    )


# --- J2/J3: semi / anti joins (EXISTS / NOT EXISTS) -------------------------
@register(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    survey="J2,J3",
    doc="left_semi join = EXISTS; validation/incremental pattern J2/J3.",
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "anti_join_inactive_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    survey="J2,J3",
    doc="left_anti join = NOT EXISTS; referential-integrity check shape "
    "(reference README.md:49). Predicate chosen so the result is non-empty "
    "at every SF (complement of the semi join above).",
)
def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --- A5: latest-wins dedup via row_number ----------------------------------
@register(
    "latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    survey="A5,J3",
    doc="Latest-wins dedup: row_number over pk ordered by recency "
    "(reference README.md:49 dedup + :51 incremental upsert).",
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        )
    )


# --- X1: exact dedup = SELECT DISTINCT -------------------------------------
@register(
    "dedup_exact_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    survey="A5,X1",
    doc="Exact dedup: dropDuplicates == SELECT DISTINCT (hash aggregate).",
)
def dedup_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").dropDuplicates()


# --- O2 extension: INTERSECT / EXCEPT set ops ------------------------------
@register(
    "setops_nation_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    survey="O2",
    doc="INTERSECT distinct-set semantics.",
)
def setops_nation_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setops_nation_except",
    oracle="""
    SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity > 49
    EXCEPT
    SELECT p_partkey AS partkey FROM part WHERE p_size > 10
    """,
    survey="O2",
    doc="EXCEPT distinct-set semantics over high-cardinality keys "
    "(non-empty at every SF).",
)
def setops_nation_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 49)
        .select(F.col("l_partkey").alias("partkey"))
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") > 10)
        .select(F.col("p_partkey").alias("partkey"))
    )
    # subtract == EXCEPT (set semantics); exceptAll would be EXCEPT ALL.
    return li.subtract(p)


# --- F1-F5: string scalar functions ----------------------------------------
@register(
    "scalar_string_functions",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS parsed_id,
           length(c_name) AS name_len,
           upper(c_mktsegment) AS seg_upper,
           concat('cust:', c_name) AS cust_uri
    FROM customer
    WHERE contains(c_name, 'Customer#')
    """,
    survey="F1,F2,F3,F5",
    doc="regexp_extract / length / contains / concat — the URL-parse family "
    "(reference lambda_function.py:83-92).",
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_name").contains("Customer#"))
        .select(
            "c_custkey",
            F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("bigint").alias("parsed_id"),
            F.length("c_name").alias("name_len"),
            F.upper("c_mktsegment").alias("seg_upper"),
            F.concat(F.lit("cust:"), F.col("c_name")).alias("cust_uri"),
        )
    )


# --- F6/F7/F8: date/time functions -----------------------------------------
@register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           datediff('day', o_orderdate, TIMESTAMP '2001-08-01') AS days_to_anchor
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-08-01' - INTERVAL 7 DAY
    """,
    survey="F4,F6,F7",
    doc="date_format / year / month / datediff / date_sub-style trailing filter "
    "(reference README.md:221-226).",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    anchor = F.lit("2001-08-01").cast("timestamp")
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= anchor - F.expr("INTERVAL 7 DAY"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.datediff(F.to_date(anchor), F.to_date("o_orderdate")).alias("days_to_anchor"),
        )
    )


# --- F10/X5: JSON extraction ------------------------------------------------
@register(
    "json_props_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    """,
    survey="F10,X5",
    doc="get_json_object over the events.props JSON column.",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", "event_type", k.alias("k"))
        .filter(F.col("k") > 50)
    )


# --- F12: partial-date normalization ---------------------------------------
@register(
    "partial_date_parse",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE CAST(o_orderkey % 3 AS INTEGER)
               WHEN 0 THEN strftime(o_orderdate, '%Y')
               WHEN 1 THEN strftime(o_orderdate, '%Y-%m')
               ELSE strftime(o_orderdate, '%Y-%m-%d')
             END AS release_date
      FROM orders
    )
    SELECT o_orderkey, release_date,
           strftime(COALESCE(try_strptime(release_date, '%Y-%m-%d'),
                             try_strptime(release_date, '%Y-%m'),
                             try_strptime(release_date, '%Y')), '%Y-%m-%d') AS parsed
    FROM raw
    """,
    survey="F12",
    doc="Partial release_date ('YYYY'|'YYYY-MM'|'YYYY-MM-DD') → DATE via "
    "multi-format coalesce (Spotify release_date semantics, SURVEY.md F12).",
)
def partial_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "yyyy"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "yyyy-MM"))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
        .alias("release_date"),
    )
    return raw.select(
        "o_orderkey",
        "release_date",
        F.date_format(parse_partial_date("release_date"), "yyyy-MM-dd").alias("parsed"),
    )


# --- extension W: ranking / lag / frames -----------------------------------
@register(
    "window_rank_lag",
    oracle="""
    SELECT c_nationkey, c_custkey,
           ROUND(c_acctbal, 2) AS acctbal,
           RANK() OVER (PARTITION BY c_nationkey
                        ORDER BY c_acctbal DESC, c_custkey) AS bal_rank,
           ROUND(LAG(c_acctbal) OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey), 2) AS prev_bal
    FROM customer
    """,
    survey="W1,W2",
    doc="rank + lag windows with deterministic ordering.",
)
def window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.rank().over(w).alias("bal_rank"),
        F.round(F.lag("c_acctbal").over(w), 2).alias("prev_bal"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total
    FROM orders
    """,
    survey="W1",
    doc="Running sum with an explicit ROWS frame.",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


# --- X6: distinct counting + quantiles -------------------------------------
@register(
    "count_distinct_exact",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    survey="X6,A4",
    doc="Exact multi-column distinct aggregation (expand + two-phase agg).",
)
def count_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@register(
    "approx_count_distinct",
    oracle=None,  # HLL sketch values differ across engines; hash-checked
    # twin: approx_count_distinct_check (driver evidence); accuracy vs
    # the exact count also asserted in tests/test_queries_oracle.py.
    driver=False,  # VERDICT r9 #5: bench/test arm, out of the sweep
    survey="X6",
    doc="approx_count_distinct (HyperLogLog++): the 100 TB-scale path for "
    "distinct counting — no exact distinct expansion, fixed-size sketch merge.",
)
def approx_count_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"))
    )


@register(
    "approx_count_distinct_check",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    survey="X6",
    doc="Driver-checkable tolerance oracle for the HLL sketch (upgrade of "
    "the rows-only approx_count_distinct): Spark computes BOTH the exact "
    "distinct count (hash-checked against DuckDB) and the sketch estimate, "
    "and emits |approx-exact| <= 5% as a boolean the oracle asserts TRUE — "
    "sketch values can never hash-match across engines, but the tolerance "
    "band can. rsd=0.01 makes 5% a ~5-sigma bound, so this is a real gate, "
    "not a tautology.",
)
def approx_count_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.01).alias("_approx"),
        )
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("_approx") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("within_5pct"),
    )


@register(
    "percentile_approx_check",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty_exact,
           TRUE AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    survey="X6",
    doc="Driver-checkable tolerance oracle for the quantile sketch (upgrade "
    "of the rows-only percentile_approx): the exact interpolated median is "
    "hash-checked, and |approx-exact| <= max(5%, 1.0) emits as a boolean "
    "the oracle asserts TRUE.",
)
def percentile_approx_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias(
                "median_qty_exact"
            ),
            F.percentile_approx("l_quantity", 0.5, 10000).alias("_approx"),
        )
    )
    return agg.select(
        "l_returnflag",
        "median_qty_exact",
        (
            F.abs(F.col("_approx") - F.col("median_qty_exact"))
            <= F.greatest(0.05 * F.abs(F.col("median_qty_exact")), F.lit(1.0))
        ).alias("within_tol"),
    )


@register(
    "hll_sketch_merge_check",
    oracle="""
    SELECT CAST((SELECT COUNT(DISTINCT c_nationkey) FROM customer) AS BIGINT)
             AS n_shards,
           CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer) AS BIGINT)
             AS exact_customers,
           TRUE AS within_2pct
    """,
    survey="X6",
    doc="Mergeable-sketch distinct counting with the Datasketches HLL "
    "functions (hll_sketch_agg / hll_union_agg / hll_sketch_estimate, "
    "Spark >= 3.5): each shard — here one per nation, standing in for one "
    "per executor/partition at cluster scale — builds a fixed-size binary "
    "sketch independently, and the global cardinality comes from MERGING "
    "the sketches, never from re-scanning or shuffling raw keys. This is "
    "how a 1000-executor job counts distincts over 100 TB: partial "
    "sketches are bytes, so the merge input is |shards| rows regardless "
    "of data volume, and sketches persisted per-partition stay mergeable "
    "across days/sources (unlike approx_count_distinct, whose sketch "
    "never leaves the aggregation). The exact count is hash-checked "
    "against DuckDB; the merged estimate's accuracy emits as an "
    "oracle-asserted boolean (lgConfigK=14 -> ~0.8% RSE, so the 2% band "
    "is a ~2.5-sigma gate, not a tautology).",
)
def hll_sketch_merge_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    # Stage 1 (per shard): one fixed-size sketch per nation.
    shards = cust.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey", F.lit(14)).alias("sk")
    )
    # Stage 2 (merge): union the binary sketches -> global estimate.
    merged = shards.agg(
        F.count("*").alias("n_shards"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
    )
    exact = cust.agg(F.countDistinct("c_custkey").alias("exact_customers"))
    # 1-row x 1-row scalar attach (allowlisted by the cartesian guard).
    return merged.crossJoin(exact).select(
        "n_shards",
        "exact_customers",
        (
            F.abs(F.col("_est") - F.col("exact_customers"))
            <= 0.02 * F.col("exact_customers")
        ).alias("within_2pct"),
    )


@register(
    "percentile_exact",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
    survey="X6",
    doc="Exact interpolated percentiles (Spark `percentile` == quantile_cont).",
)
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        )
    )


@register(
    "percentile_approx",
    oracle=None,  # sketch-based; hash-checked twin:
    # percentile_approx_check (driver evidence); tolerance also
    # asserted in tests/test_queries_oracle.py.
    driver=False,  # VERDICT r9 #5: bench/test arm, out of the sweep
    survey="X6",
    doc="percentile_approx (KLL-style sketch) — the scale path for quantiles.",
)
def percentile_approx_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.percentile_approx("l_quantity", 0.5, 10000).alias("approx_median_qty"))
    )


# --- X7: rollup / cube / grouping sets -------------------------------------
@register(
    "rollup_orders",
    oracle="""
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(o_orderpriority, '(all)') AS priority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    survey="X7",
    doc="ROLLUP hierarchy totals.",
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "n",
            "total",
        )
    )


@register(
    "cube_lineitem",
    oracle="""
    SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
           COALESCE(l_linestatus, '(all)') AS linestatus,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    survey="X7",
    doc="CUBE over two dimensions.",
)
def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "n",
            "qty",
        )
    )


@register(
    "grouping_sets_orders",
    oracle="""
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(o_orderpriority, '(all)') AS priority,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    survey="X7",
    doc="Explicit GROUPING SETS via Spark SQL.",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "largest_order_per_customer",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey, o_totalprice) AS top_orderkey,
           ROUND(MAX(o_totalprice), 2) AS top_totalprice
    FROM orders
    GROUP BY o_custkey
    """,
    survey="A4,W2",
    doc="Per-group top-1 via max_by/arg_max: ONE hash aggregate with "
    "partial+final merge instead of the window row_number alternative "
    "(shuffle + per-group sort + filter) — for top-1 the aggregate "
    "carries 16 bytes of state per group through map-side combine, the "
    "window materializes and sorts every row. Determinism: "
    "(o_custkey, o_totalprice) is verified tie-free at sf0.01 and sf0.1; "
    "with ties you would break on a struct key (DuckDB's arg_max cannot "
    "bind one, so the oracle would need a window formulation instead).",
)
def largest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("top_orderkey"),
        F.round(F.max("o_totalprice"), 2).alias("top_totalprice"),
    )


@register(
    "unpivot_lineitem_metrics",
    oracle="""
    SELECT metric, ROUND(SUM(val), 2) AS total, COUNT(*) AS n
    FROM (
      SELECT 'quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'discount', l_discount FROM lineitem
    )
    GROUP BY metric
    """,
    survey="O2,A4",
    doc="Wide→long melt via the native unpivot operator (Expand node: one "
    "scan emits all metric rows — the UNION ALL oracle formulation would "
    "scan the fact table once per metric), then an aggregate per metric.",
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="raw_metric",
        valueColumnName="val",
    )
    metric = F.expr("substring(raw_metric, 3)")  # strip the 'l_' prefix
    return (
        long.select(metric.alias("metric"), "val")
        .groupBy("metric")
        .agg(F.round(F.sum("val"), 2).alias("total"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "nullsafe_join_priority_match",
    oracle="""
    WITH a AS (
      SELECT CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN NULL
                  ELSE o_orderpriority END AS pri,
             COUNT(*) AS n_even
      FROM orders WHERE EXTRACT(year FROM o_orderdate) % 2 = 0 GROUP BY 1
    ),
    b AS (
      SELECT CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN NULL
                  ELSE o_orderpriority END AS pri,
             COUNT(*) AS n_odd
      FROM orders WHERE EXTRACT(year FROM o_orderdate) % 2 = 1 GROUP BY 1
    )
    SELECT a.pri, a.n_even, b.n_odd
    FROM a JOIN b ON a.pri IS NOT DISTINCT FROM b.pri
    """,
    survey="J1,P4",
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): unspecified "
    "priority maps to NULL and still matches across the two year-parity "
    "subsets — a plain = join would silently drop the NULL group, the "
    "classic dimension-with-unknown-member bug.",
)
def nullsafe_join_priority_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    pri = F.when(
        F.col("o_orderpriority") == "4-NOT SPECIFIED", F.lit(None)
    ).otherwise(F.col("o_orderpriority"))
    a = (
        o.filter(F.year("o_orderdate") % 2 == 0)
        .groupBy(pri.alias("pri"))
        .agg(F.count(F.lit(1)).alias("n_even"))
        .alias("a")
    )
    b = (
        o.filter(F.year("o_orderdate") % 2 == 1)
        .groupBy(pri.alias("pri"))
        .agg(F.count(F.lit(1)).alias("n_odd"))
        .alias("b")
    )
    return a.join(b, F.col("a.pri").eqNullSafe(F.col("b.pri"))).select(
        F.col("a.pri").alias("pri"), "n_even", "n_odd"
    )
