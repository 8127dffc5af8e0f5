"""Warehouse SQL surface: TPC-H-shaped queries exercising the SQL features
the rest of the catalog doesn't — EXISTS semi-joins with inequality
predicates, outer-join distributions, GROUP BY ... HAVING over subquery
facts, scalar-subquery predicates, aliased-dim self-joins, and explicit
window frame specifications. Several run through ``spark.sql`` over temp
views to prove the SQL entry path end-to-end (same Catalyst plans as the
DataFrame API — SURVEY.md §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_fixture
from .catalog import register


def _view(spark: SparkSession, sf_dir: str, name: str, suffix: str) -> str:
    """Register a fixture as a per-query temp view.

    Names carry a query suffix: temp views are session-global, so two
    catalog queries running concurrently on one session with different
    sf_dirs would otherwise swap each other's tables mid-plan."""
    view = f"{name}_{suffix}"
    load_fixture(spark, sf_dir, name).createOrReplaceTempView(view)
    return view


@register(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    survey="J2,A4",
    doc="TPC-H Q4 shape: EXISTS with an inequality correlation (shipped "
    ">60 days after ordering) → LeftSemi join, then count per priority.",
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_fixture(spark, sf_dir, "orders")
    li = load_fixture(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
    survey="J1",
    doc="TPC-H Q7 shape: the nation dim joined TWICE under different "
    "aliases (supplier side vs customer side) with a disjunctive pair "
    "filter — run through spark.sql to exercise the SQL entry path.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = {t: _view(spark, sf_dir, t, "q7")
         for t in ("lineitem", "orders", "supplier", "customer", "nation")}
    return spark.sql(
        f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM {v['lineitem']}
        JOIN {v['orders']}   ON l_orderkey = o_orderkey
        JOIN {v['supplier']} ON l_suppkey = s_suppkey
        JOIN {v['customer']} ON o_custkey = c_custkey
        JOIN {v['nation']} n1 ON s_nationkey = n1.n_nationkey
        JOIN {v['nation']} n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
        """
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    survey="J1,A4",
    doc="TPC-H Q13 shape: LEFT OUTER join preserving order-less customers "
    "(COUNT(col) ignores their nulls) + a second aggregation over the "
    "first's result — the orders-per-customer histogram.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_fixture(spark, sf_dir, "customer")
    o = load_fixture(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           ROUND(o_totalprice, 2) AS o_totalprice,
           SUM(l_quantity) AS sum_qty
    FROM customer
    JOIN orders  ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    """,
    survey="J1,A4,W2",
    doc="TPC-H Q18 shape: IN-subquery with GROUP BY ... HAVING (orders "
    "whose total quantity tops 250) re-joined to customer and lineitem — "
    "run through spark.sql.",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = {t: _view(spark, sf_dir, t, "q18")
         for t in ("customer", "orders", "lineitem")}
    return spark.sql(
        f"""
        SELECT c_name, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate,
               ROUND(o_totalprice, 2) AS o_totalprice,
               SUM(l_quantity) AS sum_qty
        FROM {v['customer']}
        JOIN {v['orders']}  ON c_custkey = o_custkey
        JOIN {v['lineitem']} ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM {v['lineitem']} GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 250
        )
        GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
        """
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_custs,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
    """,
    survey="J2,A4",
    doc="TPC-H Q22 shape: scalar-subquery threshold (above-average positive "
    "balance) + NOT EXISTS anti-join (never placed an urgent order), "
    "grouped per nation.",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_fixture(spark, sf_dir, "customer")
    o = load_fixture(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "window_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER w3, 2) AS moving_sum3,
           ROUND(MAX(o_totalprice) OVER cum, 2) AS cum_max,
           NTILE(4) OVER full_w AS quartile,
           ROUND(PERCENT_RANK() OVER full_w, 4) AS pct_rank
    FROM orders
    WHERE o_custkey < 100
    WINDOW
      w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      cum AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      full_w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    survey="W1,W2",
    doc="Explicit frame specifications: 3-row moving sum, cumulative "
    "max, NTILE quartiles, PERCENT_RANK — one exchange on the partition "
    "key serves all four window functions.",
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_fixture(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    order = [F.col("o_orderdate"), F.col("o_orderkey")]
    w3 = (
        Window.partitionBy("o_custkey").orderBy(*order).rowsBetween(-2, 0)
    )
    cum = (
        Window.partitionBy("o_custkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    full_w = Window.partitionBy("o_custkey").orderBy(*order)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w3), 2).alias("moving_sum3"),
        F.round(F.max("o_totalprice").over(cum), 2).alias("cum_max"),
        F.ntile(4).over(full_w).alias("quartile"),
        F.round(F.percent_rank().over(full_w), 4).alias("pct_rank"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch_day
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ), 2) AS trailing_30d_total,
           COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY epoch_day
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS trailing_30d_orders
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS epoch_day
      FROM orders
    )
    WHERE o_custkey < 200
    """,
    survey="W1",
    doc="Value-based RANGE frame (vs the positional ROWS frames in "
    "window_frames): trailing 30-DAY totals per customer — the frame "
    "bound is a distance in the ORDER BY value, so unlike rowsBetween "
    "the window correctly spans gaps and ties in order dates. Ordered by "
    "integer epoch-day so both engines bound the range identically.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = (
        load_fixture(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .withColumn(
            "epoch_day", F.floor(F.unix_timestamp("o_orderdate") / 86400)
        )
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("epoch_day")
        .rangeBetween(-30, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_30d_total"),
        F.count(F.lit(1)).over(w).alias("trailing_30d_orders"),
    )


_RCTE_CHAIN_BODY = """
WITH RECURSIVE seq AS (
  SELECT o_custkey AS custkey, o_orderkey AS okey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn,
         LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS next_key
  FROM {orders}
),
chain(custkey, okey, depth, run_cents, next_key) AS (
  SELECT custkey, okey, 1, cents, next_key FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.custkey, s.okey, c.depth + 1, c.run_cents + s.cents, s.next_key
  FROM chain c JOIN seq s ON s.okey = c.next_key
)
SELECT custkey, okey AS orderkey, CAST(depth AS BIGINT) AS depth,
       CAST(run_cents AS BIGINT) AS run_cents
FROM chain
"""


@register(
    "sql_recursive_order_chain",
    oracle=_RCTE_CHAIN_BODY.format(orders="orders"),
    survey="SQL+,X21",
    doc="Spark 4 recursive CTE (WITH RECURSIVE ... UNION ALL, the "
    "iterative linked-list walk): each customer's orders form a "
    "successor chain (LEAD over the date order); the recursive member "
    "walks it accumulating depth and a running total in integer cents. "
    "The SAME statement runs verbatim on both engines — only the table "
    "name differs — exercising Spark's recursion execution (anchor + "
    "iterated step under the cteRecursionLevelLimit guard; max chain "
    "here is 24 orders, far under the 100-level default). The window "
    "twin of this computation (window_running_sum / window_frames) is "
    "the plan Spark SHOULD pick when the recursion is a linear chain — "
    "this entry exists to prove the SQL surface, not to replace them. "
    "Scale cliff, measured then GATED (sf1 tile, 1.5M orders): Spark's "
    "spark.sql.cteRecursionRowLimit guard (default 1,000,000 TOTAL rows "
    "across all recursion steps) aborts the walk with "
    "RECURSION_ROW_LIMIT_EXCEEDED — the guard is row-count-based, not "
    "depth-based, so ANY recursive CTE whose working set grows with the "
    "data trips it at scale regardless of chain length. This entry now "
    "scales the guard to its input: the walk emits each order exactly "
    "once across all steps (anchor = first order per chain), so total "
    "recursion rows == COUNT(orders), a bound known from one scalar "
    "aggregate before the query runs. The guard is re-armed at "
    "2x that bound (never lowered below the default), keeping the "
    "runaway-recursion safety net proportional instead of absolute. "
    "The window formulation (window_running_sum) needs no guard at all, "
    "which remains the real scale lesson this pair records.",
)
def sql_recursive_order_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _view(spark, sf_dir, "orders", "rcte")
    return recursive_order_chain(spark, o)


def recursive_order_chain(
    spark: SparkSession, orders_view: str, n_orders: int | None = None
) -> DataFrame:
    """The recursive-CTE walk with its input-scaled recursion guard.

    ``n_orders`` short-circuits the guard's sizing job (the
    ``pq_topk_auto`` convention): callers that know the order count —
    catalog statistics, a manifest, the upstream stage — pass it and the
    plan builds with ZERO extra Spark jobs; absent, one bounded scalar
    count sizes the guard.  The conf is read at EXECUTION time, so it
    must still be set when the caller materializes the returned
    DataFrame — set-and-leave on the session (monotonic: only ever
    raised), not set-and-restore around a lazy plan.
    """
    if n_orders is None:
        n_orders = spark.table(orders_view).count()
    key = "spark.sql.cteRecursionRowLimit"
    current = int(spark.conf.get(key, "1000000"))
    scaled = max(current, 2 * int(n_orders) + 10_000)
    if scaled > current:
        spark.conf.set(key, str(scaled))
    return spark.sql(_RCTE_CHAIN_BODY.format(orders=orders_view))


_LATERAL_BODY = """
SELECT c.c_custkey AS custkey, t.orderkey, t.cents
FROM {customer} c, LATERAL (
  SELECT o_orderkey AS orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM {orders}
  WHERE o_custkey = c.c_custkey
  ORDER BY cents DESC, o_orderkey ASC
  LIMIT 3
) t
WHERE c.c_nationkey = 1
"""


@register(
    "sql_lateral_topn_orders",
    oracle=_LATERAL_BODY.format(customer="customer", orders="orders"),
    survey="SQL+,X22",
    doc="Correlated LATERAL subquery with per-row ORDER BY ... LIMIT "
    "(top-3 priciest orders per nation-1 customer) — the SQL-standard "
    "top-n-per-group idiom, run verbatim on both engines. Catalyst "
    "decorrelates it to a ranked window over one join (DomainJoin "
    "rewrite), i.e. the same physical plan as the explicit row_number "
    "formulation — proving the surface costs nothing over the idiom the "
    "catalog already uses. Deterministic: cents DESC, orderkey ASC "
    "tie-break; integer cents on both sides.",
)
def sql_lateral_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _view(spark, sf_dir, "customer", "lat")
    o = _view(spark, sf_dir, "orders", "lat")
    return spark.sql(_LATERAL_BODY.format(customer=c, orders=o))


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="SQL+,X23",
    doc="Spark 4 SQL pipe syntax (SPIP: |> operators — FROM ... |> WHERE "
    "... |> AGGREGATE ... GROUP BY): the linear-dataflow SQL dialect, "
    "parsed to the identical Catalyst plan as the standard formulation "
    "the DuckDB oracle uses. Integer-cents SUM cast to BIGINT on both "
    "sides (HUGEINT convention).",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _view(spark, sf_dir, "lineitem", "pipe")
    return spark.sql(f"""
      FROM {li}
      |> WHERE l_quantity >= 30
      |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
         GROUP BY l_returnflag, l_linestatus
    """)
