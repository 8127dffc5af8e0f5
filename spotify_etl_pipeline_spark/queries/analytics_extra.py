"""Additional SQL-surface coverage: ranking-distribution window functions,
regex scalar functions, and the classic product-analytics shapes (ordered
funnel, weekly cohort retention) — registered late so the correctness-sweep
rotation (catalog.py) is undisturbed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_fixture
from .catalog import register


@register(
    "window_ntile_quartiles",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           NTILE(4) OVER w AS quartile,
           CAST(FLOOR(1000000 * PERCENT_RANK() OVER w) AS BIGINT) AS pct_rank_micro,
           CAST(FLOOR(1000000 * CUME_DIST() OVER w) AS BIGINT) AS cume_micro
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey)
    """,
    survey="W1",
    doc="Ranking-distribution windows (ntile / percent_rank / cume_dist) "
    "per market segment; the order key carries a unique tie-break "
    "(c_custkey) so ntile bucket boundaries are deterministic. The ratios "
    "are emitted as FLOOR-of-micro integers, not round(x, 6): k/(n-1) can "
    "land on a half-ulp boundary where the engines' round() half-rules "
    "disagree, while IEEE division is bit-identical so floor lands "
    "identically. One shuffle on the partition key; no global sort.",
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_fixture(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.floor(1_000_000 * F.percent_rank().over(w)).alias("pct_rank_micro"),
        F.floor(1_000_000 * F.cume_dist().over(w)).alias("cume_micro"),
    )


@register(
    "regexp_scalar_functions",
    oracle="""
    SELECT c_custkey,
           TRY_CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS name_id,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           regexp_matches(c_name, '^Customer#') AS well_formed
    FROM customer
    """,
    survey="F1,F3",
    doc="Regex scalar surface: capture-group extraction, global "
    "replacement, and pattern predicate over customer names. DuckDB "
    "regexp_replace needs the explicit 'g' flag to match Spark's "
    "replace-all default; TRY_CAST on both sides because a no-match "
    "extract yields '' and a plain cast of '' throws in BOTH engines "
    "(ANSI Spark / DuckDB ConversionException) — a digit-less name must "
    "produce a NULL id, not a hard query failure.",
)
def regexp_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_fixture(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).try_cast("long").alias("name_id"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.col("c_name").rlike("^Customer#").alias("well_formed"),
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '2001-03-15'
      AND l.l_shipdate  > TIMESTAMP '2001-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount)) DESC, l.l_orderkey
    LIMIT 10
    """,
    survey="J1,A4,W2,O1",
    doc="TPC-H Q3 shape (shipping priority): segment-filtered customer ⋈ "
    "orders ⋈ lineitem, unshipped-revenue per order, deterministic "
    "top-10. Both date predicates push to their scans; the segment "
    "filter cuts customer before the join.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.to_timestamp(F.lit("2001-03-15"))
    c = load_fixture(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_fixture(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_fixture(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(rev.alias("_rev"))
        .orderBy(F.desc("_rev"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.round("_rev", 2).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount)) DESC, c.c_custkey
    LIMIT 20
    """,
    survey="J1,A4,W2,O1",
    doc="TPC-H Q10 shape (returned items): revenue lost to returns per "
    "customer with nation context, deterministic top-20. The returnflag "
    "predicate pushes to the lineitem scan; nation (25 rows, fixed "
    "cardinality) carries an explicit broadcast hint like q5's dims, "
    "while customer/orders stay AQE-governed.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_fixture(spark, sf_dir, "customer")
    o = load_fixture(spark, sf_dir, "orders")
    li = load_fixture(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_fixture(spark, sf_dir, "nation")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.alias("_rev"))
        .orderBy(F.desc("_rev"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", F.round("_rev", 2).alias("revenue"), "n_name")
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    v AS (SELECT user_id, MIN(ts) AS v_ts FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS c_ts
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.v_ts
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
          GROUP BY e.user_id)
    SELECT 'view' AS stage, (SELECT COUNT(*) FROM v) AS n_users
    UNION ALL SELECT 'click', (SELECT COUNT(*) FROM c)
    UNION ALL SELECT 'purchase', (SELECT COUNT(*) FROM p)
    """,
    survey="A4,J1,X8",
    doc="Ordered three-stage funnel: first view, first click at-or-after "
    "it, first purchase at-or-after that — per-user min-timestamp "
    "aggregations chained by equi-joins on user_id (each stage is one "
    "shuffle on the same key; AQE reuses the partitioning), never a "
    "per-user sort or window over the raw event stream.",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_fixture(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return stage("view", v).unionByName(stage("click", c)).unionByName(stage("purchase", p))


@register(
    "cohort_weekly_retention",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week FROM e
      GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             date_trunc('week', e.ts) AS activity_week
      FROM e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(datediff('day', cohort_week, activity_week) // 7 AS BIGINT)
               AS week_offset,
           COUNT(*) AS n_users
    FROM activity
    GROUP BY cohort_week, activity_week
    """,
    survey="A4,F6,X8",
    doc="Weekly cohort retention: users bucketed by first-seen week "
    "(Monday-truncated in both engines), distinct (user, activity-week) "
    "pairs counted per (cohort, offset). Two shuffles — the per-user min "
    "and the final rollup; the distinct rides the second.",
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_fixture(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).alias("activity_week"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "activity_week")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7
            ).alias("week_offset"),
            "n_users",
        )
    )


@register(
    "full_outer_click_purchase_recon",
    oracle="""
    WITH c AS (
      SELECT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             COUNT(*) AS n_clicks
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, day
    ),
    p AS (
      SELECT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             COUNT(*) AS n_purchases
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, day
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE(c.day, p.day) AS day,
           COALESCE(c.n_clicks, 0) AS n_clicks,
           COALESCE(p.n_purchases, 0) AS n_purchases
    FROM c FULL OUTER JOIN p
      ON c.user_id = p.user_id AND c.day = p.day
    """,
    survey="J1,A4",
    doc="FULL OUTER reconciliation: per-(user, day) click counts against "
    "purchase counts, preserving activity present on either side only — "
    "the one join type the rest of the catalog didn't exercise. Both "
    "inputs aggregate BEFORE the join (group-count-sized build sides), "
    "and the join keys are the grouping keys, so the full-outer shuffle "
    "is over reduced data, never raw events.",
)
def full_outer_click_purchase_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_fixture(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")

    def daily(event_type: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .groupBy("user_id", day.alias("day"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    c = daily("click", "n_clicks").alias("c")
    p = daily("purchase", "n_purchases").alias("p")
    return (
        c.join(
            p,
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("c.day") == F.col("p.day")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("c.user_id"), F.col("p.user_id")).alias("user_id"),
            F.coalesce(F.col("c.day"), F.col("p.day")).alias("day"),
            F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
            F.coalesce(F.col("n_purchases"), F.lit(0)).alias("n_purchases"),
        )
    )


@register(
    "cdc_apply_snapshot",
    oracle="""
    WITH log AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error'  THEN 'D'
                             ELSE 'U' END AS op,
             value
      FROM events
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_ops
      FROM log
    )
    SELECT user_id,
           op AS last_op,
           ROUND(value, 4) AS last_value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           CAST(n_ops AS BIGINT) AS n_ops
    FROM ranked
    WHERE rn = 1 AND op <> 'D'
    """,
    survey="J3,A5,T3",
    doc="CDC log compaction: the events stream read as an I/U/D change "
    "log per user (signup=insert, error=delete, rest=update), compacted "
    "to the current snapshot — latest op wins on (ts, event_id), keys "
    "whose latest op is a DELETE drop out entirely. One shuffle on the "
    "key, one window pass; the MERGE-free formulation of applying a CDC "
    "batch that Delta/Iceberg MERGE would express, and the deletion-aware "
    "generalization of latest_order_per_customer's upsert.",
)
def cdc_apply_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_fixture(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    return (
        log.withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(wc))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.col("op").alias("last_op"),
            F.round("value", 4).alias("last_value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            "n_ops",
        )
    )


@register(
    "events_props_variant",
    oracle="""
    WITH parsed AS (
      SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, value
      FROM events
    )
    SELECT CAST(k // 10 AS INTEGER) AS k_bucket,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM parsed
    GROUP BY 1
    """,
    survey="F10,X5",
    doc="Spark 4 VARIANT path for semi-structured data: parse_json once "
    "into the binary VARIANT encoding, variant_get typed extraction, "
    "aggregate per k-decile. The at-scale upgrade over per-access "
    "get_json_object string re-parsing (json_props_extract keeps that "
    "classic path): VARIANT parses each document once and shreds "
    "navigation into the columnar binary. Oracle is DuckDB's JSON "
    "extraction over the same props.",
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_fixture(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy(F.expr("k div 10").cast("int").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "market_basket_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY support DESC, part_a ASC, part_b ASC
    LIMIT 20
    """,
    survey="A4,J1,X1,X27",
    doc="Market-basket co-occurrence (the support-counting core of "
    "frequent-itemset mining): top-20 part pairs appearing together in "
    "an order, via the a<b self-join on the distinct (order, part) "
    "relation — one shuffle on the order key, per-key comparison cost "
    "bounded by basket size. Measured against the in-group expansion "
    "alternative (collect sorted basket arrays + the dedup tier's pair "
    "expression) at the sf1 tile: self-join 33 s vs 47 s end-to-end — "
    "the expansion's computed-once advantage only pays when the "
    "upstream is expensive to recompute (the LSH-bucket case), not for "
    "a raw scan, and the collect_list groupBy plus interpreted "
    "expression tree costs more than the SMJ it avoids. Deterministic: "
    "(support DESC, part_a, part_b) total order.",
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_fixture(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    items = li.distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )
