"""Multi-way star joins and the as-of join (SURVEY.md J1 extension tier).

The reference's join surface is a two-dim star (README.md:240-242); these
queries prove the same engine handles the shapes a warehouse actually runs:
a six-table TPC-H Q5-style local-supplier-volume join, a Q8-style
conditional market-share aggregate, and a point-in-time as-of join (an
operator Spark lacks natively — see :mod:`..operators.asof`; oracle is
DuckDB's built-in ``ASOF JOIN``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..schemas import load_fixture
from .catalog import register


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    survey="J1",
    doc="TPC-H Q5 shape: six-table star join, local-supplier predicate "
    "(c_nationkey = s_nationkey), region filter, revenue per nation. "
    "Only fixed-cardinality nation/region carry broadcast hints; "
    "customer/supplier scale with SF so AQE + autoBroadcastJoinThreshold "
    "decide their strategy. One shuffle for the final aggregate.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_fixture(spark, sf_dir, "lineitem")
    o = load_fixture(spark, sf_dir, "orders")
    c = load_fixture(spark, sf_dir, "customer")
    s = load_fixture(spark, sf_dir, "supplier")
    n = load_fixture(spark, sf_dir, "nation")
    r = load_fixture(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q8_brand_market_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           ROUND(SUM(CASE WHEN p_brand = 'Brand#2'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part   ON l_partkey = p_partkey
    GROUP BY 1
    """,
    survey="J1,A4,F9",
    doc="TPC-H Q8 shape: conditional (CASE) aggregate over a fact-dim join "
    "computes one brand's revenue share per order year.",
)
def q8_brand_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_fixture(spark, sf_dir, "lineitem")
    o = load_fixture(spark, sf_dir, "orders")
    p = load_fixture(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    brand_rev = F.when(F.col("p_brand") == "Brand#2", rev).otherwise(F.lit(0.0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(F.sum(brand_rev) / F.sum(rev), 4).alias("mkt_share"))
    )


@register(
    "asof_last_purchase_before_click",
    oracle="""
    SELECT a.event_id,
           a.user_id,
           strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           ROUND(b.value, 4) AS purchase_value,
           CAST(FLOOR(epoch_us(a.ts - b.ts) / 60000000) AS BIGINT) AS minutes_since
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click') a
    ASOF JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
    survey="J1,F6,X18",
    doc="As-of join: each click gets the latest purchase at-or-before it per "
    "user — sort-based union+window operator (operators/asof.py), one "
    "shuffle, O(n) vs the quadratic naive range join; oracle is DuckDB's "
    "native ASOF JOIN.",
)
def asof_last_purchase_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_fixture(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value"), "event_id"
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="click_ts",
        right_ts="ts",
        right_values=["purchase_value", "ts"],
        tiebreak="event_id",  # same-instant purchases resolve deterministically
        how="inner",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.round("purchase_value", 4).alias("purchase_value"),
        # integer-µs arithmetic: unix_timestamp would drop sub-second parts
        # and drift one minute off the oracle's epoch_us computation
        F.floor(
            (F.unix_micros("click_ts") - F.unix_micros("ts")) / 60_000_000
        ).alias("minutes_since"),
    )


@register(
    "events_range_pair_join",
    oracle="""
    SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id,
           CAST(FLOOR(ABS(epoch_us(a.ts - b.ts)) / 1000000) AS BIGINT) AS gap_sec
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) a
    JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND ABS(epoch_us(a.ts - b.ts)) <= 300 * 1000000
    """,
    survey="J1,X8",
    doc="Range join via time-bucket blocking: pairs of same-user events "
    "within 5 minutes. One side lands in its own 5-minute bucket, the "
    "other explodes into {b-1, b, b+1}; the join is then a pure equi-join "
    "on (user, bucket) + an exact residual filter — an inequality join "
    "that would otherwise degenerate to a per-user nested loop becomes "
    "shuffle-bounded. Oracle runs the plain inequality join.",
)
def events_range_pair_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    window_us = 300 * 1_000_000
    ev = load_fixture(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    a = ev.withColumn("bucket", F.floor(F.col("us") / window_us))
    b = (
        ev.withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.floor(F.col("us") / window_us) - 1,
                    F.floor(F.col("us") / window_us),
                    F.floor(F.col("us") / window_us) + 1,
                )
            ),
        )
        .select(
            F.col("event_id").alias("id_b"),
            F.col("user_id").alias("user_b"),
            F.col("us").alias("us_b"),
            "bucket",
        )
    )
    return (
        a.join(
            b,
            (a.user_id == F.col("user_b"))
            & (a.bucket == b.bucket)
            & (a.event_id < F.col("id_b"))
            & (F.abs(a.us - F.col("us_b")) <= window_us),
        )
        .select(
            F.col("event_id").alias("id_a"),
            "id_b",
            "user_id",
            F.floor(F.abs(F.col("us") - F.col("us_b")) / 1_000_000).alias("gap_sec"),
        )
        # no .distinct(): |us diff| <= window forces |bucket diff| <= 1, so
        # each qualifying pair matches exactly ONE of b's three exploded
        # bucket rows — dedup here would just add a full extra shuffle
    )


INTERVAL_LEN_SEC = 600


@register(
    "interval_overlap_pairs",
    oracle=f"""
    WITH a AS (
      SELECT event_id AS a_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s
      FROM events WHERE event_type = 'purchase' AND user_id % 10 = 0
    ),
    b AS (
      SELECT event_id AS b_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s
      FROM events WHERE event_type = 'purchase' AND user_id % 10 = 5
    )
    SELECT a_id, b_id,
           CAST((LEAST(a.s, b.s) + {INTERVAL_LEN_SEC} * 1000000
                 - GREATEST(a.s, b.s)) // 1000000 AS BIGINT) AS overlap_sec
    FROM a JOIN b
      ON a.s <= b.s + {INTERVAL_LEN_SEC} * 1000000
     AND b.s <= a.s + {INTERVAL_LEN_SEC} * 1000000
    """,
    survey="J1,X8",
    doc="Interval×interval overlap join (operators/intervals.py): two "
    "cohorts' 10-minute purchase-activity windows, overlapping pairs with "
    "integer overlap duration. Each interval registers under the <=2 "
    "width-quantized buckets it touches; the join is a pure equi-join on "
    "bucket + exact overlap residual, and cross-bucket duplicate pairs "
    "are eliminated for FREE by crediting each pair only to the bucket "
    "owning greatest(start_a, start_b) — no DISTINCT shuffle. The "
    "interval generalization of events_range_pair_join; the oracle runs "
    "the plain inequality join.",
)
def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.intervals import interval_overlap_join

    ev = load_fixture(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    end = F.col("start_us") + INTERVAL_LEN_SEC * 1_000_000
    base = ev.select(
        F.col("event_id").alias("id"),
        F.unix_micros("ts").alias("start_us"),
        "user_id",
    ).withColumn("end_us", end)
    a = base.filter(F.col("user_id") % 10 == 0).drop("user_id")
    b = base.filter(F.col("user_id") % 10 == 5).drop("user_id")
    return interval_overlap_join(a, b, max_len_sec=INTERVAL_LEN_SEC)


@register(
    "asof_next_purchase_after_click",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS cts
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, value,
             event_id AS pid
      FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT c.event_id, c.user_id, c.cts, p.pts, p.value, p.pid
      FROM c JOIN p ON c.user_id = p.user_id
                   AND p.pts >= c.cts
                   AND p.pts <= c.cts + INTERVAL 1 HOUR
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_id
                                ORDER BY pts ASC, pid DESC) AS rn
      FROM j
    )
    SELECT event_id, user_id,
           strftime(cts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           ROUND(value, 4) AS purchase_value,
           CAST(FLOOR(epoch_us(pts - cts) / 60000000) AS BIGINT)
               AS minutes_until
    FROM r WHERE rn = 1
    """,
    survey="J1,F6,X18",
    doc="Forward as-of join WITH tolerance (the other half of the pandas "
    "merge_asof surface): each click gets the earliest purchase at-or-"
    "after it per user, but only within 1 hour — an over-tolerance match "
    "is no match. Identical single-shuffle union+window plan as the "
    "backward pass, window ordered by descending timestamp; the oracle "
    "is an explicit bounded range join + ROW_NUMBER because DuckDB's "
    "native ASOF does not express the tolerance or the tie-break "
    "(same-instant purchases resolve to the highest event id on both "
    "sides).",
)
def asof_next_purchase_after_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_fixture(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value"), "event_id"
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="click_ts",
        right_ts="ts",
        right_values=["purchase_value", "ts"],
        tiebreak="event_id",
        how="inner",
        direction="forward",
        tolerance=3_600_000_000,  # 1 hour in µs
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.round("purchase_value", 4).alias("purchase_value"),
        F.floor(
            (F.unix_micros("ts") - F.unix_micros("click_ts")) / 60_000_000
        ).alias("minutes_until"),
    )
