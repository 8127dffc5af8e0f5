"""Batch time-window queries over ``events`` (SURVEY.md X8, T2-T4).

The streaming twins (watermarked, incremental) live in
:mod:`..streaming.windows`; these batch forms are the oracle-checkable
semantics. DuckDB sees the raw TIMESTAMP_NS column; ``CAST(ts AS
TIMESTAMP)`` truncates to µs exactly like the Spark-side loader."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import time_windows as W
from ..schemas import load_fixture
from .catalog import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_fixture(spark, sf_dir, "events")


@register(
    "events_tumbling_hourly",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY 1, 2
    """,
    survey="X8,T2",
    doc="Tumbling 1-hour windows: counts + sums per event type.",
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.tumbling(_events(spark, sf_dir), "1 hour")


@register(
    "events_sliding_counts",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
                      - k.k * INTERVAL 15 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n
    FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) k
    GROUP BY 1
    """,
    survey="X8",
    doc="Sliding windows (1h size / 15min slide): each event lands in 4 "
    "overlapping windows.",
)
def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.sliding(_events(spark, sf_dir), "1 hour", "15 minutes")


@register(
    "events_sessionize",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                        - CAST(floor(epoch(CAST(lag(ts) OVER w AS TIMESTAMP))) AS BIGINT)
                          > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS session_seq
      FROM ordered
    )
    -- CAST: SUM(INT) window returns HUGEINT → float64 via pandas; Spark
    -- emits int64, and the driver hasher compares dtypes.
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           strftime(MIN(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM tagged
    GROUP BY user_id, session_seq
    """,
    survey="X8,T3",
    doc="Gaps-and-islands sessionization (30-min gap) — batch twin of "
    "streaming session_window.",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.sessionize(_events(spark, sf_dir), gap_minutes=30)


@register(
    "events_daily_from_hourly",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY 1, 2
    """,
    survey="X8",
    doc="Multi-resolution rollup (continuous-aggregate pattern): the daily "
    "aggregate is computed FROM the hourly partials (sum-of-sums / "
    "sum-of-counts), not from raw events — at 100 TB the hourly tier is "
    "materialized once and every coarser resolution reuses it, so the "
    "raw-event scan happens exactly once per ingest. Oracle aggregates "
    "raw directly; equality holds because rounding is deferred to the "
    "final tier.",
)
def events_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", F.col("w.start")), "yyyy-MM-dd").alias(
                "day"
            ),
            "event_type",
        )
        .agg(F.sum("n").alias("n"), F.round(F.sum("total"), 2).alias("total"))
    )


@register(
    "events_hourly_gapfill",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS h,
             COUNT(*) AS n,
             ROUND(SUM(value), 2) AS total
      FROM events
      GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM bounds
    )
    SELECT g.event_type,
           strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
           COALESCE(hourly.n, 0) AS n,
           COALESCE(hourly.total,
                    LAST_VALUE(hourly.total IGNORE NULLS) OVER (
                      PARTITION BY g.event_type ORDER BY g.h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    )) AS total_locf
    FROM grid g LEFT JOIN hourly ON g.event_type = hourly.event_type
                                AND g.h = hourly.h
    """,
    survey="X8,F4",
    doc="Hypertable-style gap filling: a dense per-type hourly grid built "
    "with sequence() (per-group bounds — no global scalar), zero-filled "
    "counts, and last-observation-carried-forward totals via an "
    "ignore-nulls window. Hourly totals are rounded BEFORE the carry so "
    "both engines forward identical values.",
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce(
                "total", F.last("total", ignorenulls=True).over(w)
            ).alias("total_locf"),
        )
    )


@register(
    "events_windowed_distinct_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
               AS w, user_id
      FROM events
    )
    SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM du GROUP BY w
    """,
    survey="X8,A5,X28",
    doc="Exact distinct users per tumbling hour, via dedup-then-count: "
    "DISTINCT (window, user) first — a keyed, partial-aggregatable "
    "shuffle — then a plain COUNT per window. This is the scale answer "
    "to windowed COUNT(DISTINCT): the direct form cannot map-side "
    "combine (distinct sets don't merge by count), so every raw event "
    "row shuffles to its window's reducer and hot windows become "
    "stragglers; the two-step form ships each (window, user) pair once "
    "and the second stage is a mergeable count. Same rewrite Spark's "
    "own optimizer applies for one COUNT(DISTINCT) — stated explicitly "
    "here because with >1 distinct aggregate or a sketch fallback the "
    "choice stops being automatic (approx_count_distinct is the "
    "documented tolerance-checked alternative).",
)
def events_windowed_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir)
    du = (
        ev.select(F.window("ts", "1 hour").alias("w"), "user_id").distinct()
    )
    return (
        du.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_users",
        )
    )
