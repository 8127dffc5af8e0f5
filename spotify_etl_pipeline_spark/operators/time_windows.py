"""Batch time-window operators over ``events`` (SURVEY.md X8, T1-T4).

Batch equivalents of the streaming windows (the streaming forms, with
watermarks, live in :mod:`..streaming.windows` — same logical shapes):

- tumbling: ``F.window(ts, size)`` — bucket + hash aggregate, one shuffle.
- sliding: ``F.window(ts, size, slide)`` — each event replicated size/slide
  times; replication factor is the dominant scale knob.
- session: gaps-and-islands with lag + running sum — two window passes over
  a user-partitioned sort; shuffle key = user_id, skew-safe under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _fmt(col):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def tumbling(df: DataFrame, size: str = "1 hour") -> DataFrame:
    """Per-(window, event_type) counts and sums over fixed buckets."""
    return (
        df.groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            _fmt(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding(df: DataFrame, size: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """Overlapping windows: each event lands in size/slide buckets."""
    return (
        df.groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(_fmt(F.col("w.start")).alias("window_start"), "n")
    )


def sessionize(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gaps-and-islands sessionization per user.

    New session when the gap to the previous event exceeds ``gap_minutes``;
    session id = running count of boundaries. Batch twin of streaming
    ``session_window`` (same session boundaries).
    """
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(order))
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    upto = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.withColumn("new_sess", new_sess)
        .withColumn("session_seq", F.sum("new_sess").over(upto))
        .groupBy("user_id", "session_seq")
        .agg(
            _fmt(F.min("ts")).alias("session_start"),
            _fmt(F.max("ts")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
