"""Watermarked streaming windows over the events stream (SURVEY.md X8/T3).

Streaming twins of :mod:`..operators.time_windows` — same logical window
shapes with ``withWatermark`` bounding state. The events fixture is a
parquet file, so streams here read it through the file source; the physical
ts encoding (nanos-as-long, naive µs, or true timestamp) is discovered from
a one-time batch footer read and normalized by
:func:`..schemas.normalize_events_ts` — the streaming mirror of
``schemas.load_fixture``.

State-size notes (the thing that matters on an unbounded 100 TB/day
stream): watermark delay bounds every window's state; session windows
additionally bound per-key state by gap timeout; the dedup operator keeps
only ids newer than the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import normalize_events_ts


def read_events_stream(
    spark: SparkSession, directory: str, glob: str = "events.parquet"
) -> DataFrame:
    """File-source stream over the events table (the file source requires a
    directory; ``glob`` narrows it to the events file within sf_dir).

    ``readStream`` needs a declared schema; we take it from a batch read of
    the same glob (a driver-side footer read, no data scan), so whatever ts
    encoding this fixture generation uses is the schema the stream declares.
    If the files are TIMESTAMP(NANOS), the batch read itself requires
    ``spark.sql.legacy.parquet.nanosAsLong=true`` on the session (a
    :func:`..session.get_spark` default) and raises a clear Spark error
    otherwise — deliberately not set here: flipping a session-global conf
    inside a reader helper would silently change every later parquet read.
    """
    schema = (
        spark.read.option("pathGlobFilter", glob).parquet(directory).schema
    )
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .parquet(directory)
    )
    return normalize_events_ts(raw)


def tumbling_stream(events: DataFrame, size: str = "1 hour",
                    watermark: str = "30 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_stream(events: DataFrame, size: str = "1 hour",
                   slide: str = "15 minutes",
                   watermark: str = "30 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
        )
    )


def session_stream(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "30 minutes") -> DataFrame:
    """Native streaming session windows — the stateful operator the batch
    gaps-and-islands query emulates (same boundaries by construction)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup on event_id ALONE with watermark-bounded state
    (T3: late/duplicate-run tolerance).

    ``dropDuplicatesWithinWatermark`` keys on just the id: an at-least-once
    producer that re-stamps ts on retry still dedups (keying on
    (event_id, ts) would pass the perturbed duplicate through), while the
    watermark still bounds state retention.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str = "complete") -> None:
    """Drive a finite stream to completion into an in-memory table (tests)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def click_purchase_join_stream(
    events: DataFrame, max_gap: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked stream-stream inner join (SURVEY.md X8 extension):
    purchases joined to the clicks that preceded them by ≤ ``max_gap`` for
    the same user.

    Both sides carry watermarks and the join has a two-sided time-range
    predicate — exactly what Spark needs to bound join state: click state
    can be dropped once the purchase-side watermark passes click_ts +
    max_gap, so state is O(events within the gap window), not O(stream).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "value",
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}")),
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.round("value", 2).alias("value"),
    )
