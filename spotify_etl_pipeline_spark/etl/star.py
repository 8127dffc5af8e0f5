"""Silver → gold star schema (reference README.md:151-171) with lineage.

Lineage timestamps (extracted_at/transformed_at/loaded_at, README.md:171)
are *parameters* — injected constants in tests, ``current_timestamp()`` in
production — so golden hashes stay deterministic (SURVEY.md §5.4).

Sinks: Parquet is primary (BASELINE.json spark_approach); CSV kept as an
optional parity sink with the reference's transformed_data layout
(README.md:43). Gold tables are written partitioned/bucketable — at 100 TB
bucket tblSongs by song_id so incremental upserts co-locate without a
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _with_lineage(
    df: DataFrame, transformed_at: Column, loaded_at: Column
) -> DataFrame:
    return df.withColumn("transformed_at", transformed_at).withColumn(
        "loaded_at", loaded_at
    )


def build_gold(
    silver: dict[str, DataFrame],
    transformed_at: Column | None = None,
    loaded_at: Column | None = None,
) -> dict[str, DataFrame]:
    """Assemble tblAlbum / tblArtist / tblSongs (README.md:162-169)."""
    t = transformed_at if transformed_at is not None else F.current_timestamp()
    ld = loaded_at if loaded_at is not None else F.current_timestamp()
    return {
        "tblAlbum": _with_lineage(silver["albums"], t, ld),
        "tblArtist": _with_lineage(silver["artists"], t, ld),
        "tblSongs": _with_lineage(silver["songs"], t, ld),
    }


def write_gold(
    gold: dict[str, DataFrame],
    gold_root: str,
    csv_parity: bool = False,
    fmt: str = "parquet",
) -> None:
    """Persist the star schema. Parquet primary (``fmt="orc"`` switches
    the columnar sink to ORC — both ship in Spark's JVM, no extra
    packages; the logical plan and schema are format-independent, which
    is the point of keeping the sink a one-word dial); optional CSV
    parity sink mirroring transformed_data/{album_data,artist_data,
    song_data} (reference .gitignore:37,46-48)."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"fmt must be parquet|orc, got {fmt!r}")
    csv_dirs = {
        "tblAlbum": "album_data",
        "tblArtist": "artist_data",
        "tblSongs": "song_data",
    }
    for name, df in gold.items():
        df.write.mode("overwrite").format(fmt).save(f"{gold_root}/{name}")
        if csv_parity:
            out = df
            for c, dtype in df.dtypes:
                if dtype.startswith("timestamp") or dtype == "date":
                    out = out.withColumn(c, F.col(c).cast("string"))
            out.write.mode("overwrite").option("header", True).csv(
                f"{gold_root}/transformed_data/{csv_dirs[name]}"
            )


def reference_analytics(gold: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """The four inline warehouse queries (reference README.md:206-255) over
    the star schema — the reference's authoritative analytics surface."""
    songs, artists, albums = gold["tblSongs"], gold["tblArtist"], gold["tblAlbum"]

    def count_row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("row_count")).select(
            F.lit(name).alias("table_name"), "row_count"
        )

    health = (
        count_row("tblSongs", songs)
        .unionByName(count_row("tblArtist", artists))
        .unionByName(count_row("tblAlbum", albums))
    )  # README.md:206-212

    freshness = songs.agg(
        F.date_format(F.max("loaded_at"), "yyyy-MM-dd HH:mm:ss").alias(
            "latest_load"
        )
    )  # README.md:215

    latency = songs.agg(
        F.round(
            F.avg(
                F.floor(
                    (F.unix_timestamp("loaded_at") - F.unix_timestamp("extracted_at"))
                    / 60
                )
            ),
            2,
        ).alias("avg_latency_min")
    )  # README.md:221-226 (7-day predicate applied by caller on loaded_at)

    top10 = (
        songs.join(F.broadcast(artists), "artist_id")
        .join(F.broadcast(albums), "album_id")
        .orderBy(F.desc("popularity"), F.asc("song_id"))
        .limit(10)
        .select("song_name", "artist_name", "album_name", "popularity")
    )  # README.md:234-244

    dist = (
        albums.groupBy("album_type")
        .agg(F.count(F.lit(1)).alias("n_albums"))
        .select(
            "album_type",
            "n_albums",
            F.round(
                F.col("n_albums")
                * 100.0
                / F.sum("n_albums").over(Window.partitionBy()),
                2,
            ).alias("pct"),
        )
    )  # README.md:249-255

    return {
        "health_rowcounts": health,
        "freshness": freshness,
        "avg_latency": latency,
        "top10_songs": top10,
        "album_type_distribution": dist,
    }
