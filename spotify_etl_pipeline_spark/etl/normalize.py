"""Bronze → silver normalization (reference README.md:42-43, 49;
lambda/transformation/README.md:8-11 — specified, no code in the checkout).

One ``explode(tracks)`` plus three select/dedup pipelines produce the
albums/artists/songs tables. Everything is narrow except the latest-wins
dedup (one exchange on the primary key) — at 100 TB that exchange is the
only shuffle in the whole normalize stage, and it's on a high-cardinality
key (no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.scalar import parse_partial_date
from ..schemas import RAW_PLAYLIST_SCHEMA


def read_bronze(spark: SparkSession, bronze_glob: str) -> DataFrame:
    """Raw zone scan with the explicit document schema — never inferred
    (SURVEY.md §1.4); multiLine because each file is one pretty-printed doc
    (reference lambda_function.py:211 json.dumps(indent=2))."""
    return spark.read.schema(RAW_PLAYLIST_SCHEMA).option("multiLine", True).json(
        bronze_glob
    )


def exploded_tracks(bronze: DataFrame) -> DataFrame:
    """One row per (document, track) — the normalize workhorse (P5)."""
    return bronze.select(
        "playlist_id",
        F.to_timestamp("extracted_at").alias("extracted_at"),
        F.explode("tracks").alias("t"),
    ).select(
        "playlist_id",
        "extracted_at",
        F.to_timestamp(F.col("t.added_at")).alias("added_at"),
        F.col("t.track").alias("track"),
    )


def _latest_wins(df: DataFrame, pk: str) -> DataFrame:
    """Dedup keeping the most recently extracted row per key (A5/T3 —
    reference README.md:49 'Deduplication' + :51 incremental semantics).

    Ties on extracted_at (two extractors snapshotting the same instant)
    break on the full remaining-column struct so repeated runs over the
    same bronze input always keep the same row — golden hashes must not
    flap (SURVEY.md §5.4)."""
    others = [c for c in df.columns if c != pk]
    w = Window.partitionBy(pk).orderBy(
        F.desc("extracted_at"), F.desc(F.struct(*others))
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def normalize_documents(bronze: DataFrame) -> dict[str, DataFrame]:
    """Produce the three silver tables from raw documents.

    NULL handling (P4): rows with a NULL primary key are dropped (they can't
    join the star schema); attribute NULLs are preserved for the warehouse.
    """
    t = exploded_tracks(bronze)

    albums = _latest_wins(
        t.select(
            F.col("track.album.id").alias("album_id"),
            F.col("track.album.name").alias("album_name"),
            F.col("track.album.release_date").alias("release_date"),
            parse_partial_date(F.col("track.album.release_date")).alias(
                "release_date_parsed"
            ),
            F.col("track.album.total_tracks").alias("total_tracks"),
            F.col("track.album.album_type").alias("album_type"),
            F.col("track.album.label").alias("label"),
            "extracted_at",
        ).filter(F.col("album_id").isNotNull()),
        "album_id",
    )

    artists = _latest_wins(
        t.select(
            F.explode("track.artists").alias("a"), "extracted_at"
        ).select(
            F.col("a.id").alias("artist_id"),
            F.col("a.name").alias("artist_name"),
            F.col("a.external_urls.spotify").alias("artist_url"),
            "extracted_at",
        ).filter(F.col("artist_id").isNotNull()),
        "artist_id",
    )

    songs = _latest_wins(
        t.select(
            F.col("track.id").alias("song_id"),
            F.col("track.name").alias("song_name"),
            F.col("track.duration_ms").alias("duration_ms"),
            F.col("track.popularity").alias("popularity"),
            F.col("track.explicit").alias("explicit"),
            F.col("track.external_urls.spotify").alias("song_url"),
            F.col("track.album.id").alias("album_id"),
            # flattened per-track doc keeps the primary artist
            # (reference lambda/extraction/README.md:234-255); try_element_at:
            # local/unavailable tracks have artists=[] and ANSI element_at
            # would abort the whole job on them
            F.try_element_at(F.col("track.artists"), F.lit(1))["id"].alias(
                "artist_id"
            ),
            "added_at",
            "extracted_at",
        ).filter(F.col("song_id").isNotNull()),
        "song_id",
    )

    return {"albums": albums, "artists": artists, "songs": songs}
