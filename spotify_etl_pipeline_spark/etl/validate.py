"""Data validation (reference README.md:49: dedup, NULL handling,
referential integrity) + dead-letter routing (lambda_function.py:312-321).

Each check is a declarative DataFrame op returning violation rows; callers
route them to the failed zone (S12) and proceed with the clean subset. The
RI anti-joins carry no broadcast hint: dims can scale with the warehouse,
so AQE broadcasts the distinct-PK side only when it is actually small.
The null checks are free predicates on the normalize pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_key_violations(df: DataFrame, pk: str) -> DataFrame:
    """Rows whose primary key is NULL (must be quarantined, not loaded)."""
    return df.filter(F.col(pk).isNull())


def referential_violations(
    fact: DataFrame, dim: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Fact rows whose FK resolves to no dim PK — left_anti on the dim
    (reference README.md:49 'referential integrity'; SURVEY.md J2)."""
    return fact.filter(F.col(fk).isNotNull()).join(
        dim.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )


def duplicate_key_rows(df: DataFrame, pk: str) -> DataFrame:
    """Key groups with more than one row after normalize (dedup failure)."""
    return (
        df.groupBy(pk)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def validate_star(gold: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """All star-schema checks in one pass: per-table violation DataFrames
    (empty == healthy)."""
    songs, albums, artists = gold["tblSongs"], gold["tblAlbum"], gold["tblArtist"]
    return {
        "songs_null_pk": null_key_violations(songs, "song_id"),
        "albums_null_pk": null_key_violations(albums, "album_id"),
        "artists_null_pk": null_key_violations(artists, "artist_id"),
        "songs_dup_pk": duplicate_key_rows(songs, "song_id"),
        "songs_orphan_album": referential_violations(
            songs, albums, "album_id", "album_id"
        ),
        "songs_orphan_artist": referential_violations(
            songs, artists, "artist_id", "artist_id"
        ),
    }
