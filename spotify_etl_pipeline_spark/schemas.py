"""Explicit schemas for every layer — never infer in production paths.

Raw playlist document shape mirrors the reference extractor's output
(reference: lambda/extraction/lambda_function.py:149-160 field projection and
:186-193 assembly). Star schema mirrors the warehouse DDL described at
reference README.md:151-171. Fixture schemas mirror the driver tables
(/root/testdata, FIXTURES.md §A).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Raw (bronze) zone: one nested JSON document per playlist snapshot.
# reference: lambda/extraction/lambda_function.py:186-193
# --------------------------------------------------------------------------

_EXTERNAL_URLS = T.StructType([T.StructField("spotify", T.StringType())])

ALBUM_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        # Partial dates arrive as 'YYYY' | 'YYYY-MM' | 'YYYY-MM-DD'
        # (reference: lambda_function.py:155; Spotify release_date_precision).
        T.StructField("release_date", T.StringType()),
        T.StructField("total_tracks", T.IntegerType()),
        T.StructField("album_type", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("external_urls", _EXTERNAL_URLS),
    ]
)

ARTIST_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("external_urls", _EXTERNAL_URLS),
    ]
)

TRACK_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("popularity", T.IntegerType()),
        T.StructField("explicit", T.BooleanType()),
        T.StructField("external_urls", _EXTERNAL_URLS),
        T.StructField("album", ALBUM_STRUCT),
        T.StructField("artists", T.ArrayType(ARTIST_STRUCT)),
    ]
)

RAW_PLAYLIST_SCHEMA = T.StructType(
    [
        T.StructField(
            "playlist_info",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("description", T.StringType()),
                    T.StructField(
                        "owner",
                        T.StructType(
                            [
                                T.StructField("id", T.StringType()),
                                T.StructField("display_name", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField("public", T.BooleanType()),
                    T.StructField(
                        "followers",
                        T.StructType([T.StructField("total", T.LongType())]),
                    ),
                ]
            ),
        ),
        T.StructField(
            "tracks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("added_at", T.StringType()),  # ISO-8601
                        T.StructField("track", TRACK_STRUCT),
                    ]
                )
            ),
        ),
        T.StructField("total_tracks", T.IntegerType()),
        T.StructField("extracted_at", T.StringType()),  # ISO-8601
        T.StructField("extraction_timestamp", T.StringType()),  # back-compat dup
        T.StructField("playlist_id", T.StringType()),  # 22-char base62
    ]
)

# --------------------------------------------------------------------------
# Gold zone: star schema (reference: README.md:151-171) + lineage columns
# extracted_at / transformed_at / loaded_at (README.md:171).
# --------------------------------------------------------------------------

_LINEAGE = [
    T.StructField("extracted_at", T.TimestampType()),
    T.StructField("transformed_at", T.TimestampType()),
    T.StructField("loaded_at", T.TimestampType()),
]

TBL_ALBUM_SCHEMA = T.StructType(
    [
        T.StructField("album_id", T.StringType(), False),
        T.StructField("album_name", T.StringType()),
        T.StructField("release_date", T.StringType()),
        T.StructField("release_date_parsed", T.DateType()),
        T.StructField("total_tracks", T.IntegerType()),
        T.StructField("album_type", T.StringType()),
        T.StructField("label", T.StringType()),
        *_LINEAGE,
    ]
)

TBL_ARTIST_SCHEMA = T.StructType(
    [
        T.StructField("artist_id", T.StringType(), False),
        T.StructField("artist_name", T.StringType()),
        T.StructField("artist_url", T.StringType()),
        *_LINEAGE,
    ]
)

TBL_SONGS_SCHEMA = T.StructType(
    [
        T.StructField("song_id", T.StringType(), False),
        T.StructField("song_name", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("popularity", T.IntegerType()),
        T.StructField("explicit", T.BooleanType()),
        T.StructField("song_url", T.StringType()),
        T.StructField("album_id", T.StringType()),
        T.StructField("artist_id", T.StringType()),
        T.StructField("added_at", T.TimestampType()),
        *_LINEAGE,
    ]
)

# --------------------------------------------------------------------------
# Operational tables (reference: execution logs lambda_function.py:279-290,
# error logs :245-263, failed payloads :312-321).
# --------------------------------------------------------------------------

PIPELINE_RUNS_SCHEMA = T.StructType(
    [
        T.StructField("run_ts", T.TimestampType()),
        T.StructField("playlist_id", T.StringType()),
        T.StructField("tracks_extracted", T.LongType()),
        T.StructField("output_location", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)

PIPELINE_ERRORS_SCHEMA = T.StructType(
    [
        T.StructField("error_ts", T.TimestampType()),
        T.StructField("request_id", T.StringType()),
        T.StructField("error_type", T.StringType()),
        T.StructField("error_message", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)

# --------------------------------------------------------------------------
# Driver fixture tables (FIXTURES.md §A) — explicit, for streaming reads
# (readStream requires a schema) and schema assertions in tests.
# --------------------------------------------------------------------------

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON, e.g. {"k": 87}
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_events_ts(df):
    """Normalize ``events.ts`` to a session-TZ ``timestamp`` regardless of
    how the fixture generation wrote it. Three physical encodings have been
    observed across driver generations:

    - parquet TIMESTAMP(NANOS), read as ``bigint`` under
      ``spark.sql.legacy.parquet.nanosAsLong`` → integer-div to µs then
      ``timestamp_micros`` (integer div, NOT floor(x/1000.0): epoch-nanos
      exceed 2^53, so a double quotient is inexact and floors to the wrong
      microsecond for ~1 in 8 values);
    - parquet timestamp[us] without UTC adjustment → ``timestamp_ntz``;
      the session TZ is pinned UTC so a plain cast matches the oracle's
      ``CAST(ts AS TIMESTAMP)`` exactly;
    - already ``timestamp`` → passthrough.

    Every branch is a narrow, codegen'd projection — no shuffle, scales
    linearly.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_fixture(spark, sf_dir: str, name: str):
    """Read one driver fixture table as a DataFrame.

    ``events.ts`` has shipped as TIMESTAMP(NANOS) (round 1) and as
    naive timestamp[us] (round 2+); :func:`normalize_events_ts` branches on
    the observed read dtype so both generations produce identical values.

    On the conf mutations: this is the ONE sanctioned place they happen.
    ``load_fixture`` is the driver-contract entry point and must work on a
    bare session the engine did not build; the values set here equal the
    :func:`..session.get_spark` defaults, so engine-built sessions see no
    change. ``nanosAsLong`` only affects how NANOS columns are surfaced
    (µs data reads identically either way); the UTC session timezone is
    what makes the NTZ→timestamp cast in :func:`normalize_events_ts` (and
    every window/date_format downstream) agree with the oracle's naive
    timestamps — on a bare session in a non-UTC JVM zone the cast would
    shift wall times and every events query would hash-mismatch.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return normalize_events_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
