"""Scalar column helpers re-expressing the reference's string/date logic.

All built-in ``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd; no
Python UDFs anywhere on these paths (SURVEY.md §2.7, F1-F12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PLAYLIST_ID_RE = r"playlist/([0-9A-Za-z]{22})"


def playlist_id_from_url(url: Column | str) -> Column:
    """Extract the 22-char base62 playlist id from a Spotify URL.

    Re-expresses ``link.split("/")[-1].split("?")[0]`` (reference:
    lambda/extraction/lambda_function.py:89) as a single regexp — cleaner and
    codegen-friendly (SURVEY.md F1).
    """
    return F.regexp_extract(F.col(url) if isinstance(url, str) else url, PLAYLIST_ID_RE, 1)


def valid_playlist_url(url: Column | str) -> Column:
    """Boolean predicate: URL validation rules of the reference.

    Non-empty, contains ``spotify.com/playlist/``, id length == 22
    (reference: lambda_function.py:83-92; SURVEY.md P3/F2/F3).
    """
    c = F.col(url) if isinstance(url, str) else url
    return (
        c.isNotNull()
        & (c != "")
        & c.contains("spotify.com/playlist/")
        & (F.length(playlist_id_from_url(c)) == 22)
    )


def parse_partial_date(col: Column | str) -> Column:
    """Parse a possibly-partial date string: 'YYYY' | 'YYYY-MM' | 'YYYY-MM-DD'.

    Spotify ``release_date`` precision semantics (reference:
    lambda_function.py:155; SURVEY.md F12). Missing parts default to the first
    month/day, matching ``to_date(concat(...))`` semantics in ANSI SQL.
    """
    c = F.col(col) if isinstance(col, str) else col
    # try_to_date (not to_date): under ANSI mode a format mismatch must yield
    # NULL for the coalesce chain, not an error.
    return F.coalesce(
        F.try_to_date(c, "yyyy-MM-dd"),
        F.try_to_date(c, "yyyy-MM"),
        F.try_to_date(c, "yyyy"),
    )


def minutes_between(start: Column | str, end: Column | str) -> Column:
    """Whole-minute difference end-start — Snowflake TIMESTAMPDIFF(MINUTE,..)

    (reference: README.md:223; SURVEY.md F6). Uses unix-second arithmetic so
    the result is an exact integer truncated toward zero, matching
    TIMESTAMPDIFF.
    """
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return F.floor((F.unix_timestamp(e) - F.unix_timestamp(s)) / 60).cast("long")
