"""Scalar function helpers (SURVEY.md §2.7)."""

from .scalar import (  # noqa: F401
    minutes_between,
    parse_partial_date,
    playlist_id_from_url,
    valid_playlist_url,
)
