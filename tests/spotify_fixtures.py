"""Deterministic Spotify-domain fixtures (FIXTURES.md §B1 edge cases):
duplicate track ids across runs, NULL popularity/label, an orphan album FK,
multi-artist tracks, all three release_date formats, two overlapping runs."""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

PLAYLIST_ID = "37i9dQZF1DXcBWIGoYBM5M"  # 22 chars
PLAYLIST_URL = f"https://open.spotify.com/playlist/{PLAYLIST_ID}?si=abc"

RUN1_TS = datetime(2024, 3, 1, 2, 0, 0, tzinfo=timezone.utc)
RUN2_TS = datetime(2024, 3, 2, 2, 0, 0, tzinfo=timezone.utc)


def _ext(url: str) -> dict[str, Any]:
    return {"spotify": url}


def _album(aid: str, name: str, release_date: str, label: str | None) -> dict:
    return {
        "id": aid,
        "name": name,
        "release_date": release_date,  # 'YYYY' | 'YYYY-MM' | 'YYYY-MM-DD'
        "total_tracks": 10,
        "album_type": "album" if name != "Single One" else "single",
        "label": label,
        "external_urls": _ext(f"https://open.spotify.com/album/{aid}"),
    }


def _artist(aid: str, name: str) -> dict:
    return {
        "id": aid,
        "name": name,
        "external_urls": _ext(f"https://open.spotify.com/artist/{aid}"),
    }


def _item(added_at: str, track_id: str, name: str, pop: int | None,
          album: dict, artists: list[dict], duration: int = 200_000) -> dict:
    return {
        "added_at": added_at,
        "track": {
            "id": track_id,
            "name": name,
            "duration_ms": duration,
            "popularity": pop,
            "explicit": False,
            "external_urls": _ext(f"https://open.spotify.com/track/{track_id}"),
            "album": album,
            "artists": artists,
        },
    }


ALB_FULL = _album("alb_full_date_000000001", "Full Date LP", "2020-05-17", "LabelA")
ALB_YM = _album("alb_year_month_0000001", "Year Month LP", "2019-11", "LabelB")
ALB_Y = _album("alb_year_only_00000001", "Year Only LP", "1998", None)  # NULL label
ALB_SINGLE = _album("alb_single_0000000001", "Single One", "2023-01-02", "LabelA")

ART_SOLO = _artist("art_solo_000000000001", "Solo Artist")
ART_DUO_A = _artist("art_duo_a_00000000001", "Duo Member A")
ART_DUO_B = _artist("art_duo_b_00000000001", "Duo Member B")

RUN1_ITEMS = [
    _item("2024-02-01T10:00:00Z", "trk_keep_000000000001", "Keeper", 80,
          ALB_FULL, [ART_SOLO]),
    _item("2024-02-02T10:00:00Z", "trk_dup_0000000000001", "Dup v1", 50,
          ALB_YM, [ART_DUO_A, ART_DUO_B]),  # multi-artist; re-extracted in run2
    _item("2024-02-03T10:00:00Z", "trk_nullpop_000000001", "No Popularity", None,
          ALB_Y, [ART_SOLO]),  # NULL popularity + NULL label album
]

RUN2_ITEMS = [
    # same track id, refreshed popularity → latest-wins must keep this one
    _item("2024-02-02T10:00:00Z", "trk_dup_0000000000001", "Dup v2", 55,
          ALB_YM, [ART_DUO_A, ART_DUO_B]),
    _item("2024-03-01T09:00:00Z", "trk_new_000000000001x", "Run2 New", 70,
          ALB_SINGLE, [ART_DUO_B]),
]


def playlist_info() -> dict:
    return {
        "name": "Fixture Mix",
        "description": "golden-test playlist",
        "owner": {"id": "owner1", "display_name": "Owner One"},
        "public": True,
        "followers": {"total": 123},
    }


def fake_fetcher_for(items: list[dict]):
    """Offline stand-in for the Spotify API: honors limit/offset params."""

    def fetch(endpoint: str, params: dict[str, Any]) -> dict[str, Any]:
        if endpoint == "playlist":
            return playlist_info()
        offset, limit = params["offset"], params["limit"]
        page = items[offset : offset + limit]
        more = offset + limit < len(items)
        return {"items": page, "next": "more" if more else None}

    return fetch


def write_bronze_fixture(bronze_root: str) -> list[str]:
    """Run the extractor twice (two snapshot docs) → bronze zone paths."""
    from spotify_etl_pipeline_spark.sources.ingest import PlaylistExtractor

    paths = []
    for ts, items in [(RUN1_TS, RUN1_ITEMS), (RUN2_TS, RUN2_ITEMS)]:
        ex = PlaylistExtractor(
            bronze_root=bronze_root,
            fetcher=fake_fetcher_for(items),
            now=lambda ts=ts: ts,
            page_size=2,  # force multi-page pagination in the fixture
        )
        paths.append(ex.extract(PLAYLIST_URL).output_path)
    return paths


def write_page_files(pages_dir: str, items: list[dict], per_page: int = 2) -> int:
    """Materialize API 'pages' for the playlist_pages DataSource."""
    d = Path(pages_dir)
    d.mkdir(parents=True, exist_ok=True)
    n = 0
    for i in range(0, len(items), per_page):
        (d / f"page_{n:05d}.json").write_text(
            json.dumps({"items": items[i : i + per_page]})
        )
        n += 1
    return n
