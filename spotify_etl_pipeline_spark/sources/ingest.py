"""Playlist extraction: the reference's implemented stage, re-expressed.

Mirrors the semantics of reference lambda/extraction/lambda_function.py —
URL validation (:83-92), metadata point-lookup with field projection
(:119-135), offset pagination limit=100 (:137-183), document assembly
(:186-193), stage-routed sink paths (:232-243), execution/error logging
(:279-290, :245-263), dead-letter payloads (:312-321) — with the network
boundary injected as a callable so the pipeline is testable offline (this
container has no network; a real deployment passes a spotipy/requests-backed
fetcher).

Spark shape (SURVEY.md §3.1): the pagination loop is inherently sequential
driver-side work (rate-limited API, offset cursor); the *distributed*
lifecycle starts at the bronze write. At scale you run many extractors in
parallel upstream (one per playlist) — exactly the reference's Lambda
concurrency model — and Spark takes over from the landing zone.
"""

from __future__ import annotations

import json
import re
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

PAGE_SIZE = 100  # reference lambda_function.py:140
PLAYLIST_ID_RE = re.compile(r"playlist/([0-9A-Za-z]{22})")

# API field projection — the reference's manual projection pushdown
# (lambda_function.py:146-160); kept as documentation of the source columns.
TRACK_FIELDS = (
    "items(added_at,track(id,name,duration_ms,popularity,explicit,"
    "external_urls,album(id,name,release_date,total_tracks,album_type,label,"
    "external_urls),artists(id,name,external_urls))),next"
)
PLAYLIST_FIELDS = "name,description,owner,public,followers"  # :122


class InvalidPlaylistUrlError(ValueError):
    pass


def handler_response(run: Callable[[], Any]) -> dict[str, Any]:
    """Lambda-handler response envelope (reference
    lambda_function.py:372-401): run the extraction thunk and map the
    outcome to the reference's statusCode/body contract — 200 with the
    result payload, 400 + ``ETL_ERROR`` for domain failures (our
    ``InvalidPlaylistUrlError`` plays the reference's ``SpotifyETLError``
    role), 500 + ``INTERNAL_ERROR`` (message withheld, as the reference
    does) for anything unexpected.
    """
    try:
        result = run()
        return {
            "statusCode": 200,
            "body": json.dumps(
                {"message": "Playlist processed successfully", "data": result},
                default=str,
            ),
        }
    except InvalidPlaylistUrlError as exc:
        return {
            "statusCode": 400,
            "body": json.dumps({"error": "ETL_ERROR", "message": str(exc)}),
        }
    except Exception:
        return {
            "statusCode": 500,
            "body": json.dumps(
                {"error": "INTERNAL_ERROR", "message": "An unexpected error occurred"}
            ),
        }


def extract_playlist_id(playlist_link: str) -> str:
    """URL → 22-char id (reference lambda_function.py:80-99 semantics)."""
    if not playlist_link:
        raise InvalidPlaylistUrlError("empty playlist link")
    if "spotify.com/playlist/" not in playlist_link:
        raise InvalidPlaylistUrlError(f"not a playlist URL: {playlist_link!r}")
    m = PLAYLIST_ID_RE.search(playlist_link)
    if not m:
        raise InvalidPlaylistUrlError(f"no 22-char id in {playlist_link!r}")
    return m.group(1)


# fetcher(endpoint, params) -> dict; endpoint in {"playlist", "tracks"}.
Fetcher = Callable[[str, dict[str, Any]], dict[str, Any]]


def _no_network_fetcher(endpoint: str, params: dict[str, Any]) -> dict[str, Any]:
    raise NotImplementedError(
        "no network access in this environment — inject a fetcher "
        "(tests use fixtures.fake_fetcher; production uses "
        "sources.live_fetcher.make_live_fetcher)"
    )


@dataclass
class ExtractionResult:
    document: dict[str, Any]
    output_path: str
    run_log: dict[str, Any]


@dataclass
class PlaylistExtractor:
    """Drives one playlist snapshot extraction into the bronze zone."""

    bronze_root: str
    fetcher: Fetcher = field(default=_no_network_fetcher)
    market: str = "MY"  # source-side predicate, reference :161
    page_size: int = PAGE_SIZE  # reference :140; overridable for tests
    now: Callable[[], datetime] = field(
        default=lambda: datetime.now(timezone.utc)
    )

    def extract(self, playlist_link: str) -> ExtractionResult:
        ts = self.now()
        playlist_id = "unknown"
        try:
            # inside the try: an invalid URL must reach the error-log and
            # dead-letter sinks like every other failure (reference
            # :245-263, :312-321), not bypass them
            playlist_id = extract_playlist_id(playlist_link)
            info = self.fetcher(
                "playlist", {"playlist_id": playlist_id, "fields": PLAYLIST_FIELDS}
            )
            tracks: list[dict[str, Any]] = []
            offset = 0
            while True:  # offset pagination, reference :137-183
                page = self.fetcher(
                    "tracks",
                    {
                        "playlist_id": playlist_id,
                        "fields": TRACK_FIELDS,
                        "limit": self.page_size,
                        "offset": offset,
                        "market": self.market,
                    },
                )
                tracks.extend(page.get("items", []))
                if not page.get("next"):
                    break
                offset += self.page_size
            doc = {  # assembly, reference :186-193
                "playlist_info": info,
                "tracks": tracks,
                "total_tracks": len(tracks),
                "extracted_at": ts.isoformat(),
                "extraction_timestamp": ts.isoformat(),  # back-compat dup :191
                "playlist_id": playlist_id,
            }
            path = self._stage_path("to_processed", playlist_id, ts)
            self._write_json(path, doc)
            run_log = {
                "run_ts": ts.isoformat(),
                "playlist_id": playlist_id,
                "tracks_extracted": len(tracks),
                "output_location": str(path),
                "status": "success",
            }
            self._write_json(
                Path(self.bronze_root)
                / "logs"
                / "execution_logs"
                / f"run_{ts.strftime('%Y%m%d_%H%M%S')}_{playlist_id}.json",
                run_log,
            )
            return ExtractionResult(doc, str(path), run_log)
        except Exception as exc:  # error + dead-letter sinks, :245-263,:312-321
            err = {
                "error_ts": ts.isoformat(),
                "request_id": str(uuid.uuid4()),
                "error_type": type(exc).__name__,
                "error_message": str(exc),
                "stage": "extraction",
                "payload": json.dumps({"playlist_link": playlist_link}),
            }
            self._write_json(
                Path(self.bronze_root)
                / "logs"
                / "error_logs"
                / f"error_{ts.strftime('%Y%m%d_%H%M%S')}.json",
                err,
            )
            self._write_json(
                self._stage_path("failed_extraction", playlist_id, ts), err
            )
            raise

    def _stage_path(self, stage: str, playlist_id: str, ts: datetime) -> Path:
        # raw_data/{stage}/playlist_{id}_{yyyymmdd_hhmmss}.json (reference :232-243)
        return (
            Path(self.bronze_root)
            / "raw_data"
            / stage
            / f"playlist_{playlist_id}_{ts.strftime('%Y%m%d_%H%M%S')}.json"
        )

    @staticmethod
    def _write_json(path: Path, payload: dict[str, Any]) -> None:
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(
            json.dumps(payload, indent=2, default=str, ensure_ascii=False)
        )
