"""Live-fetcher golden tests — the HTTP layer of the reference's real
network path (reference lambda_function.py:41-69, :119-183) exercised
offline through an injected fake transport.

The key equivalence: PlaylistExtractor driven by SpotifyFetcher over the
fake HTTP transport must assemble the SAME bronze document as when driven
by the plain in-process fake_fetcher_for — i.e. the live module adds auth
and transport and changes nothing about extraction semantics.
"""

import json
import os

import pytest

import tests.spotify_fixtures as FX
from spotify_etl_pipeline_spark.sources.ingest import PlaylistExtractor
from spotify_etl_pipeline_spark.sources.live_fetcher import (
    API_ROOT,
    TOKEN_URL,
    FetchError,
    SpotifyFetcher,
    make_live_fetcher,
)


class FakeResponse:
    def __init__(self, status_code, payload=None, headers=None, text=""):
        self.status_code = status_code
        self._payload = payload
        self.headers = headers or {}
        self.text = text or json.dumps(payload)

    def json(self):
        return self._payload


class FakeSpotifyHTTP:
    """Emulates accounts.spotify.com + api.spotify.com for one playlist.

    Serves FX items with real limit/offset pagination; counts token
    exchanges; can inject scripted failures (status, headers) ahead of
    the real answer to exercise the retry paths.
    """

    def __init__(self, items, token="tok-1"):
        self.items = items
        self.tokens_issued = 0
        self.token = token
        self.scripted = []  # list[FakeResponse] served before real answers
        self.post_calls = []
        self.get_calls = []

    def post(self, url, *, data, auth, timeout):
        assert url == TOKEN_URL
        self.post_calls.append({"data": data, "auth": auth})
        self.tokens_issued += 1
        return FakeResponse(
            200, {"access_token": f"{self.token}-{self.tokens_issued}"}
        )

    def get(self, url, *, headers, params, timeout):
        self.get_calls.append({"url": url, "headers": headers, "params": params})
        if self.scripted:
            return self.scripted.pop(0)
        expect = f"Bearer {self.token}-{self.tokens_issued}"
        if headers.get("Authorization") != expect:
            return FakeResponse(401, {"error": "expired"}, text="expired")
        if url.endswith("/tracks"):
            offset, limit = params["offset"], params["limit"]
            page = self.items[offset : offset + limit]
            more = offset + limit < len(self.items)
            return FakeResponse(
                200, {"items": page, "next": "more" if more else None}
            )
        return FakeResponse(200, FX.playlist_info())


def _fetcher(http, **kw):
    kw.setdefault("refresh_token", "rt-1")
    return SpotifyFetcher("cid", "secret", transport=http, sleep=lambda s: None, **kw)


def test_extractor_document_matches_offline_fake(tmp_path):
    """Same bronze document whether fetched via fake HTTP or in-process fake."""
    http = FakeSpotifyHTTP(FX.RUN1_ITEMS)
    live = PlaylistExtractor(
        bronze_root=str(tmp_path / "live"),
        fetcher=_fetcher(http),
        now=lambda: FX.RUN1_TS,
        page_size=2,
    ).extract(FX.PLAYLIST_URL)
    offline = PlaylistExtractor(
        bronze_root=str(tmp_path / "off"),
        fetcher=FX.fake_fetcher_for(FX.RUN1_ITEMS),
        now=lambda: FX.RUN1_TS,
        page_size=2,
    ).extract(FX.PLAYLIST_URL)
    assert live.document == offline.document
    # one token exchange covered metadata + every page
    assert http.tokens_issued == 1
    # pagination hit the reference's endpoint with limit/offset/market
    track_calls = [c for c in http.get_calls if c["url"].endswith("/tracks")]
    assert track_calls[0]["params"]["limit"] == 2
    assert track_calls[0]["params"]["offset"] == 0
    assert track_calls[1]["params"]["offset"] == 2
    assert track_calls[0]["url"] == (
        f"{API_ROOT}/playlists/{FX.PLAYLIST_ID}/tracks"
    )


def test_refresh_token_grant_payload():
    http = FakeSpotifyHTTP(FX.RUN1_ITEMS)
    _fetcher(http)("playlist", {"playlist_id": "x" * 22, "fields": "name"})
    assert http.post_calls[0]["data"] == {
        "grant_type": "refresh_token",
        "refresh_token": "rt-1",
    }
    assert http.post_calls[0]["auth"] == ("cid", "secret")


def test_client_credentials_grant_payload():
    http = FakeSpotifyHTTP(FX.RUN1_ITEMS)
    _fetcher(http, refresh_token=None)(
        "playlist", {"playlist_id": "x" * 22, "fields": "name"}
    )
    assert http.post_calls[0]["data"] == {"grant_type": "client_credentials"}


def test_expired_token_mid_run_reexchanges_once():
    http = FakeSpotifyHTTP(FX.RUN1_ITEMS)
    f = _fetcher(http)
    f("playlist", {"playlist_id": "x" * 22, "fields": "name"})
    http.token = "tok-2"  # server now rejects tok-1-* bearer
    http.tokens_issued = 0  # next exchange issues tok-2-1
    out = f("tracks", {"playlist_id": "x" * 22, "limit": 2, "offset": 0})
    assert out["items"] == FX.RUN1_ITEMS[:2]
    assert http.tokens_issued == 1  # exactly one re-exchange


def test_second_401_is_fatal():
    http = FakeSpotifyHTTP(FX.RUN1_ITEMS)
    http.scripted = [
        FakeResponse(401, {"error": "expired"}, text="expired"),
        FakeResponse(401, {"error": "expired"}, text="expired"),
    ]
    with pytest.raises(FetchError, match="401"):
        _fetcher(http)("playlist", {"playlist_id": "x" * 22, "fields": "n"})


def test_rate_limit_honors_bounded_retry_after():
    http = FakeSpotifyHTTP(FX.RUN1_ITEMS)
    http.scripted = [
        FakeResponse(429, {}, headers={"Retry-After": "2"}, text="slow down"),
        FakeResponse(429, {}, headers={"Retry-After": "9999"}, text="slow down"),
    ]
    waits = []
    f = _fetcher(http)
    f.sleep = waits.append
    out = f("tracks", {"playlist_id": "x" * 22, "limit": 2, "offset": 0})
    assert out["items"] == FX.RUN1_ITEMS[:2]
    assert waits == [2.0, 30.0]  # second wait clamped to max_retry_after


def test_rate_limit_exhausts_retries():
    http = FakeSpotifyHTTP(FX.RUN1_ITEMS)
    http.scripted = [
        FakeResponse(429, {}, headers={"Retry-After": "1"}, text="slow")
        for _ in range(4)
    ]
    with pytest.raises(FetchError, match="429"):
        _fetcher(http)("tracks", {"playlist_id": "x" * 22, "limit": 2, "offset": 0})


def test_server_error_is_fatal_like_reference():
    http = FakeSpotifyHTTP(FX.RUN1_ITEMS)
    http.scripted = [FakeResponse(500, {}, text="boom")]
    with pytest.raises(FetchError, match="500"):
        _fetcher(http)("playlist", {"playlist_id": "x" * 22, "fields": "n"})


def test_token_exchange_failure_is_fatal():
    class BadAuthHTTP(FakeSpotifyHTTP):
        def post(self, url, *, data, auth, timeout):
            return FakeResponse(400, {"error": "invalid_grant"}, text="bad grant")

    with pytest.raises(FetchError, match="Token refresh failed"):
        _fetcher(BadAuthHTTP(FX.RUN1_ITEMS))(
            "playlist", {"playlist_id": "x" * 22, "fields": "n"}
        )


def test_unknown_endpoint_raises():
    with pytest.raises(ValueError, match="unknown endpoint"):
        _fetcher(FakeSpotifyHTTP([]))("albums", {"playlist_id": "x" * 22})


def test_factory_matches_fetcher_signature():
    f = make_live_fetcher("cid", "secret")
    assert callable(f) and f.refresh_token is None


@pytest.mark.skipif(
    os.environ.get("SPOTIFY_LIVE") != "1"
    or not os.environ.get("SPOTIFY_CLIENT_ID")
    or not os.environ.get("SPOTIFY_CLIENT_SECRET"),
    reason="live-network smoke: opt in with SPOTIFY_LIVE=1 plus "
    "SPOTIFY_CLIENT_ID/SPOTIFY_CLIENT_SECRET (and optionally "
    "SPOTIFY_REFRESH_TOKEN / SPOTIFY_PLAYLIST_URL); this container has "
    "no network, so the default run exercises only the transport fakes",
)
def test_live_api_smoke(tmp_path):
    """Drive the REAL Spotify API through the exact same golden assertions
    the offline fakes satisfy (reference semantics:
    lambda_function.py:41-69 token exchange, :119-135 playlist metadata,
    :137-183 pagination): client-credentials (or refresh-token) exchange,
    one bronze document with the reference's envelope, page-complete
    tracks."""
    from spotify_etl_pipeline_spark.sources.ingest import PlaylistExtractor
    from spotify_etl_pipeline_spark.sources.live_fetcher import (
        make_live_fetcher,
    )

    url = os.environ.get(
        "SPOTIFY_PLAYLIST_URL",
        # Spotify's own long-lived public "Top 50 - Global" playlist
        "https://open.spotify.com/playlist/37i9dQZEVXbMDoHDwVN2tF",
    )
    fetcher = make_live_fetcher(
        os.environ["SPOTIFY_CLIENT_ID"],
        os.environ["SPOTIFY_CLIENT_SECRET"],
        refresh_token=os.environ.get("SPOTIFY_REFRESH_TOKEN"),
    )
    res = PlaylistExtractor(
        bronze_root=str(tmp_path / "bronze"), fetcher=fetcher
    ).extract(url)
    doc = res.document
    # the same envelope the golden offline test pins (reference :186-193)
    assert doc["playlist_id"] == url.rsplit("/", 1)[-1].split("?")[0]
    assert "name" in doc["playlist_info"]
    assert isinstance(doc["tracks"], list) and doc["tracks"]
    assert all("track" in t for t in doc["tracks"])
    assert doc["total_tracks"] == len(doc["tracks"])
    # the bronze file landed in the stage-routed path
    assert os.path.exists(res.output_path)
