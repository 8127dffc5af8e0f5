"""Live Spotify Web API fetcher — the production implementation of the
``Fetcher`` callable that :class:`.ingest.PlaylistExtractor` injects.

Re-expresses the reference's real network path (reference
lambda/extraction/lambda_function.py:41-69 — refresh-token → access-token
exchange against ``accounts.spotify.com/api/token``; :119-135 — playlist
metadata GET with field projection; :137-183 — offset-paginated tracks
GET). The reference calls ``requests`` directly from inside its pagination
loop; here the HTTP transport is a constructor argument so the exact same
token/retry/endpoint logic is golden-testable offline (this container has
no network — every test injects a fake transport).

Beyond the reference's behavior (fail on any non-200,
lambda_function.py:168-170) this adds the two retry cases a long-running
extractor meets in production:

- **401 once** → token expired mid-run: re-exchange and replay the request
  (the reference fetches one token per invocation and would fail here);
- **429** → rate limited: honor ``Retry-After`` (bounded by
  ``max_retry_after``) and replay, at most ``max_retries`` times.

Auth supports both OAuth grants: ``refresh_token`` (the reference's —
needed for private playlists) and ``client_credentials`` (public data,
no user consent step). Network execution stays env-gated: nothing in this
module opens a connection until the returned callable is invoked.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Protocol

TOKEN_URL = "https://accounts.spotify.com/api/token"  # reference :45
API_ROOT = "https://api.spotify.com/v1"  # reference :119, :143
TIMEOUT_S = 30  # reference :53, :131, :167


class FetchError(RuntimeError):
    """Raised for token failures and non-retryable API responses
    (the reference's ``SpotifyETLError`` role, lambda_function.py:56)."""


class _Response(Protocol):
    status_code: int
    text: str
    headers: dict[str, str]

    def json(self) -> Any: ...


class Transport(Protocol):
    """The slice of ``requests``' API this module uses — satisfied by the
    ``requests`` module itself and by the test fakes."""

    def get(self, url: str, *, headers: dict, params: dict,
            timeout: float) -> _Response: ...

    def post(self, url: str, *, data: dict, auth: tuple,
             timeout: float) -> _Response: ...


def _default_transport() -> Transport:
    import requests  # deferred: keeps the module importable anywhere

    return requests


@dataclass
class SpotifyFetcher:
    """``fetcher(endpoint, params) -> dict`` over the live Web API.

    ``endpoint`` is the extractor's two-verb vocabulary (ingest.py): either
    ``"playlist"`` (metadata point-lookup) or ``"tracks"`` (one page of the
    offset pagination loop); anything else is a programming error.
    """

    client_id: str
    client_secret: str
    refresh_token: str | None = None  # None -> client_credentials grant
    transport: Transport = field(default_factory=_default_transport)
    max_retries: int = 3
    max_retry_after: float = 30.0
    sleep: Any = time.sleep  # injectable for tests
    _access_token: str | None = field(default=None, init=False, repr=False)

    # -- auth ---------------------------------------------------------
    def _exchange_token(self) -> str:
        """Token exchange (reference lambda_function.py:41-69)."""
        if self.refresh_token is not None:
            data = {
                "grant_type": "refresh_token",
                "refresh_token": self.refresh_token,
            }
        else:
            data = {"grant_type": "client_credentials"}
        resp = self.transport.post(
            TOKEN_URL,
            data=data,
            auth=(self.client_id, self.client_secret),
            timeout=TIMEOUT_S,
        )
        if resp.status_code != 200:
            raise FetchError(f"Token refresh failed: {resp.text}")
        self._access_token = resp.json()["access_token"]
        return self._access_token

    def _token(self) -> str:
        return self._access_token or self._exchange_token()

    # -- fetch --------------------------------------------------------
    def __call__(self, endpoint: str, params: dict[str, Any]) -> dict[str, Any]:
        playlist_id = params["playlist_id"]
        if endpoint == "playlist":  # reference :119-135
            url = f"{API_ROOT}/playlists/{playlist_id}"
        elif endpoint == "tracks":  # reference :143
            url = f"{API_ROOT}/playlists/{playlist_id}/tracks"
        else:
            raise ValueError(f"unknown endpoint {endpoint!r}")
        query = {k: v for k, v in params.items() if k != "playlist_id"}

        retried_auth = False
        attempts = 0
        while True:
            resp = self.transport.get(
                url,
                headers={"Authorization": f"Bearer {self._token()}"},
                params=query,
                timeout=TIMEOUT_S,
            )
            if resp.status_code == 200:
                return resp.json()
            if resp.status_code == 401 and not retried_auth:
                # token expired mid-pagination: one re-exchange, replay
                retried_auth = True
                self._access_token = None
                continue
            if resp.status_code == 429 and attempts < self.max_retries:
                attempts += 1
                wait = min(
                    float(resp.headers.get("Retry-After", "1")),
                    self.max_retry_after,
                )
                self.sleep(wait)
                continue
            # the reference's contract: any other non-200 is fatal
            # (lambda_function.py:168-170)
            raise FetchError(
                f"{endpoint} fetch failed ({resp.status_code}): {resp.text}"
            )


def make_live_fetcher(
    client_id: str,
    client_secret: str,
    refresh_token: str | None = None,
    **kwargs: Any,
) -> SpotifyFetcher:
    """Factory matching the ``Fetcher`` signature expected by
    :class:`.ingest.PlaylistExtractor`::

        extractor = PlaylistExtractor(
            bronze_root=...,
            fetcher=make_live_fetcher(cid, secret, refresh_token=rt),
        )
    """
    return SpotifyFetcher(client_id, client_secret, refresh_token, **kwargs)
