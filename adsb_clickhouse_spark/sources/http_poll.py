"""Generic HTTP JSON poll source (SURVEY.md §2.1 S5, §2.9 ST6).

The reference's scrapers poll flight-data HTTP APIs on a cadence, parse
the aircraft array, drop rows without lat/lon, stamp source+scrape_time,
and back off exponentially on consecutive errors (adsb-scraper/
scraper.py:174-286, 726-753 — behavior reference only; this is an
independent stdlib implementation).

This stays an *out-of-engine producer*: it yields plain dict rows that
feed either a Kafka topic (sources/producer.py) or a JSON-lines drop
directory consumed by the streaming cascade. The engine proper never
blocks on HTTP.
"""

from __future__ import annotations

import inspect
import json
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator
from datetime import datetime, timezone


class OAuth2ClientCredentials:
    """Client-credentials token flow for authenticated poll sources.

    Behavior mirrors the reference's OpenSky OAuth2 handler
    (adsb-scraper/scraper.py:516-562): POST a form-encoded
    ``grant_type=client_credentials`` request to the token endpoint,
    cache the access token, and refresh it ``expiry_margin_s`` before the
    server-reported expiry (the reference caches 30-minute tokens for 25
    minutes). ``post`` and ``clock`` are injectable so the flow is fully
    unit-testable offline; ``invalidate()`` supports refresh-on-401.
    """

    def __init__(
        self,
        token_url: str,
        client_id: str,
        client_secret: str,
        *,
        expiry_margin_s: float = 300.0,
        timeout_s: float = 10.0,
        post: Callable[[str, dict, float], bytes] | None = None,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.token_url = token_url
        self.client_id = client_id
        self.client_secret = client_secret
        self.expiry_margin_s = expiry_margin_s
        self.timeout_s = timeout_s
        self._post = post or self._default_post
        self._clock = clock
        self._token: str | None = None
        self._expires_at: float | None = None

    @staticmethod
    def _default_post(url: str, data: dict, timeout_s: float) -> bytes:
        body = urllib.parse.urlencode(data).encode()
        req = urllib.request.Request(
            url,
            data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:  # noqa: S310
            return resp.read()

    def token(self) -> str:
        """Cached access token, refreshed before expiry."""
        if (
            self._token is not None
            and self._expires_at is not None
            and self._clock() < self._expires_at
        ):
            return self._token
        payload = {
            "grant_type": "client_credentials",
            "client_id": self.client_id,
            "client_secret": self.client_secret,
        }
        data = json.loads(self._post(self.token_url, payload, self.timeout_s))
        self._token = data["access_token"]
        expires_in = float(data.get("expires_in", 1800.0))
        # never cache for less than 60 s even if margin >= expires_in
        self._expires_at = self._clock() + max(expires_in - self.expiry_margin_s, 60.0)
        return self._token

    def invalidate(self) -> None:
        """Drop the cached token (e.g. after a 401) — next call refetches."""
        self._token = None
        self._expires_at = None

    def headers(self) -> dict[str, str]:
        return {"Authorization": f"Bearer {self.token()}"}


class HttpPoller:
    """Poll `url` every `cadence_s`, extracting rows via `extract`.

    Backoff: consecutive failures double the sleep (cap `max_backoff_s`);
    `max_errors` consecutive failures stop the iterator — mirroring the
    reference's scraper-loop envelope.
    """

    def __init__(
        self,
        url: str,
        *,
        source_name: str,
        extract: Callable[[dict], list[dict]],
        cadence_s: float = 5.0,
        timeout_s: float = 10.0,
        max_backoff_s: float = 300.0,
        max_errors: int = 10,
        sleep: Callable[[float], None] = time.sleep,
        fetch: Callable[..., bytes] | None = None,
        clock: Callable[[], datetime] | None = None,
        auth: OAuth2ClientCredentials | None = None,
    ):
        self.url = url
        self.source_name = source_name
        self.extract = extract
        self.cadence_s = cadence_s
        self.timeout_s = timeout_s
        self.max_backoff_s = max_backoff_s
        self.max_errors = max_errors
        self._sleep = sleep
        self._fetch = fetch or self._default_fetch
        self._clock = clock or (lambda: datetime.now(timezone.utc))
        self.auth = auth
        # injected fetches predate the auth hook; only pass headers to
        # fetches that declare a third parameter
        self._fetch_takes_headers = (
            len(inspect.signature(self._fetch).parameters) >= 3
        )

    @staticmethod
    def _default_fetch(url: str, timeout_s: float, headers: dict | None = None) -> bytes:
        req = urllib.request.Request(url, headers=headers or {})
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:  # noqa: S310
            return resp.read()

    def _fetch_bytes(self) -> bytes:
        """One authenticated fetch; a 401 invalidates the cached token and
        retries once with a fresh one (reference behavior: tokens can be
        revoked server-side before their reported expiry)."""
        if self.auth is None or not self._fetch_takes_headers:
            if self._fetch_takes_headers:
                return self._fetch(self.url, self.timeout_s, {})
            return self._fetch(self.url, self.timeout_s)
        try:
            return self._fetch(self.url, self.timeout_s, self.auth.headers())
        except urllib.error.HTTPError as exc:
            if exc.code != 401:
                raise
            self.auth.invalidate()
            return self._fetch(self.url, self.timeout_s, self.auth.headers())

    def poll_once(self) -> list[dict]:
        """One fetch → extracted, stamped, coordinate-filtered rows."""
        payload = json.loads(self._fetch_bytes())
        now = self._clock().strftime("%Y-%m-%d %H:%M:%S")
        rows = []
        for row in self.extract(payload):
            if row.get("lat") is None or row.get("lon") is None:
                continue  # drop rows without a position (scraper contract)
            row = dict(row)
            row["source"] = self.source_name
            row["scrape_time"] = now
            rows.append(row)
        return rows

    def batches(self, *, max_batches: int | None = None) -> Iterator[list[dict]]:
        """Poll loop with exponential backoff on consecutive errors."""
        errors = 0
        emitted = 0
        while max_batches is None or emitted < max_batches:
            try:
                yield self.poll_once()
                emitted += 1
                errors = 0
                self._sleep(self.cadence_s)
            except Exception:  # noqa: BLE001 — any fetch/parse failure backs off
                errors += 1
                if errors >= self.max_errors:
                    raise
                backoff = min(self.cadence_s * (2 ** errors), self.max_backoff_s)
                self._sleep(backoff)


# OpenSky /states/all positional state-vector layout (public API docs;
# behavior parity with adsb-scraper/scraper.py:587-667). Index → raw
# column name as declared by config.GLOBAL_OPENSKY.
_OPENSKY_FIELDS = (
    "icao24",          # 0
    "callsign",        # 1
    "origin_country",  # 2
    "time_position",   # 3
    "last_contact",    # 4
    "lon",             # 5  (OpenSky orders longitude before latitude)
    "lat",             # 6
    "baro_altitude",   # 7
    "on_ground",       # 8
    "velocity",        # 9
    "true_track",      # 10
    "vertical_rate",   # 11
    "sensors",         # 12
    "geo_altitude",    # 13
    "squawk",          # 14
    "spi",             # 15
    "position_source", # 16
)


def extract_opensky_states(payload: dict) -> list[dict]:
    """Decode the `states` positional vectors into raw-layer dict rows."""
    rows = []
    for vec in payload.get("states") or []:
        row = {name: (vec[i] if i < len(vec) else None) for i, name in enumerate(_OPENSKY_FIELDS)}
        rows.append(row)
    return rows


def opensky_poller(
    *,
    client_id: str,
    client_secret: str,
    url: str = "https://opensky-network.org/api/states/all",
    token_url: str = (
        "https://auth.opensky-network.org/auth/realms/opensky-network"
        "/protocol/openid-connect/token"
    ),
    cadence_s: float = 45.0,
    **kwargs,
) -> HttpPoller:
    """The 4th source family's authenticated poller: OAuth2
    client-credentials (required for OpenSky accounts since 2025 — the
    reference reads the same credentials from env, scraper.py:565-585),
    45 s cadence per manifests/adsb-collectors/30-scrapers.yaml:251-252.
    Extra kwargs (fetch/sleep/clock/post injection) pass through for
    offline tests."""
    auth_kwargs = {k: kwargs.pop(k) for k in ("post", "expiry_margin_s") if k in kwargs}
    auth = OAuth2ClientCredentials(token_url, client_id, client_secret, **auth_kwargs)
    return HttpPoller(
        url,
        source_name="global_opensky",
        extract=extract_opensky_states,
        cadence_s=cadence_s,
        auth=auth,
        **kwargs,
    )
