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

import json
import time
import urllib.request
from collections.abc import Callable, Iterator
from datetime import datetime, timezone


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
        fetch: Callable[[str, float], bytes] | None = None,
        clock: Callable[[], datetime] | None = None,
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

    @staticmethod
    def _default_fetch(url: str, timeout_s: float) -> bytes:
        with urllib.request.urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
            return resp.read()

    def poll_once(self) -> list[dict]:
        """One fetch → extracted, stamped, coordinate-filtered rows."""
        payload = json.loads(self._fetch(self.url, self.timeout_s))
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
