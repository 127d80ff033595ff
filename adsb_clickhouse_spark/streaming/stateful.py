"""Custom stateful streaming operator: per-aircraft track state
(SURVEY.md §2.9 ST4 extension).

The reference's only stateful construct is the ReplacingMergeTree
current-state table. A Spark engine can do strictly more with
``applyInPandasWithState``: here, a per-`icao24` tracker that maintains
(last position, cumulative report count, great-circle distance flown)
across micro-batches — state Spark cannot express with a plain windowed
aggregate because the transition depends on the previous row's values.

State is bounded by live-aircraft count (~12k keys — BASELINE.md) and
expires via processing-time timeout, mirroring the 1-hour state TTL
(schema/schema-local.sql:372).
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

TRACK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_lat", T.DoubleType()),
        T.StructField("last_lon", T.DoubleType()),
        T.StructField("n_reports", T.LongType()),
        T.StructField("distance_nm", T.DoubleType()),
    ]
)

TRACK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("icao24", T.StringType()),
        T.StructField("n_reports", T.LongType()),
        T.StructField("distance_nm", T.DoubleType()),
        T.StructField("last_lat", T.DoubleType()),
        T.StructField("last_lon", T.DoubleType()),
    ]
)


def _haversine_nm(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    r_nm = 3440.065  # earth radius in nautical miles
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * r_nm * math.asin(math.sqrt(a))


def _make_update_track(state_ttl_ms: int | None):
    def _update_track(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_lat, last_lon, n, dist = state.get
        else:
            last_lat = last_lon = None
            n, dist = 0, 0.0
        for pdf in pdfs:
            pdf = pdf.sort_values("scrape_time")
            for lat, lon in zip(pdf["lat"], pdf["lon"]):
                if last_lat is not None:
                    dist += _haversine_nm(last_lat, last_lon, lat, lon)
                last_lat, last_lon = float(lat), float(lon)
                n += 1
        state.update((last_lat, last_lon, n, dist))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            {
                "icao24": [key[0]],
                "n_reports": [n],
                "distance_nm": [round(dist, 3)],
                "last_lat": [last_lat],
                "last_lon": [last_lon],
            }
        )

    return _update_track


def track_state_stream(clean_stream: DataFrame, *, state_ttl_ms: int | None = None) -> DataFrame:
    """Attach the tracker to a cleaned position stream (update mode).

    ``state_ttl_ms`` enables the 1-hour state-TTL analogue via processing-
    time timeouts (production). Leave None for bounded test runs: timeout
    bookkeeping schedules extra micro-batches, so ``processAllAvailable``
    would never quiesce."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        clean_stream.select("icao24", "scrape_time", "lat", "lon")
        .groupBy("icao24")
        .applyInPandasWithState(
            _make_update_track(state_ttl_ms),
            outputStructType=TRACK_OUTPUT_SCHEMA,
            stateStructType=TRACK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
