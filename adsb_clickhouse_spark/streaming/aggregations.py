"""Streaming aggregations over the position stream (SURVEY.md §2.9 ST3).

The reference has no event-time windowing (insert-triggered MVs only);
these are the corpus extensions a Spark engine gets from Structured
Streaming: tumbling/sliding window rollups and session windows with
watermark-bounded state. The same expressions run identically in batch
(the batch queries are oracle-checked in queries/adsb.py — Spark
guarantees batch/streaming semantic parity for these operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def positions_per_window(
    stream: DataFrame,
    *,
    window: str = "1 minute",
    slide: str | None = None,
    ts: str = "scrape_time",
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling (or sliding) positions-per-window counts, late data bounded
    by the watermark. ReplacingMergeTree's argmax makes late rows harmless
    in the reference (ST2); here the watermark provides the equivalent
    guarantee for windowed state."""
    w = F.window(F.col(ts), window, slide) if slide else F.window(F.col(ts), window)
    gcols = [w.alias("w")] + [F.col(k) for k in (keys or [])]
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(*gcols)
        .agg(F.count("*").alias("n_positions"), F.approx_count_distinct("icao24").alias("n_aircraft"))
        .select(F.col("w.start").alias("window_start"), *(keys or []), "n_positions", "n_aircraft")
    )


def flight_sessions(
    stream: DataFrame,
    *,
    gap: str = "30 minutes",
    ts: str = "scrape_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-aircraft session windows: contiguous position reports with
    < gap between them form one 'flight' — session_window keeps state
    only for open sessions (bounded by live aircraft count)."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("s"), F.col("icao24"))
        .agg(
            F.count("*").alias("n_reports"),
            F.min(ts).alias("first_seen"),
            F.max(ts).alias("last_seen"),
        )
        .select(
            "icao24",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_reports",
            "first_seen",
            "last_seen",
        )
    )
