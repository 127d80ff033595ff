"""End-to-end MV cascade: raw fixtures → cleanse → history + state +
combined, in batch and via a real Structured Streaming query
(SURVEY §3.1; FIXTURES.md §6 cases 12-13)."""

from __future__ import annotations

import json
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from adsb_clickhouse_spark.config import GLOBAL_STREAM, LOCAL, SOURCES
from adsb_clickhouse_spark.plans import tables
from adsb_clickhouse_spark.sources.fixtures import raw_batch
from adsb_clickhouse_spark.sources.json_source import read_json_lines, stream_json_lines
from adsb_clickhouse_spark.streaming.pipeline import IngestPipeline

NOW = datetime(2026, 1, 15, 12, 0, 0)


def test_batch_cascade_all_sources(spark, tmp_base):
    for cfg in SOURCES.values():
        pipe = IngestPipeline(cfg, tmp_base, now=NOW)
        pipe.process_batch(raw_batch(spark, cfg, n_aircraft=30, n_scrapes=2))
        hist = tables.read_history(spark, pipe.history_path)
        state = tables.read_state(spark, pipe.state_path)
        assert hist.count() > state.count() > 0
        # state holds exactly one row per key
        assert state.groupBy("icao24").count().filter("count > 1").count() == 0
    combined = tables.read_state(spark, os.path.join(tmp_base, "combined", "state"))
    # case 13: same key from several sources → one combined row after dedup
    assert combined.groupBy("icao24").count().filter("count > 1").count() == 0
    assert set(combined.columns) >= {"icao24", "lat", "lon", "ground_speed", "source"}


def test_latest_views_respect_freshness(spark, tmp_base):
    pipe = IngestPipeline(LOCAL, tmp_base, now=NOW)
    pipe.process_batch(raw_batch(spark, LOCAL, n_aircraft=10, n_scrapes=3))
    latest = pipe.latest(spark)
    rows = latest.collect()
    # 15-second local freshness: the stale edge row (age 1.5 h) is excluded,
    # but present in history (case 9)
    assert "stale" not in {r["icao24"] for r in rows}
    hist_keys = {r["icao24"] for r in tables.read_history(spark, pipe.history_path).collect()}
    assert "stale" in hist_keys
    # one row per aircraft
    assert len(rows) == len({r["icao24"] for r in rows})


def test_malformed_json_skipped(spark, tmp_base):
    """Case 12: broken lines skipped without failing the batch
    (kafka_skip_broken_messages)."""
    path = os.path.join(tmp_base, "in")
    os.makedirs(path)
    good = {"hex": "abc123", "lat": 1.0, "lon": 2.0, "source": "local",
            "scrape_time": "2026-01-15 12:00:00"}
    with open(os.path.join(path, "batch.json"), "w") as f:
        f.write(json.dumps(good) + "\n")
        f.write("{this is not json\n")
        f.write(json.dumps(dict(good, hex="def456")) + "\n")
    df = read_json_lines(spark, path, LOCAL)
    assert df.count() == 2


def test_replayed_batch_skipped_no_history_duplicates(spark, tmp_base):
    """foreachBatch re-delivery of a fully-committed batch (the common
    crash point: sinks done, checkpoint commit lost) must not append
    duplicate history rows — the per-batch commit marker skips it."""
    from adsb_clickhouse_spark.config import GLOBAL_STREAM
    from adsb_clickhouse_spark.sources.fixtures import raw_batch
    from adsb_clickhouse_spark.streaming.pipeline import IngestPipeline

    pipe = IngestPipeline(GLOBAL_STREAM, tmp_base, now=NOW)
    raw = raw_batch(spark, GLOBAL_STREAM, n_aircraft=5, n_scrapes=1, with_edges=False)
    pipe.process_batch(raw, batch_id=7)
    n1 = tables.read_history(spark, pipe.history_path).count()
    pipe.process_batch(raw, batch_id=7)  # replay
    assert tables.read_history(spark, pipe.history_path).count() == n1
    # a new batch id still processes
    pipe.process_batch(raw, batch_id=8)
    assert tables.read_history(spark, pipe.history_path).count() == 2 * n1
    # read-time dedupe collapses the crash-window duplicates
    assert tables.read_history(spark, pipe.history_path, dedupe=True).count() == n1


def test_streaming_cascade_file_source(spark, tmp_base):
    """Drive the cascade through an actual streaming query (file source
    stands in for Kafka; identical downstream plan)."""
    in_dir = os.path.join(tmp_base, "incoming")
    os.makedirs(in_dir)
    raw = raw_batch(spark, GLOBAL_STREAM, n_aircraft=20, n_scrapes=2)
    raw.coalesce(1).write.mode("overwrite").json(os.path.join(in_dir, "b1"))

    pipe = IngestPipeline(GLOBAL_STREAM, tmp_base, now=NOW)
    stream = stream_json_lines(spark, os.path.join(in_dir, "b1"), GLOBAL_STREAM)
    q = pipe.start(stream, os.path.join(tmp_base, "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = tables.read_state(spark, pipe.state_path)
    assert state.count() > 0
    assert state.groupBy("icao24").count().filter("count > 1").count() == 0
    hist = tables.read_history(spark, pipe.history_path)
    assert hist.count() >= state.count()
