"""applyInPandasWithState track operator: state carries across
micro-batches; distance accumulates in event-time order."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from adsb_clickhouse_spark.config import GLOBAL_STREAM
from adsb_clickhouse_spark.functions.cleanse import cleanse
from adsb_clickhouse_spark.schemas import raw_schema
from adsb_clickhouse_spark.sources.json_source import stream_json_lines
from adsb_clickhouse_spark.streaming.stateful import track_state_stream

NOW = datetime(2026, 1, 15, 12, 0, 0)


def _write_batch(spark, path, rows):
    schema = raw_schema(GLOBAL_STREAM)
    data = []
    for hexid, lat, lon, ts in rows:
        row = {f.name: None for f in schema.fields}
        row.update(hex=hexid, lat=lat, lon=lon, source="adsb.lol",
                   scrape_time=ts, nav_modes=[], mlat=[], tisb=[])
        data.append([row[f.name] for f in schema.fields])
    spark.createDataFrame(data, schema).coalesce(1).write.mode("append").json(path)


def test_track_state_accumulates_across_batches(spark, tmp_base):
    in_dir = os.path.join(tmp_base, "in")
    # batch 1: two fixes for aircraft a (1 degree of latitude ≈ 60 nm)
    _write_batch(spark, in_dir, [
        ("aaa111", 50.0, 8.0, datetime(2026, 1, 15, 12, 0, 0)),
        ("aaa111", 51.0, 8.0, datetime(2026, 1, 15, 12, 1, 0)),
        ("bbb222", 10.0, 10.0, datetime(2026, 1, 15, 12, 0, 30)),
    ])
    stream = stream_json_lines(spark, in_dir, GLOBAL_STREAM, max_files_per_trigger=1)
    clean = cleanse(stream, GLOBAL_STREAM, ingestion_time=F.lit(NOW))
    tracked = track_state_stream(clean)
    q = (
        tracked.writeStream.outputMode("update")
        .format("memory")
        .queryName("tracks")
        .option("checkpointLocation", os.path.join(tmp_base, "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r["icao24"]: r for r in spark.sql("SELECT * FROM tracks").collect()}
        assert first["aaa111"]["n_reports"] == 2
        assert 59 < first["aaa111"]["distance_nm"] < 61
        assert first["bbb222"]["n_reports"] == 1 and first["bbb222"]["distance_nm"] == 0.0

        # batch 2 arrives later: state must carry over, not reset
        _write_batch(spark, in_dir, [
            ("aaa111", 52.0, 8.0, datetime(2026, 1, 15, 12, 2, 0)),
        ])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM tracks").collect()
        latest = max(
            (r for r in rows if r["icao24"] == "aaa111"), key=lambda r: r["n_reports"]
        )
        assert latest["n_reports"] == 3
        assert 119 < latest["distance_nm"] < 121
        assert latest["last_lat"] == 52.0
    finally:
        q.stop()
