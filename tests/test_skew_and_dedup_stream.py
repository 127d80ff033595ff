"""Salted skew join correctness + streaming dedup within watermark."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from adsb_clickhouse_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    import random

    rng = random.Random(3)
    # hot key 0 holds half the rows — the salting target
    large = spark.createDataFrame(
        [(0 if rng.random() < 0.5 else rng.randrange(100), i) for i in range(10_000)],
        "k long, v long",
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(100)], "k long, name string")
    plain = salted_join(large, small, "k", salt=8).groupBy("k").count()
    expect = large.join(small, "k").groupBy("k").count()
    got = {r["k"]: r["count"] for r in plain.collect()}
    want = {r["k"]: r["count"] for r in expect.collect()}
    assert got == want


def test_salted_join_left_rows_preserved(spark):
    large = spark.createDataFrame([(1, 10), (1, 11), (2, 12)], "k long, v long")
    small = spark.createDataFrame([(1, "a")], "k long, name string")
    out = salted_join(large, small, "k", salt=4, how="left").collect()
    assert len(out) == 3
    assert sorted(r["name"] for r in out if r["k"] == 1) == ["a", "a"]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark — the streaming-native version of
    kafka consumer re-delivery protection (ST5)."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    rows = [
        ("a", datetime(2026, 1, 15, 12, 0, 0), 1),
        ("a", datetime(2026, 1, 15, 12, 0, 0), 1),   # duplicate delivery
        ("b", datetime(2026, 1, 15, 12, 0, 5), 2),
    ]
    spark.createDataFrame(rows, "icao24 string, scrape_time timestamp, v int") \
        .coalesce(1).write.mode("overwrite").json(in_dir)
    stream = (
        spark.readStream.schema("icao24 string, scrape_time timestamp, v int")
        .json(in_dir)
        .withWatermark("scrape_time", "10 minutes")
        .dropDuplicatesWithinWatermark(["icao24", "scrape_time"])
    )
    q = stream.writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM dedup_out").collect()
    assert len(out) == 2
