"""Cleansing-engine unit tests — the FIXTURES.md §6 edge-case contract
(reference semantics: schema/schema-local.sql:199-293,
schema-global-opensky.sql:101-141)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from adsb_clickhouse_spark.config import GLOBAL_OPENSKY, LOCAL, REGIONAL, SOURCES
from adsb_clickhouse_spark.functions.cleanse import cleanse
from adsb_clickhouse_spark.schemas import clean_schema, raw_schema
from adsb_clickhouse_spark.sources.fixtures import _BASE, raw_batch

def STAMP():
    return F.lit(datetime(2026, 1, 15, 12, 0, 0))


def _clean(spark, cfg, **kw):
    raw = raw_batch(spark, cfg, n_aircraft=5, n_scrapes=1, **kw)
    return cleanse(raw, cfg, ingestion_time=STAMP())


@pytest.mark.parametrize("name", list(SOURCES))
def test_schema_matches_contract(spark, name):
    cfg = SOURCES[name]
    out = _clean(spark, cfg)
    expected = clean_schema(cfg)
    assert [f.name for f in out.schema.fields] == [f.name for f in expected.fields]
    assert [f.dataType for f in out.schema.fields] == [f.dataType for f in expected.fields]


@pytest.mark.parametrize("name", list(SOURCES))
def test_invalid_rows_dropped(spark, name):
    cfg = SOURCES[name]
    out = _clean(spark, cfg).collect()
    keys = {r["icao24"] for r in out}
    # null key and out-of-bounds coords never survive (schema-local.sql:289-293)
    assert "will_drop" not in keys
    assert "coord_bad" not in keys


def test_id_normalized(spark):
    out = _clean(spark, LOCAL)
    assert out.filter(F.col("icao24") == "abcdef").count() == 1  # "  AbCdEf  "


def test_alt_baro_mixed_decode(spark):
    rows = _clean(spark, LOCAL).filter(F.col("icao24") == "altcase").collect()
    assert sorted(r["alt_baro"] for r in rows) == [-9999, 0, 35000]


def test_array_normalization(spark):
    row = _clean(spark, LOCAL).filter(F.col("icao24") == "navcase").first()
    assert row["nav_modes"] == ["vnav", "alt"]


def test_sentinel_defaults(spark):
    row = _clean(spark, LOCAL).filter(F.col("icao24") == "nullcase").first()
    assert row["alt_geom"] == -9999 and row["ias"] == -9999
    assert row["ground_speed"] == pytest.approx(-9999.0)
    assert row["gps_ok_lat"] == pytest.approx(-9999.0)
    assert row["seen"] == 0.0 and row["seen_pos"] == 0.0
    assert row["alert"] is False and row["spi"] is False
    assert row["callsign"] == "" and row["registration"] == ""
    assert row["nav_modes"] == [] and row["mlat"] == []


def test_regional_dst_dir_rename(spark):
    out = _clean(spark, REGIONAL)
    assert "distance" in out.columns and "direction" in out.columns
    assert "dst" not in out.columns


def test_opensky_unit_conversions(spark):
    row = _clean(spark, GLOBAL_OPENSKY).filter(F.col("icao24") == "unitcase").first()
    assert row["alt_baro"] == 3280            # 1000 m → ft, toInt32 truncation
    assert row["ground_speed"] == pytest.approx(194.384, rel=1e-5)
    assert row["vertical_rate"] == pytest.approx(984.25, rel=1e-5)
    assert row["position_source"] == "MLAT"
    assert row["spi"] is True
    assert row["time_position"] == datetime(2023, 11, 14, 22, 13, 20)


def test_opensky_ground_altitude(spark):
    row = _clean(spark, GLOBAL_OPENSKY).filter(F.col("icao24") == "groundcase").first()
    assert row["alt_baro"] == 0               # NULL + on_ground → 0
    assert row["on_ground"] is True


def test_opensky_callsign_uppercased(spark):
    cfg = GLOBAL_OPENSKY
    raw = raw_batch(spark, cfg, n_aircraft=3, n_scrapes=1)
    out = cleanse(raw, cfg, ingestion_time=STAMP())
    for r in out.select("callsign").collect():
        assert r["callsign"] == r["callsign"].upper()


def test_ingestion_time_stamped(spark):
    out = _clean(spark, LOCAL)
    assert out.filter(F.col("ingestion_time").isNull()).count() == 0


def test_cleanse_plan_stays_codegen(spark):
    """No Python UDFs on the hot path: the physical plan must be a single
    codegen'd project+filter over the scan (SURVEY §2.10)."""
    raw = raw_batch(spark, LOCAL, n_aircraft=5, n_scrapes=1)
    plan = cleanse(raw, LOCAL, ingestion_time=STAMP())._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_events_ts_floors_nanos_to_micros(spark):
    """events.parquet carries TIMESTAMP(NANOS); load_table must FLOOR to
    micros exactly like DuckDB's micro-precision TIMESTAMP, whichever
    reader branch is active (legacy long-nanos today, native NTZ on a
    future Spark). Compares epoch-micros of every row against the raw
    nanos column floor-divided — a rounding reader fails here before it
    can silently break sub-microsecond oracle parity."""
    import duckdb

    from adsb_clickhouse_spark.queries import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_id"]: r["us"]
        for r in load_table(spark, sf, "events")
        .select("event_id", F.unix_micros("ts").alias("us"))
        .limit(2000)
        .collect()
    }
    con = duckdb.connect()
    con.execute("SET memory_limit='12GB'")
    want = dict(
        con.execute(
            "SELECT event_id, epoch_us(ts) FROM "
            f"'{sf}/events.parquet' WHERE event_id IN "
            f"({','.join(str(k) for k in got)})"
        ).fetchall()
    )
    assert got == want
