"""Declarative per-source configuration.

Each reference source family (schema/schema-{local,regional,global-stream,
global-opensky}.sql) is described as an ordered list of ``Col`` specs:
raw field name → cleaned column name → transform kind. The cleansing MV
SELECTs (e.g. schema/schema-local.sql:199-293) are thereby data, not code —
one engine (:mod:`.functions.cleanse`) executes all four.

Transform kinds (reference citation for each semantic):

- ``id_norm``       trimBoth(lower(ifNull(x,'')))           schema-local.sql:202
- ``id_norm_upper`` trimBoth(upper(ifNull(x,'')))           schema-global-opensky.sql:103
- ``str``           ifNull(x,'')                            schema-local.sql:203
- ``lat`` / ``lon`` raw Float64 passthrough                 schema-local.sql:211-212
- ``alt_baro_mixed`` CASE 'ground'→0, NULL→-9999, else int  schema-local.sql:213-217
- ``i32``           toInt32(ifNull(x,-9999))                schema-local.sql:218
- ``f32``           toFloat32(ifNull(x,-9999))              schema-local.sql:219
- ``f32_zero``      toFloat32(ifNull(x,0.0))                schema-local.sql:278-279
- ``f64``           toFloat64(ifNull(x,-9999))              schema-local.sql:283-285
- ``bool``          ifNull(x,false)                         schema-local.sql:242-243
- ``str_array_norm`` arrayFilter(!='', arrayMap(trim∘lower)) schema-local.sql:249-252
- ``int_array``     passthrough Array(Int32)                schema-global-opensky.sql:134
- ``m_to_ft``       toInt32(ifNull(x*3.28084,-9999))        schema-global-opensky.sql:113
- ``opensky_alt_baro`` NULL+on_ground→0, NULL→-9999, else toInt32(x*3.28084) schema-global-opensky.sql:108-112
- ``ms_to_kn``      toFloat32(ifNull(x*1.94384,-9999))      schema-global-opensky.sql:115
- ``ms_to_fpm``     toFloat32(ifNull(x*196.85,-9999))       schema-global-opensky.sql:118
- ``epoch_ts``      fromUnixTimestamp(ifNull(x,0))          schema-global-opensky.sql:122-123
- ``spi_int_bool``  ifNull(x=1,false)                       schema-global-opensky.sql:120
- ``position_source_enum`` Enum8 decode to string           schema-global-opensky.sql:125-132
- ``source``        LowCardinality(String) passthrough      schema-local.sql:286
- ``scrape_time``   DateTime passthrough                    schema-local.sql:287
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Col:
    raw: str
    clean: str
    kind: str


def _c(raw: str, clean: str | None = None, kind: str = "str") -> Col:
    return Col(raw, clean or raw, kind)


@dataclass(frozen=True)
class SourceConfig:
    """One source family: column contract + retention/freshness envelope."""

    name: str
    topic: str                      # reference Kafka topic name
    columns: tuple[Col, ...]
    key_col: str = "icao24"         # WHERE isNotNull(<key>) validity key
    raw_key: str = "hex"            # raw-layer name of the key column
    history_ttl_days: int = 30      # MergeTree TTL (schema-*.sql)
    freshness: str = "5 minutes"    # *_latest view recency window
    state_ttl: str = "1 hour"       # ReplacingMergeTree TTL
    trigger: str = "5 seconds"      # kafka_flush_interval_ms analogue
    max_rows_per_trigger: int = 65000  # kafka_max_block_size analogue


# --- column blocks shared across the three ADS-B-JSON families -------------

_IDENT_FULL = (
    _c("hex", "icao24", "id_norm"),
    _c("type", "type", "str"),
    _c("flight", "callsign", "id_norm"),
    _c("r", "registration", "str"),
    _c("t", "aircraft_type", "str"),
    _c("desc", "description", "str"),
    _c("ownOp", "owner_operator", "str"),
    _c("year", "year", "str"),
)
_IDENT_MIN = _IDENT_FULL[:3]

_POSITION = (
    _c("lat", "lat", "lat"),
    _c("lon", "lon", "lon"),
    _c("alt_baro", "alt_baro", "alt_baro_mixed"),
    _c("alt_geom", "alt_geom", "i32"),
    _c("gs", "ground_speed", "f32"),
    _c("track", "track", "f32"),
)
_RATES = (
    _c("baro_rate", "vertical_rate", "i32"),
    _c("geom_rate", "geom_rate", "i32"),
)
_STATUS = (
    _c("squawk", "squawk", "str"),
    _c("emergency", "emergency", "str"),
    _c("category", "category", "str"),
    _c("alert", "alert", "bool"),
    _c("spi", "spi", "bool"),
)
_NAV = (
    _c("nav_qnh", "nav_qnh", "f32"),
    _c("nav_altitude_mcp", "nav_altitude_mcp", "i32"),
    _c("nav_altitude_fms", "nav_altitude_fms", "i32"),
    _c("nav_heading", "nav_heading", "f32"),
    _c("nav_modes", "nav_modes", "str_array_norm"),
)
_QUALITY = (
    _c("version", "version", "i32"),
    _c("nic", "nic", "i32"),
    _c("rc", "rc", "i32"),
    _c("nic_baro", "nic_baro", "i32"),
    _c("nac_p", "nac_p", "i32"),
    _c("nac_v", "nac_v", "i32"),
    _c("sil", "sil", "i32"),
    _c("sil_type", "sil_type", "str"),
    _c("gva", "gva", "i32"),
    _c("sda", "sda", "i32"),
)
_SIGNAL = (
    _c("rssi", "rssi", "f32"),
    _c("messages", "messages", "i32"),
    _c("mlat", "mlat", "str_array_norm"),
    _c("tisb", "tisb", "str_array_norm"),
)
_SEEN = (
    _c("seen_pos", "seen_pos", "f32_zero"),
    _c("seen", "seen", "f32_zero"),
)
_DIAG = (
    _c("lastPosition", "last_position", "str"),
    _c("calc_track", "calc_track", "i32"),
    _c("gpsOkLat", "gps_ok_lat", "f64"),
    _c("gpsOkLon", "gps_ok_lon", "f64"),
    _c("gpsOkBefore", "gps_ok_before", "f64"),
)
_META = (
    _c("source", "source", "source"),
    _c("scrape_time", "scrape_time", "scrape_time"),
)

# local: richest schema, 62 raw cols (schema/schema-local.sql:26-100)
LOCAL = SourceConfig(
    name="local",
    topic="positions-local",
    columns=(
        *_IDENT_FULL,
        *_POSITION,
        _c("track_rate", "track_rate", "f32"),
        _c("roll", "roll", "f32"),
        _c("mag_heading", "mag_heading", "f32"),
        _c("true_heading", "true_heading", "f32"),
        *_RATES,
        _c("r_dst", "distance", "f32"),
        _c("r_dir", "direction", "f32"),
        _c("ias", "ias", "i32"),
        _c("tas", "tas", "i32"),
        _c("mach", "mach", "f32"),
        _c("oat", "oat", "i32"),
        _c("tat", "tat", "i32"),
        _c("ws", "wind_speed", "i32"),
        _c("wd", "wind_direction", "i32"),
        *_STATUS,
        *_NAV,
        *_QUALITY,
        _c("dbFlags", "db_flags", "i32"),
        *_SIGNAL,
        *_SEEN,
        *_DIAG,
        *_META,
    ),
    history_ttl_days=365,           # TTL 1 YEAR, schema-local.sql:186
    freshness="15 seconds",         # schema-local.sql:458
    trigger="2 seconds",            # kafka_flush_interval_ms 2000
    max_rows_per_trigger=1000,
)

# regional: airplanes.live; dst/dir field-name variant
# (schema/schema-regional.sql:26-88, 48-50)
REGIONAL = SourceConfig(
    name="regional",
    topic="positions-regional",
    columns=(
        *_IDENT_FULL,
        *_POSITION,
        _c("mag_heading", "mag_heading", "f32"),
        _c("true_heading", "true_heading", "f32"),
        *_RATES,
        _c("dst", "distance", "f32"),
        _c("dir", "direction", "f32"),
        _c("ias", "ias", "i32"),
        _c("mach", "mach", "f32"),
        *_STATUS,
        *_NAV,
        *_QUALITY,
        _c("dbFlags", "db_flags", "i32"),
        *_SIGNAL,
        *_SEEN,
        *_META,
    ),
    history_ttl_days=90,            # schema-regional.sql:162
    freshness="1 minute",           # schema-regional.sql:408
    trigger="5 seconds",
    max_rows_per_trigger=20000,
)

# global-stream: adsb.lol via readsb (schema/schema-global-stream.sql:26-91)
GLOBAL_STREAM = SourceConfig(
    name="global_stream",
    topic="positions-global-stream",
    columns=(
        *_IDENT_MIN,
        *_POSITION,
        _c("track_rate", "track_rate", "f32"),
        _c("roll", "roll", "f32"),
        _c("mag_heading", "mag_heading", "f32"),
        _c("true_heading", "true_heading", "f32"),
        *_RATES,
        _c("ias", "ias", "i32"),
        _c("tas", "tas", "i32"),
        _c("mach", "mach", "f32"),
        _c("oat", "oat", "i32"),
        _c("tat", "tat", "i32"),
        _c("ws", "wind_speed", "i32"),
        _c("wd", "wind_direction", "i32"),
        *_STATUS,
        *_NAV,
        *_QUALITY,
        *_SIGNAL,
        *_SEEN,
        *_DIAG,
        *_META,
    ),
    history_ttl_days=30,            # schema-global-stream.sql:168
    freshness="5 minutes",          # schema-global-stream.sql:414
    trigger="10 seconds",
    max_rows_per_trigger=65000,
)

# global-opensky: metric units, positional state vectors
# (schema/schema-global-opensky.sql:21-46,101-135)
GLOBAL_OPENSKY = SourceConfig(
    name="global_opensky",
    topic="positions-global-opensky",
    columns=(
        _c("icao24", "icao24", "id_norm"),
        _c("callsign", "callsign", "id_norm_upper"),
        _c("lat", "lat", "lat"),
        _c("lon", "lon", "lon"),
        _c("on_ground", "on_ground", "bool"),
        _c("baro_altitude", "alt_baro", "opensky_alt_baro"),
        _c("geo_altitude", "alt_geom", "m_to_ft"),
        _c("velocity", "ground_speed", "ms_to_kn"),
        _c("true_track", "track", "f32"),
        _c("vertical_rate", "vertical_rate", "ms_to_fpm"),
        _c("squawk", "squawk", "str"),
        _c("spi", "spi", "spi_int_bool"),
        _c("origin_country", "origin_country", "str"),
        _c("time_position", "time_position", "epoch_ts"),
        _c("last_contact", "last_contact", "epoch_ts"),
        _c("sensors", "sensors", "int_array"),
        _c("position_source", "position_source", "position_source_enum"),
        *_META,
    ),
    raw_key="icao24",               # opensky keys validity on icao24 (schema-global-opensky.sql:137)
    history_ttl_days=30,            # schema-global-opensky.sql:87
    freshness="5 minutes",          # schema-global-opensky.sql:225
    trigger="10 seconds",
    max_rows_per_trigger=65000,
)

SOURCES: dict[str, SourceConfig] = {
    c.name: c for c in (LOCAL, REGIONAL, GLOBAL_STREAM, GLOBAL_OPENSKY)
}

# combined: 11-col common subset + metadata, fan-in of all four sources
# (schema/schema-global-combined.sql:13-31,42-108)
COMBINED_COLUMNS: tuple[str, ...] = (
    "icao24",
    "callsign",
    "lat",
    "lon",
    "alt_baro",
    "alt_geom",
    "ground_speed",
    "track",
    "vertical_rate",
    "source",
    "scrape_time",
    "ingestion_time",
)
COMBINED_FRESHNESS = "5 minutes"       # schema-global-combined.sql:119
COMBINED_INPUT_WINDOW = "2 hours"      # MV recency predicate, schema-global-combined.sql:57

SENTINEL_INT = -9999
SENTINEL_FLOAT = -9999.0
