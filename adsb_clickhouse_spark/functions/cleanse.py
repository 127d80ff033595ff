"""Cleansing projection + validity filter (SURVEY.md §2.2 P1/P2, §2.8 F1-F19).

One engine executes every source family's cleansing MV
(schema/schema-local.sql:199-293; schema-regional.sql:176-257;
schema-global-stream.sql:182-266; schema-global-opensky.sql:101-141)
driven by the declarative :class:`~adsb_clickhouse_spark.config.SourceConfig`.

Everything here is built from ``pyspark.sql.functions`` — the whole
projection stays inside WholeStageCodegen; at 100 TB this runs at parquet
scan speed with full column pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import SENTINEL_FLOAT, SENTINEL_INT, Col, SourceConfig

# unit conversion constants (schema/schema-global-opensky.sql:106-118)
M_TO_FT = 3.28084
MS_TO_KN = 1.94384
MS_TO_FPM = 196.85

# Enum8('ADS-B'=0,'ASTERIX'=1,'MLAT'=2,'FLARM'=3)
# (schema/schema-global-opensky.sql:74-79)
POSITION_SOURCE_ENUM = {0: "ADS-B", 1: "ASTERIX", 2: "MLAT", 3: "FLARM"}


def _id_norm(c: Column) -> Column:
    # trimBoth(lower(ifNull(x,''))) — schema-local.sql:202
    return F.trim(F.lower(F.coalesce(c, F.lit(""))))


def _str_array_norm(c: Column) -> Column:
    # arrayFilter(x->x!='', arrayMap(x->trimBoth(lower(x)), a))
    # — schema-local.sql:249-252
    return F.filter(
        F.transform(c, lambda x: F.trim(F.lower(x))), lambda x: x != F.lit("")
    )


def _enum_decode(c: Column, mapping: dict[int, str], default_key: int = 0) -> Column:
    col = F.coalesce(c, F.lit(default_key))
    expr = F.lit(mapping[default_key])
    out = None
    for k, v in mapping.items():
        branch = F.when(col == k, F.lit(v))
        out = branch if out is None else out.when(col == k, F.lit(v))
    return out.otherwise(expr)


def transform_column(spec: Col) -> Column:
    """Build the cleansing expression for one column spec."""
    c = F.col(spec.raw)
    k = spec.kind
    if k == "id_norm":
        return _id_norm(c)
    if k == "id_norm_upper":
        # opensky callsign UPPERcased — schema-global-opensky.sql:103
        return F.trim(F.upper(F.coalesce(c, F.lit(""))))
    if k == "str":
        return F.coalesce(c, F.lit(""))
    if k in ("lat", "lon"):
        return c
    if k == "alt_baro_mixed":
        # CASE 'ground'→0, NULL→-9999, else toInt32 — schema-local.sql:213-217
        return (
            F.when(c == "ground", F.lit(0))
            .when(c.isNull(), F.lit(SENTINEL_INT))
            .otherwise(c.cast("int"))
        )
    if k == "i32":
        return F.coalesce(c.cast("int"), F.lit(SENTINEL_INT))
    if k == "f32":
        return F.coalesce(c.cast("float"), F.lit(SENTINEL_FLOAT).cast("float"))
    if k == "f32_zero":
        return F.coalesce(c.cast("float"), F.lit(0.0).cast("float"))
    if k == "f64":
        return F.coalesce(c.cast("double"), F.lit(SENTINEL_FLOAT))
    if k == "bool":
        return F.coalesce(c, F.lit(False))
    if k == "str_array_norm":
        return _str_array_norm(c)
    if k == "int_array":
        return c
    if k == "m_to_ft":
        # toInt32(ifNull(x*3.28084, -9999)) — schema-global-opensky.sql:113
        return F.coalesce((c * M_TO_FT).cast("int"), F.lit(SENTINEL_INT))
    if k == "opensky_alt_baro":
        # NULL+on_ground→0, NULL→-9999, else toInt32(x*3.28084)
        # — schema-global-opensky.sql:108-112
        return (
            F.when(c.isNull() & F.coalesce(F.col("on_ground"), F.lit(False)), F.lit(0))
            .when(c.isNull(), F.lit(SENTINEL_INT))
            .otherwise((c * M_TO_FT).cast("int"))
        )
    if k == "ms_to_kn":
        return F.coalesce((c * MS_TO_KN).cast("float"), F.lit(SENTINEL_FLOAT).cast("float"))
    if k == "ms_to_fpm":
        return F.coalesce((c * MS_TO_FPM).cast("float"), F.lit(SENTINEL_FLOAT).cast("float"))
    if k == "epoch_ts":
        # fromUnixTimestamp(ifNull(x,0)) — schema-global-opensky.sql:122-123
        return F.timestamp_seconds(F.coalesce(c, F.lit(0)))
    if k == "spi_int_bool":
        # ifNull(spi = 1, false) — schema-global-opensky.sql:120
        return F.coalesce(c == 1, F.lit(False))
    if k == "position_source_enum":
        return _enum_decode(c, POSITION_SOURCE_ENUM)
    if k in ("source", "scrape_time"):
        return c
    raise ValueError(f"unknown transform kind: {k}")


def validity_filter(cfg: SourceConfig) -> Column:
    """P2: WHERE isNotNull(key) AND lat/lon present and in bounds
    (schema/schema-local.sql:289-293)."""
    return (
        F.col(cfg.raw_key).isNotNull()
        & F.col("lat").isNotNull()
        & F.col("lon").isNotNull()
        & F.col("lat").between(-90, 90)
        & F.col("lon").between(-180, 180)
    )


def cleanse(raw: DataFrame, cfg: SourceConfig, *, ingestion_time: Column | None = None) -> DataFrame:
    """Execute the full cleansing MV for one source: validity filter, then
    the rename/cast/default projection, then the ``ingestion_time`` stamp
    (now() — schema-local.sql:287).

    Filter is applied BEFORE the projection so Catalyst pushes the
    null/bounds predicates into the source scan (raw-layer column names).
    """
    stamp = ingestion_time if ingestion_time is not None else F.current_timestamp()
    projection = [transform_column(c).alias(c.clean) for c in cfg.columns]
    projection.append(stamp.cast("timestamp").alias("ingestion_time"))
    return raw.filter(validity_filter(cfg)).select(*projection)
