"""The reference's own operator inventory (SURVEY.md §2) exercised on the
driver's `events` table — `user_id` plays the role of `icao24`, `ts` of
`scrape_time`. Each query maps 1:1 to an inventory row and reuses the
production operators from :mod:`..operators`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.latest import latest_per_key, stride_sample
from . import load_table, register


@register(
    "adsb_latest_per_key",
    """
    SELECT user_id, event_id, ts, event_type, value, props
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    ORDER BY user_id
    """,
    doc=(
        "W1/A1: ReplacingMergeTree + FINAL + LIMIT 1 BY key "
        "(schema/schema-local.sql:370-372,455-460) as one keyed argmax; "
        "max_by aggregate → map-side partial agg, minimal shuffle."
    ),
)
def adsb_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        latest_per_key(e, key="user_id", version="ts", tiebreak="event_id")
        .select("user_id", "event_id", "ts", "event_type", "value", "props")
        .orderBy("user_id")
    )


@register(
    "adsb_latest_view_freshness",
    """
    WITH mx AS (SELECT max(ts) AS now_ts FROM events)
    SELECT user_id, event_id, ts, event_type, value
    FROM (SELECT e.*, row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
          FROM events e, mx
          WHERE e.ts > mx.now_ts - INTERVAL 1 DAY)
    WHERE rn = 1
    ORDER BY user_id
    """,
    doc=(
        "The positions_*_latest view (P3 recency + W1 dedup, "
        "schema/schema-local.sql:455-460). 'now' = max(ts) for determinism; "
        "in production it is current_timestamp and the filter prunes "
        "date partitions before the shuffle."
    ),
)
def adsb_latest_view_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    now_ts = e.agg(F.max("ts").alias("now_ts"))
    fresh = e.join(F.broadcast(now_ts)).filter(
        F.col("ts") > F.col("now_ts") - F.expr("INTERVAL 1 DAY")
    ).drop("now_ts")
    return (
        latest_per_key(fresh, key="user_id", version="ts", tiebreak="event_id")
        .select("user_id", "event_id", "ts", "event_type", "value")
        .orderBy("user_id")
    )


@register(
    "adsb_stride_sample",
    """
    SELECT event_id, user_id, ts, value
    FROM (SELECT *, row_number() OVER (ORDER BY event_id) - 1 AS row_idx
          FROM events)
    WHERE row_idx % 4 = 0
    ORDER BY event_id
    """,
    doc=(
        "P5/W2: rowNumberInAllBlocks() % 4 stride sampling "
        "(dashboards/examples/Current_Positions_Regional.json:321)."
    ),
)
def adsb_stride_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        stride_sample(e, 4, "event_id")
        .select("event_id", "user_id", "ts", "value")
        .orderBy("event_id")
    )


@register(
    "adsb_union_fan_in",
    """
    SELECT src, user_id, ts, value FROM (
      SELECT 'purchases' AS src, user_id, ts, value FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT 'errors' AS src, user_id, ts, value FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT 'signups' AS src, user_id, ts, value FROM events WHERE event_type = 'signup'
      UNION ALL
      SELECT 'clicks' AS src, user_id, ts, value FROM events WHERE event_type = 'click'
    )
    ORDER BY src, user_id, ts, value
    """,
    doc=(
        "U1: 4-way schema-aligning UNION ALL fan-in "
        "(schema/schema-global-combined.sql:42-108); shuffle-free plan concat."
    ),
)
def adsb_union_fan_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    parts = []
    for src, et in [
        ("purchases", "purchase"),
        ("errors", "error"),
        ("signups", "signup"),
        ("clicks", "click"),
    ]:
        parts.append(
            e.filter(F.col("event_type") == et).select(
                F.lit(src).alias("src"), "user_id", "ts", "value"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("src", "user_id", "ts", "value")


@register(
    "adsb_cleanse_projection",
    """
    SELECT event_id,
           trim(lower(coalesce(event_type, '')))        AS event_type_norm,
           CAST(coalesce(value, -9999.0) AS DOUBLE)     AS value_clean,
           coalesce(CAST(user_id AS INTEGER), -9999)    AS user_id_clean,
           CAST(coalesce(json_extract_string(props, '$.k'), '') AS VARCHAR) AS k_str
    FROM events
    WHERE user_id IS NOT NULL AND value BETWEEN 0 AND 1000
    ORDER BY event_id
    """,
    doc=(
        "P1+P2 cleansing shape on generic data: rename/cast/null-default "
        "projection + validity bounds filter (schema/schema-local.sql:199-293). "
        "The real per-source engine is functions/cleanse.py; this pins the "
        "scalar-function semantics (F1-F5, F13-F14) against the oracle."
    ),
)
def adsb_cleanse_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("user_id").isNotNull() & F.col("value").between(0, 1000))
        .select(
            "event_id",
            F.trim(F.lower(F.coalesce(F.col("event_type"), F.lit("")))).alias("event_type_norm"),
            F.coalesce(F.col("value"), F.lit(-9999.0)).cast("double").alias("value_clean"),
            F.coalesce(F.col("user_id").cast("int"), F.lit(-9999)).alias("user_id_clean"),
            F.coalesce(F.get_json_object("props", "$.k"), F.lit("")).alias("k_str"),
        )
        .orderBy("event_id")
    )


@register(
    "adsb_minute_rollup",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
    doc=(
        "ST3 tumbling-window aggregation (SURVEY §2.9) — F.window() "
        "hourly buckets; in streaming the same expression runs incrementally "
        "with a watermark."
    ),
)
def adsb_minute_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
        .orderBy("window_start", "event_type")
    )


@register(
    "adsb_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, count(*) AS n_events, sum(new_session) AS n_sessions
    FROM gaps
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Sessionization: lag + gap>threshold flag + cumulative session ids.",
)
def adsb_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_session = F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("new_session").alias("n_sessions"))
        .orderBy("user_id")
    )


@register(
    "adsb_sliding_rollup",
    """
    WITH w AS (
      SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                     date_trunc('hour', ts)]) AS window_start,
             event_type, value
      FROM events)
    SELECT window_start, event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM w
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
    doc=(
        "ST3 sliding-window aggregation: 2-hour windows sliding hourly — "
        "each event contributes to exactly two windows. Batch twin of the "
        "streaming positions_per_window(slide=...) operator; the oracle "
        "materializes the two window starts per row."
    ),
)
def adsb_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
        .orderBy("window_start", "event_type")
    )
