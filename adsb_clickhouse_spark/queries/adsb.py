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


def _rollup(e: DataFrame, win: F.Column, tag: str) -> DataFrame:
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.lit(tag).alias("branch"),
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "adsb_rollups",
    """
    WITH t AS (
      SELECT 'tumbling' AS branch, date_trunc('hour', ts) AS window_start,
             event_type, count(*) AS n, round(sum(value), 2) AS total_value
      FROM events
      GROUP BY 2, 3),
    sw AS (
      SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                     date_trunc('hour', ts)]) AS window_start,
             event_type, value
      FROM events),
    s AS (
      SELECT 'sliding' AS branch, window_start, event_type,
             count(*) AS n, round(sum(value), 2) AS total_value
      FROM sw
      GROUP BY 2, 3)
    SELECT * FROM t UNION ALL SELECT * FROM s
    ORDER BY branch, window_start, event_type
    """,
    doc=(
        "ST3 windowed aggregations as a tagged union (round-7 registry "
        "packing — the driver gate records at most 50 rows): 'tumbling' "
        "= F.window() hourly buckets, 'sliding' = 2-hour windows "
        "sliding hourly (each event lands in exactly two). In streaming "
        "the same expressions run incrementally with a watermark; the "
        "oracle materializes the sliding branch's two window starts per "
        "row. Both branches timed separately in BENCH_DELTA.json."
    ),
)
def adsb_rollups(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        _rollup(e, F.window("ts", "1 hour"), "tumbling")
        .unionByName(_rollup(e, F.window("ts", "2 hours", "1 hour"), "sliding"))
        .orderBy("branch", "window_start", "event_type")
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
    ),
    sess AS (
      SELECT user_id, count(*) AS n_events,
             CAST(sum(new_session) AS BIGINT) AS n_sessions
      FROM gaps
      GROUP BY user_id
    ),
    rpts AS (
      SELECT user_id, ts, event_id,
             fmod(coalesce(value, 0), 90) AS lat,
             fmod(coalesce(value, 0) * 7, 180) AS lon
      FROM events WHERE user_id % 7 = 0
    ),
    rseg AS (
      SELECT user_id,
             lag(epoch_us(ts)) OVER w AS t0, epoch_us(ts) AS t1,
             lag(lat) OVER w AS lat0, lat AS lat1,
             lag(lon) OVER w AS lon0, lon AS lon1
      FROM rpts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    rgrid AS (
      SELECT user_id, t0, t1, lat0, lat1, lon0, lon1,
             unnest(generate_series(
               t0 + (7200000000 - (t0 % 7200000000)) % 7200000000,
               t1 - 1, 7200000000)) AS g
      FROM rseg
      WHERE t0 IS NOT NULL AND t1 - t0 <= 86400000000
    )
    SELECT 'sessions' AS branch, user_id, n_events, n_sessions,
           CAST(NULL AS TIMESTAMP) AS grid_ts,
           CAST(NULL AS DOUBLE) AS lat, CAST(NULL AS DOUBLE) AS lon
    FROM sess
    UNION ALL
    SELECT 'resample', user_id, NULL, NULL,
           make_timestamp(g),
           lat0 + (lat1 - lat0) * (CAST(g - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE)),
           lon0 + (lon1 - lon0) * (CAST(g - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE))
    FROM rgrid
    UNION ALL
    SELECT 'resample_locf', user_id, NULL, NULL,
           make_timestamp(g), lat0, lon0
    FROM rgrid
    ORDER BY branch, user_id, grid_ts
    """,
    doc=(
        "Tagged union (registry packing, see COVERAGE.md). "
        "branch='sessions': lag + gap>threshold flag + cumulative session "
        "ids. Gaps compared at microsecond precision on both sides (DuckDB "
        "intervals are exact micros; casting ts to long would floor to "
        "seconds and diverge in the (1800s, 1801s) band). The oracle sum is "
        "CAST to BIGINT — DuckDB HUGEINT otherwise reaches pandas as "
        "float64. branch='resample' (r9): trajectory resampling "
        "(operators/trajectory.py) — every 7th user's synthetic track "
        "resampled onto the 2 h grid with linear interpolation, segments "
        "wider than 24 h dropped; the operator's window+explode plan vs "
        "the oracle's lag + generate_series unnest. Grid instants are "
        "exact integer-micros arithmetic in both engines; the "
        "interpolation v0 + (v1 - v0) * ((g - t0)/(t1 - t0)) is the same "
        "IEEE association on both sides, so values hash bit-identically "
        "with no rounding. branch='resample_locf' (r9): the same grid "
        "with method='locf' — last observation carried forward (step "
        "fill, the ClickHouse WITH FILL semantics for latched columns); "
        "values are raw pass-throughs of the bracketing report, so the "
        "hash pins the segment/grid logic under the second fill law."
    ),
)
def adsb_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trajectory import resample_track

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    new_session = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = (
        e.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("new_session").alias("n_sessions"))
        .select(
            F.lit("sessions").alias("branch"),
            "user_id",
            "n_events",
            "n_sessions",
            F.lit(None).cast("timestamp").alias("grid_ts"),
            F.lit(None).cast("double").alias("lat"),
            F.lit(None).cast("double").alias("lon"),
        )
    )
    v = F.coalesce(F.col("value"), F.lit(0.0))
    rpts = e.filter(F.col("user_id") % 7 == 0).select(
        "user_id",
        "ts",
        "event_id",
        (v % 90).alias("lat"),
        ((v * 7) % 180).alias("lon"),
    )
    def _res_branch(tag: str, method: str) -> DataFrame:
        return resample_track(
            rpts,
            interval_s=7200,
            id_col="user_id",
            value_cols=("lat", "lon"),
            order_tiebreak=("event_id",),
            max_gap_s=86400,
            method=method,
        ).select(
            F.lit(tag).alias("branch"),
            "user_id",
            F.lit(None).cast("long").alias("n_events"),
            F.lit(None).cast("long").alias("n_sessions"),
            "grid_ts",
            "lat",
            "lon",
        )

    res = _res_branch("resample", "linear")
    locf = _res_branch("resample_locf", "locf")
    return (
        sess.unionByName(res)
        .unionByName(locf)
        .orderBy("branch", "user_id", "grid_ts")
    )


@register(
    "adsb_session_windows",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_reports,
           min(ts) AS first_seen,
           max(ts) AS last_seen
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc=(
        "ST3 session windows: batch twin of streaming/aggregations.py "
        "flight_sessions (F.session_window, 30-minute gap). Spark merges "
        "events whose [ts, ts+gap) windows overlap, so a gap of exactly "
        "30 minutes splits — the oracle's lag-based sessionizer uses >= on "
        "the exact-microsecond interval, and session_end = last event + "
        "gap, matching session_window.end."
    ),
)
def adsb_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(
            F.count("*").alias("n_reports"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_reports",
            "first_seen",
            "last_seen",
        )
        .orderBy("user_id", "session_start")
    )


_HAVERSINE_DUCK = (
    "2 * 3440.065 * asin(sqrt("
    "pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
    "cos(radians({lat1})) * cos(radians({lat2})) * "
    "pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
)


def _haversine_nm_col(lat1, lon1, lat2, lon2):
    """Great-circle distance in nautical miles — the exact expression shape
    used by streaming/stateful.py's tracker, as JVM-side columns."""
    a = (
        F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)
    )
    return 2 * 3440.065 * F.asin(F.sqrt(a))


@register(
    "adsb_track_distance",
    f"""
    WITH pts AS (
      SELECT user_id, ts, event_id,
             fmod(coalesce(value, 0), 90) AS lat,
             fmod(coalesce(value, 0) * 7, 180) AS lon
      FROM events
    ),
    steps AS (
      SELECT user_id, lat, lon, ts, event_id,
             lag(lat) OVER w AS prev_lat,
             lag(lon) OVER w AS prev_lon
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    track AS (
      SELECT user_id,
             count(*) AS n_reports,
             round(coalesce(sum(CASE WHEN prev_lat IS NOT NULL THEN
               {_HAVERSINE_DUCK.format(lat1='prev_lat', lon1='prev_lon', lat2='lat', lon2='lon')}
             END), 0), 3) AS distance_nm
      FROM steps
      GROUP BY user_id
    ),
    hpts AS (
      SELECT event_id, user_id, date_trunc('hour', ts) AS hb, lat, lon
      FROM pts
    ),
    prox AS (
      SELECT a.event_id AS event_a, b.event_id AS event_b,
             a.user_id AS user_a, b.user_id AS user_b,
             round({_HAVERSINE_DUCK.format(lat1='a.lat', lon1='a.lon', lat2='b.lat', lon2='b.lon')}, 3) AS dist_nm
      FROM hpts a JOIN hpts b
        ON a.hb = b.hb AND a.event_id < b.event_id AND a.user_id <> b.user_id
      WHERE round({_HAVERSINE_DUCK.format(lat1='a.lat', lon1='a.lon', lat2='b.lat', lon2='b.lon')}, 3) <= 15.0
    ),
    centers AS (
      SELECT event_id, lat, lon FROM pts WHERE event_id % 1000 = 0
    ),
    rad AS (
      SELECT p.event_id AS event_a, c.event_id AS event_b,
             p.user_id AS user_a,
             round({_HAVERSINE_DUCK.format(lat1='p.lat', lon1='p.lon', lat2='c.lat', lon2='c.lon')}, 3) AS dist_nm
      FROM pts p, centers c
      WHERE round({_HAVERSINE_DUCK.format(lat1='p.lat', lon1='p.lon', lat2='c.lat', lon2='c.lon')}, 3) <= 25.0
    ),
    gedges AS (
      SELECT * FROM (VALUES
        (1, 19.73, 31.17, 41.29, 33.91),
        (1, 41.29, 33.91, 38.57, 58.23),
        (1, 38.57, 58.23, 17.11, 54.77),
        (1, 17.11, 54.77, 19.73, 31.17),
        (1, 25.0, 40.0, 33.0, 41.5),
        (1, 33.0, 41.5, 31.0, 49.0),
        (1, 31.0, 49.0, 24.0, 47.0),
        (1, 24.0, 47.0, 25.0, 40.0),
        (2, -49.31, -119.43, -21.87, -117.29),
        (2, -21.87, -117.29, -35.53, -99.71),
        (2, -35.53, -99.71, -22.63, -82.17),
        (2, -22.63, -82.17, -48.19, -84.33),
        (2, -48.19, -84.33, -49.31, -119.43)
      ) AS t(poly, y1, x1, y2, x2)
    ),
    gf AS (
      SELECT p.event_id AS event_a, CAST(t.poly AS BIGINT) AS event_b,
             p.user_id AS user_a
      FROM pts p JOIN gedges t
        ON ((t.y1 > p.lat) <> (t.y2 > p.lat))
       AND (p.lon < (t.x2 - t.x1) * (p.lat - t.y1) / (t.y2 - t.y1) + t.x1)
      GROUP BY p.event_id, t.poly, p.user_id
      HAVING count(*) % 2 = 1
    )
    SELECT 'track' AS branch, user_id, n_reports, distance_nm,
           CAST(NULL AS BIGINT) AS event_a, CAST(NULL AS BIGINT) AS event_b,
           CAST(NULL AS BIGINT) AS user_a, CAST(NULL AS BIGINT) AS user_b,
           CAST(NULL AS DOUBLE) AS dist_nm
    FROM track
    UNION ALL
    SELECT 'proximity', NULL, NULL, NULL,
           event_a, event_b, user_a, user_b, dist_nm
    FROM prox
    UNION ALL
    SELECT 'radius', NULL, NULL, NULL,
           event_a, event_b, user_a, CAST(NULL AS BIGINT), dist_nm
    FROM rad
    UNION ALL
    SELECT 'geofence', NULL, NULL, NULL,
           event_a, event_b, user_a, CAST(NULL AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM gf
    ORDER BY branch, user_id, event_a, event_b
    """,
    doc=(
        "Tagged union (registry packing, see COVERAGE.md). branch='track': "
        "ST4 batch twin of the stateful tracker's distance-flown aggregate "
        "(streaming/stateful.py) — per-key lag + haversine + sum with "
        "synthetic coordinates derived from `value` (fmod into valid "
        "lat/lon ranges). branch='proximity': the ADS-B conflict-detection "
        "self-join — pairs of DIFFERENT users' reports in the same hour "
        "bucket within 15 nm great-circle — via operators/geo.py's "
        "grid-bucketed candidate join (exploded 3×(2k+1) neighborhood, "
        "equi-join on (hour, cell), exact haversine verify), while the "
        "oracle brute-forces within hour buckets. branch='radius' (r9): "
        "points_in_radius — every report within 25 nm of a small derived "
        "center list (event_id % 1000), exercising the broadcast "
        "exploded-centers join against the oracle's brute-force cross "
        "join. branch='geofence' (r9): points_in_polygons — every report "
        "inside either of two fixed airspace polygons (a convex quad and "
        "a concave chevron), the containment compiled into ONE codegen "
        "projection (bbox guard + even-odd crossing parity, zero "
        "joins/shuffles) while the oracle computes the identical parity "
        "via an edge-table join + GROUP BY HAVING count(*)%2=1; the "
        "crossing intersect (x2-x1)*(lat-y1)/(y2-y1)+x1 is written with "
        "the same IEEE association in both engines, so strict "
        "comparisons cannot ULP-flip membership. "
        "The physical strategies differ, the result sets must not. "
        "Same haversine literal association in both engines; membership "
        "at the radius boundary is decided on the ROUNDED distance "
        "(round(d,3) <= R) in both — the operators run with a +0.001 nm "
        "padded radius so their internal unrounded filter is never the "
        "binding constraint and a libm ULP cannot flip row membership "
        "(round-8 advisor finding)."
    ),
)
def adsb_track_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.geo import (
        points_in_polygons,
        points_in_radius,
        proximity_pairs,
    )

    e = load_table(spark, sf_dir, "events")
    v = F.coalesce(F.col("value"), F.lit(0.0))
    # r15 A/B note: materializing this shared projection once (lazy
    # localCheckpoint) was measured SLOWER than letting all four
    # branches re-scan parquet (median 4.98 s vs 3.87 s at sf0.1) —
    # four columnar scans of a 2 MB file beat one row-cache
    # materialization + three cache reads. Left as independent scans.
    pts = e.select(
        "user_id",
        "ts",
        "event_id",
        (v % 90).alias("lat"),
        ((v * 7) % 180).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = pts.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("prev_lat"),
        F.lag("lon").over(w).alias("prev_lon"),
    )
    step_nm = F.when(
        F.col("prev_lat").isNotNull(),
        _haversine_nm_col(F.col("prev_lat"), F.col("prev_lon"), F.col("lat"), F.col("lon")),
    )
    track = (
        steps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_reports"),
            F.round(F.coalesce(F.sum(step_nm), F.lit(0.0)), 3).alias("distance_nm"),
        )
        .select(
            F.lit("track").alias("branch"),
            "user_id",
            "n_reports",
            "distance_nm",
            F.lit(None).cast("long").alias("event_a"),
            F.lit(None).cast("long").alias("event_b"),
            F.lit(None).cast("long").alias("user_a"),
            F.lit(None).cast("long").alias("user_b"),
            F.lit(None).cast("double").alias("dist_nm"),
        )
    )
    hpts = pts.select(
        "event_id",
        "user_id",
        F.date_trunc("hour", "ts").alias("hb"),
        "lat",
        "lon",
    )
    # +0.001 nm pad: the operator's internal unrounded filter must never
    # be the binding constraint — gate membership is decided on the
    # rounded distance below, identically in both engines (ULP-robust)
    prox = (
        proximity_pairs(
            hpts,
            radius_nm=15.001,
            id_col="event_id",
            bucket_cols=("hb",),
            carry_cols=("user_id",),
            exclude_same=("user_id",),
        )
        .withColumn("dist_nm", F.round("dist_nm", 3))
        .filter(F.col("dist_nm") <= 15.0)
        .select(
            F.lit("proximity").alias("branch"),
            F.lit(None).cast("long").alias("user_id"),
            F.lit(None).cast("long").alias("n_reports"),
            F.lit(None).cast("double").alias("distance_nm"),
            F.col("id_a").alias("event_a"),
            F.col("id_b").alias("event_b"),
            F.col("user_id_a").alias("user_a"),
            F.col("user_id_b").alias("user_b"),
            "dist_nm",
        )
    )
    centers = pts.filter(F.col("event_id") % 1000 == 0).select(
        F.col("event_id").alias("center_id"), "lat", "lon"
    )
    rad = (
        points_in_radius(hpts, centers, radius_nm=25.001)
        .withColumn("dist_nm", F.round("dist_nm", 3))
        .filter(F.col("dist_nm") <= 25.0)
        .select(
            F.lit("radius").alias("branch"),
            F.lit(None).cast("long").alias("user_id"),
            F.lit(None).cast("long").alias("n_reports"),
            F.lit(None).cast("double").alias("distance_nm"),
            F.col("event_id").alias("event_a"),
            F.col("center_id").alias("event_b"),
            F.col("user_id").alias("user_a"),
            F.lit(None).cast("long").alias("user_b"),
            "dist_nm",
        )
    )
    # polygon 1 is a multi-ring zone (r10): outer ring + an exclusion
    # hole — the even-odd parity law handles both in one expression, and
    # the oracle's edge table simply lists the hole ring's edges under
    # the same poly id (parity over all edges is ring-structure-blind)
    gf_polys = {
        1: [
            [(19.73, 31.17), (41.29, 33.91), (38.57, 58.23), (17.11, 54.77)],
            [(25.0, 40.0), (33.0, 41.5), (31.0, 49.0), (24.0, 47.0)],
        ],
        2: [(-49.31, -119.43), (-21.87, -117.29), (-35.53, -99.71),
            (-22.63, -82.17), (-48.19, -84.33)],
    }
    gf = points_in_polygons(pts, gf_polys, poly_id_type="long").select(
        F.lit("geofence").alias("branch"),
        F.lit(None).cast("long").alias("user_id"),
        F.lit(None).cast("long").alias("n_reports"),
        F.lit(None).cast("double").alias("distance_nm"),
        F.col("event_id").alias("event_a"),
        F.col("poly_id").alias("event_b"),
        F.col("user_id").alias("user_a"),
        F.lit(None).cast("long").alias("user_b"),
        F.lit(None).cast("double").alias("dist_nm"),
    )
    return (
        track.unionByName(prox)
        .unionByName(rad)
        .unionByName(gf)
        .orderBy("branch", "user_id", "event_a", "event_b")
    )


# adsb_sliding_rollup merged into the adsb_rollups tagged union above
# (round-7 registry packing; the sliding branch is unchanged work)
