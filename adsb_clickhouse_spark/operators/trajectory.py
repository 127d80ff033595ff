"""Trajectory resampling: per-aircraft fixed-interval grid with linear
interpolation between bracketing reports — the track-smoothing /
alignment operator a position feed needs before cross-aircraft
analytics (two tracks can only be compared at common timestamps).
Reference context: the reference stores raw irregular reports
(schema/schema-local.sql history tables) and leaves resampling to
dashboards; here it is a first-class operator.

Spark-first shape: ONE window (lag over the per-key time order) turns
the feed into half-open segments [t0, t1), an ``F.sequence`` explode
emits each segment's grid instants, and the interpolation is a codegen
arithmetic projection — one shuffle total (the window), no joins, no
Python. Grid arithmetic is exact integer micros (``pmod`` alignment,
no float rounding of instants); the value interpolation
``v0 + (v1 - v0) * frac`` with ``frac = (g - t0)/(t1 - t0)`` is an
IEEE chain written with the same association as the DuckDB oracle
twin (the 'resample' branch of adsb_sessionize), so results match
bit-for-bit.

Semantics:

- Segments are HALF-OPEN: a grid instant equal to a report's own
  timestamp is emitted by the segment it STARTS (weight-0
  interpolation — the report's exact values), never twice; the final
  report's instant has no following segment and is not emitted.
- ``max_gap_s`` skips interpolation across implausible gaps (a track
  that went dark for hours should not be smoothly connected); the
  segment is simply dropped, like the session-gap rule.
- Duplicate (key, ts) reports produce empty segments (t1 == t0 ⇒ no
  grid instants, and the division never runs on an emitted row).

At 100 TB: the one exchange is the window's hash partition on the
track key — the same partitioning every per-track analytic reuses;
explode fan-out is (segment span / interval) rows per segment, emitted
streamingly by Generate (never buffered), and everything after the
window is whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MICROS = 1_000_000


def resample_track(
    reports: DataFrame,
    *,
    interval_s: int,
    id_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("lat", "lon"),
    order_tiebreak: tuple[str, ...] = (),
    max_gap_s: int | None = None,
    method: str = "linear",
) -> DataFrame:
    """Resample each key's reports onto the fixed ``interval_s`` grid.

    Returns (``id_col``, ``grid_ts`` timestamp, *value_cols) — one row
    per grid instant that falls inside a [t0, t1) report segment (and,
    with ``max_gap_s``, only segments no wider than the cap).
    ``method='linear'`` interpolates each value between the bracketing
    reports; ``method='locf'`` carries the last observation forward
    (step fill — the ClickHouse ``WITH FILL`` / timeseries gap-fill
    semantics, right for categorical or sensor-latched columns where a
    synthetic average is a lie). Same plan either way — the method only
    changes the projected expression."""
    if method not in ("linear", "locf"):
        raise ValueError(f"method must be 'linear' or 'locf', got {method!r}")
    dt = int(interval_s) * MICROS
    w = Window.partitionBy(id_col).orderBy(ts_col, *order_tiebreak)
    t1 = F.unix_micros(F.col(ts_col))
    seg = reports.select(
        F.col(id_col),
        F.lag(t1).over(w).alias("_t0"),
        t1.alias("_t1"),
        *[F.lag(c).over(w).alias(f"_{c}0") for c in value_cols],
        *[F.col(c).alias(f"_{c}1") for c in value_cols],
    ).filter(F.col("_t0").isNotNull())
    if max_gap_s is not None:
        seg = seg.filter(F.col("_t1") - F.col("_t0") <= int(max_gap_s) * MICROS)
    # exact integer grid alignment: smallest multiple of dt >= t0, and
    # the largest one <= t1 - 1 (half-open upper bound)
    g_start = F.col("_t0") + F.pmod(F.lit(dt) - F.pmod(F.col("_t0"), F.lit(dt)), F.lit(dt))
    g_end = (F.col("_t1") - 1) - F.pmod(F.col("_t1") - 1, F.lit(dt))
    grid = seg.withColumn(
        "_g",
        F.explode(
            F.when(
                g_start <= g_end, F.sequence(g_start, g_end, F.lit(dt))
            ).otherwise(F.array().cast("array<long>"))
        ),
    )
    frac = (F.col("_g") - F.col("_t0")).cast("double") / (
        F.col("_t1") - F.col("_t0")
    ).cast("double")
    out = [
        F.col(id_col),
        F.timestamp_micros(F.col("_g")).alias("grid_ts"),
    ]
    if method == "locf":
        out += [F.col(f"_{c}0").alias(c) for c in value_cols]
    else:
        out += [
            (
                F.col(f"_{c}0") + (F.col(f"_{c}1") - F.col(f"_{c}0")) * frac
            ).alias(c)
            for c in value_cols
        ]
    return grid.select(*out)
