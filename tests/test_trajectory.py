"""Trajectory resampling (operators/trajectory.py) vs a pure-Python
reference: grid alignment, half-open segment semantics, gap cap,
duplicate-timestamp safety."""

import random
from datetime import datetime, timedelta

from adsb_clickhouse_spark.operators.trajectory import resample_track

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _py_resample(rows, interval_s, max_gap_s=None):
    """rows: (key, ts_micros, lat, lon) — same semantics as the operator."""
    dt = interval_s * 1_000_000
    out = []
    by_key = {}
    for k, t, la, lo in rows:
        by_key.setdefault(k, []).append((t, la, lo))
    for k, pts in by_key.items():
        pts.sort()
        for (t0, la0, lo0), (t1, la1, lo1) in zip(pts, pts[1:]):
            if max_gap_s is not None and t1 - t0 > max_gap_s * 1_000_000:
                continue
            g = t0 + (dt - (t0 % dt)) % dt
            while g < t1:
                f = (g - t0) / (t1 - t0)
                out.append((k, g, la0 + (la1 - la0) * f, lo0 + (lo1 - lo0) * f))
                g += dt
    return sorted(out)


def _mk(spark, rows):
    data = [
        (k, T0 + timedelta(microseconds=t), la, lo) for k, t, la, lo in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, lat double, lon double"
    )


def _collect(df):
    return sorted(
        (
            r["user_id"],
            int(r["grid_ts"].timestamp() * 1_000_000)
            if False
            else (r["grid_ts"] - T0) // timedelta(microseconds=1),
            r["lat"],
            r["lon"],
        )
        for r in df.collect()
    )


def test_resample_matches_python_reference(spark):
    rng = random.Random(13)
    rows = []
    for k in range(5):
        t = rng.randint(0, 10**6)
        for _ in range(rng.randint(2, 12)):
            rows.append(
                (k, t, rng.uniform(-80, 80), rng.uniform(-170, 170))
            )
            t += rng.randint(1, 400) * 1_000_000  # 1..400 s gaps
    got = _collect(resample_track(_mk(spark, rows), interval_s=60))
    want = _py_resample(rows, 60)
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert g[2] == w[2] and g[3] == w[3]  # bit-identical IEEE chains


def test_on_grid_report_emitted_once_with_exact_values(spark):
    """A report sitting exactly on a grid instant is emitted by the
    segment it starts (weight 0 — its own values), never twice."""
    rows = [
        (1, 0, 10.0, 20.0),
        (1, 60_000_000, 11.0, 21.0),   # exactly on the 60 s grid
        (1, 120_000_000, 12.0, 22.0),
    ]
    got = _collect(resample_track(_mk(spark, rows), interval_s=60))
    assert got == [
        (1, 0, 10.0, 20.0),
        (1, 60_000_000, 11.0, 21.0),
    ]  # final report's instant has no following segment


def test_max_gap_drops_dark_segments(spark):
    rows = [
        (1, 0, 0.0, 0.0),
        (1, 100_000_000, 1.0, 1.0),        # 100 s segment: kept
        (1, 10_000_000_000, 2.0, 2.0),     # ~2.7 h gap: dropped
    ]
    got = _collect(resample_track(_mk(spark, rows), interval_s=60, max_gap_s=300))
    want = _py_resample(rows, 60, max_gap_s=300)
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    assert max(g[1] for g in got) < 100_000_000


def test_duplicate_timestamps_are_safe(spark):
    rows = [
        (1, 0, 0.0, 0.0),
        (1, 0, 5.0, 5.0),  # duplicate ts: empty segment, no div-by-zero
        (1, 90_000_000, 9.0, 9.0),
    ]
    df = resample_track(_mk(spark, rows), interval_s=60)
    got = _collect(df)
    assert all(g[1] in (0, 60_000_000) for g in got)
    assert all(abs(g[2]) < 10 for g in got)  # finite, no NaN/Inf


def test_locf_step_fill(spark):
    """method='locf' carries the segment-start value forward at every
    grid instant (step fill), including weight-0 on-grid reports."""
    rows = [
        (1, 0, 10.0, 20.0),
        (1, 150_000_000, 16.0, 26.0),  # 2.5 min later
        (1, 240_000_000, 24.0, 44.0),
    ]
    got = _collect(
        resample_track(_mk(spark, rows), interval_s=60, method="locf")
    )
    assert got == [
        (1, 0, 10.0, 20.0),
        (1, 60_000_000, 10.0, 20.0),
        (1, 120_000_000, 10.0, 20.0),
        (1, 180_000_000, 16.0, 26.0),
        # 240 s == the final report's own instant: half-open segments
        # never emit it (no following segment), same as linear
    ]


def test_bad_method_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="method"):
        resample_track(_mk(spark, [(1, 0, 0.0, 0.0)]), interval_s=60, method="cubic")
