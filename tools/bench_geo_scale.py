"""Scale probe for the geospatial proximity join
(operators/geo.py::proximity_pairs): N position reports across airway
clusters with planted conflict pairs and one airport-apron mega-cell
exercising the hot-cell valve.

Corpus (deterministic splitmix-style mixing):

- reports are scattered ±2° around 200 cluster centers whose
  latitudes reach 60° (so the longitude neighborhood half-width k
  actually varies per row);
- hour bucket hb = (id // 10) % 24, so each decade of ids shares a
  bucket;
- ids with id % 10 == 1 are planted conflicts: same cluster as id-1,
  DIFFERENT user, offset ~0.05° (≈3 nm) — well inside the 5 nm
  radius, so recovery must be 100%;
- ids with id % 500 == 7 sit on one apron (same cell, every bucket):
  ~n/500 rows whose per-bucket cell population is ~n/12000, which
  without the valve contributes O(freq²) candidate pairs per bucket.
  The probe runs WITH max_cell_freq=100 (apron priced away) and
  reports how many apron pairs were emitted (must be 0).

With ``--polar`` (round 9) the probe instead measures the longitude
fan-out regime the default corpus never reaches: all reports cluster at
one high latitude (75° and 85°, run back to back), where the ±k
longitude half-width grows as 1/cos(lat) toward the full-parallel
clamp. Reported per latitude: the mean/max explode factor (cells per
probe row), wall time, and planted recovery — the measured cost curve
behind the "recall never degrades toward the pole" claim.

With ``--stored`` (round 9) the corpus is first persisted as the
coarse-grid geo layout (operators/geo.py write_geo_layout) and a
3-center 50 nm dashboard probe runs FROM DISK via the partition-pruned
scan, compared against the same probe over the in-memory corpus —
reported: write time, probe-from-disk vs in-memory wall, touched/total
cell directories, and row parity.

Usage: python tools/bench_geo_scale.py [n_rows] [--polar|--stored]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def make_reports(spark, n: int):
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            # planted conflicts share id-1's base position
            base = np.where(ids % 10 == 1, ids - 1, ids).astype(np.uint64)

            def mix(v, salt):
                v = v * np.uint64(6364136223846793005) + np.uint64(salt)
                v ^= v >> np.uint64(31)
                v *= np.uint64(0x9E3779B97F4A7C15)
                return (v >> np.uint64(33)).astype(np.float64) / float(1 << 31)

            cluster = (base * np.uint64(2654435761)) % np.uint64(200)
            clat = (cluster.astype(np.float64) % 25) * 4.8 - 60.0  # −60…60
            clon = (cluster.astype(np.float64) // 25) * 44.0 - 176.0
            lat = clat + (mix(base, 11) - 0.5) * 4.0
            lon = clon + (mix(base, 13) - 0.5) * 4.0
            near = ids % 10 == 1
            lat = np.where(near, lat + 0.04, lat)
            lon = np.where(near, lon + 0.045, lon)
            apron = ids % 500 == 7
            lat = np.where(apron, 40.64 + mix(ids, 17) * 0.01, lat)
            lon = np.where(apron, -73.78 + mix(ids, 19) * 0.01, lon)
            yield pd.DataFrame(
                {
                    "event_id": ids.astype(np.int64),
                    "user_id": ids.astype(np.int64),  # every report its own user
                    "hb": ((ids // np.uint64(10)) % np.uint64(24)).astype(np.int32),
                    "lat": lat,
                    "lon": lon,
                }
            )

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "event_id long, user_id long, hb int, lat double, lon double")
    )


def make_polar_reports(spark, n: int, lat_center: float):
    """Reports clustered ±1° around one high latitude, full longitude
    spread; ids with id % 10 == 1 are planted conflicts ~3 nm from
    id−1 (same construction as make_reports)."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            base = np.where(ids % 10 == 1, ids - 1, ids).astype(np.uint64)

            def mix(v, salt):
                v = v * np.uint64(6364136223846793005) + np.uint64(salt)
                v ^= v >> np.uint64(31)
                v *= np.uint64(0x9E3779B97F4A7C15)
                return (v >> np.uint64(33)).astype(np.float64) / float(1 << 31)

            lat = lat_center + (mix(base, 11) - 0.5) * 2.0
            lon = (mix(base, 13) - 0.5) * 360.0
            near = ids % 10 == 1
            lat = np.where(near, lat + 0.04, lat)
            lon = np.where(near, lon + 0.045, lon)
            yield pd.DataFrame(
                {
                    "event_id": ids.astype(np.int64),
                    "user_id": ids.astype(np.int64),
                    "hb": ((ids // np.uint64(10)) % np.uint64(24)).astype(np.int32),
                    "lat": lat,
                    "lon": lon,
                }
            )

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "event_id long, user_id long, hb int, lat double, lon double")
    )


def run_polar(spark, n: int) -> dict:
    import math

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.geo import (
        _lon_halfwidth_cells,
        grid_cells,
        proximity_pairs,
    )

    radius = 5.0
    s = radius / 60.0
    n_x = math.ceil(360.0 / s)
    out = {"n_reports": n, "radius_nm": radius, "latitudes": {}}
    for lat_c in (75.0, 85.0):
        reports = make_polar_reports(spark, n, lat_c).persist()
        reports.count()
        # explode factor = cells per probe row, 3·(k + min(k, n_x−1−k) + 1)
        k = _lon_halfwidth_cells(F.col("lat"), s, s, n_x)
        fan = 3 * (k + F.least(k, F.lit(n_x - 1) - k) + 1)
        stats = reports.agg(
            F.round(F.avg(fan), 1).alias("mean"), F.max(fan).alias("max")
        ).collect()[0]
        t0 = time.time()
        pairs = proximity_pairs(
            reports,
            radius_nm=radius,
            id_col="event_id",
            bucket_cols=("hb",),
            exclude_same=("user_id",),
            max_cell_freq=100,
        ).persist()
        n_pairs = pairs.count()
        wall = time.time() - t0
        planted = pairs.filter(
            (F.col("id_b") - F.col("id_a") == 1) & (F.col("id_b") % 10 == 1)
        ).count()
        pairs.unpersist()
        reports.unpersist()
        out["latitudes"][str(lat_c)] = {
            "explode_mean": float(stats["mean"]),
            "explode_max": int(stats["max"]),
            "proximity_sec": round(wall, 1),
            "pairs_found": n_pairs,
            "planted_recovered": planted,
            "planted_total": n // 10,
        }
    print(json.dumps(out))
    return out


def run_stored(spark, n: int) -> dict:
    import os

    from adsb_clickhouse_spark.operators.geo import (
        points_in_radius,
        points_in_radius_stored,
        write_geo_layout,
    )

    import tempfile

    reports = make_reports(spark, n).persist()
    reports.count()
    centers = spark.createDataFrame(
        [(0, 40.64, -73.78), (1, 51.47, -0.45), (2, -33.95, 151.18)],
        "center_id long, lat double, lon double",
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "geo_layout")
        t0 = time.time()
        write_geo_layout(reports, path, cell_deg=5.0, sort_col="event_id")
        t_write = time.time() - t0
        n_dirs = sum(1 for e in os.listdir(path) if e.startswith("geo_cell="))
        # untimed warmup: the first broadcast join in a session pays JIT
        # + codegen compile (~2-4 s) — measured ordering artifact, not
        # probe cost; warm both paths before timing either
        points_in_radius(reports.limit(1000), centers, radius_nm=50.0).count()
        points_in_radius_stored(
            spark, path, centers, radius_nm=50.0, cell_deg=5.0
        ).count()
        t0 = time.time()
        stored_rows = points_in_radius_stored(
            spark, path, centers, radius_nm=50.0, cell_deg=5.0
        ).count()
        t_stored = time.time() - t0
        t0 = time.time()
        mem_rows = points_in_radius(reports, centers, radius_nm=50.0).count()
        t_mem = time.time() - t0
        # disk-vs-disk baseline: the same probe over an UNPRUNED scan of
        # the written layout — what the probe costs without the
        # partition filter (the in-memory number has the corpus already
        # persisted in executor RAM, so it understates scan cost)
        t0 = time.time()
        full_rows = points_in_radius(
            spark.read.parquet(path).drop("geo_cell"), centers, radius_nm=50.0
        ).count()
        t_full = time.time() - t0
        assert full_rows == mem_rows
        from adsb_clickhouse_spark.operators.geo import _touched_coarse_cells

        touched = len(
            _touched_coarse_cells(
                [(40.64, -73.78), (51.47, -0.45), (-33.95, 151.18)], 50.0, 5.0
            )
        )
    out = {
        "n_reports": n,
        "layout_write_sec": round(t_write, 1),
        "cell_dirs": n_dirs,
        "cells_probed": touched,
        "probe_from_disk_sec": round(t_stored, 1),
        "probe_full_disk_scan_sec": round(t_full, 1),
        "probe_in_memory_sec": round(t_mem, 1),
        "rows_match": stored_rows == mem_rows,
        "rows": stored_rows,
    }
    print(json.dumps(out))
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if a not in ("--polar", "--stored")]
    n = int(args[0]) if args else 2_000_000

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.geo import proximity_pairs
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("geo-scale")
    if "--polar" in sys.argv[1:]:
        run_polar(spark, n)
        return 0
    if "--stored" in sys.argv[1:]:
        run_stored(spark, n)
        return 0
    reports = make_reports(spark, n).persist()
    reports.count()  # materialize: probe timings exclude generation

    t0 = time.time()
    pairs = proximity_pairs(
        reports,
        radius_nm=5.0,
        id_col="event_id",
        bucket_cols=("hb",),
        exclude_same=("user_id",),
        max_cell_freq=100,
    ).persist()
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    planted = pairs.filter(
        (F.col("id_b") - F.col("id_a") == 1) & (F.col("id_b") % 10 == 1)
    ).count()
    n_planted = sum(
        1 for i in range(1, n, 10) if i % 500 != 7 and (i - 1) % 500 != 7
    )
    apron_pairs = pairs.filter(
        (F.col("id_a") % 500 == 7) & (F.col("id_b") % 500 == 7)
    ).count()

    print(
        json.dumps(
            {
                "n_reports": n,
                "proximity_sec": round(t_pairs, 1),
                "pairs_found": n_pairs,
                "planted_recovered": planted,
                "planted_total": n_planted,
                "recovery": round(planted / max(n_planted, 1), 4),
                "apron_rows": sum(1 for i in range(n) if i % 500 == 7),
                "apron_pairs_emitted": apron_pairs,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
