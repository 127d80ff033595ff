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

Usage: python tools/bench_geo_scale.py [n_rows]
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


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.geo import proximity_pairs
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("geo-scale")
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
