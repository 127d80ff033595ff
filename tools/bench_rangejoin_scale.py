"""Scale probe for the bucketized interval join
(operators/rangejoin.py): 5M points joined to 200k intervals (avg
length ~1000 over a 100M-value domain, ~10 matches per interval).

The naive ``BETWEEN`` formulation plans as BroadcastNestedLoopJoin —
O(|P|·|I|) = 10^12 predicate evaluations at this size — so the probe
times it only at 1/50 scale on each side and reports the extrapolated
full-size cost next to the bucketized join's measured wall time.

Usage: python tools/bench_rangejoin_scale.py [n_points] [n_intervals]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

DOMAIN = 100_000_000


def main() -> int:
    n_p = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_i = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.rangejoin import interval_join
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("rangejoin-scale")
    pts = (
        spark.range(n_p)
        .select(
            F.col("id").alias("pid"),
            ((F.xxhash64("id") % DOMAIN + DOMAIN) % DOMAIN).alias("x"),
        )
        .persist()
    )
    ivs = (
        spark.range(n_i)
        .select(
            F.col("id").alias("iid"),
            ((F.xxhash64("id", F.lit(7)) % DOMAIN + DOMAIN) % DOMAIN).alias("s"),
            (F.abs(F.xxhash64("id", F.lit(13))) % 2000).alias("len"),
        )
        .select("iid", "s", (F.col("s") + F.col("len")).alias("e"))
        .persist()
    )
    pts.count(), ivs.count()

    t0 = time.time()
    matched = interval_join(
        pts, ivs, point_col="x", start_col="s", end_col="e"
    ).count()
    bucketized = time.time() - t0

    # the naive nested loop at 1/50 of each side, extrapolated
    frac = 50
    sp = pts.filter(F.col("pid") % frac == 0)
    si = ivs.filter(F.col("iid") % frac == 0)
    t0 = time.time()
    naive_small = sp.join(
        si, (sp["x"] >= si["s"]) & (sp["x"] <= si["e"])
    ).count()
    naive = time.time() - t0

    print(
        json.dumps(
            {
                "n_points": n_p,
                "n_intervals": n_i,
                "matched_pairs": matched,
                "bucketized_sec": round(bucketized, 1),
                "naive_at_1_over_50_scale_sec": round(naive, 1),
                "naive_small_pairs": naive_small,
                "naive_extrapolated_sec": round(naive * frac * frac, 0),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
