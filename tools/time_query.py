"""Time one registry row exactly the bench way (build + collect), N runs,
print each run + median. Usage: python tools/time_query.py <query> [N]"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from adsb_clickhouse_spark import queries as q
    from adsb_clickhouse_spark.session import get_spark

    q.load_all()
    spark = get_spark("time_query")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in q.TABLES:
        q.load_table(spark, sf_dir, t).count()
    spec = q.REGISTRY[name]
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        len(df.collect())
        runs.append(round(time.perf_counter() - t0, 3))
    print(f"{name}: runs={runs} median={statistics.median(runs):.3f}")


if __name__ == "__main__":
    main()
