"""Per-query profiling for the optimization rounds (guide §1): splits
each registry row's wall time into PLAN-BUILD (the spec.spark() call —
where driver-side work like BPE learning, CC loops, and eager
localCheckpoints run) vs EXECUTE (collect), and counts the Spark jobs
each phase submits (every job is fixed scheduling overhead at sf0.1 —
the corpus is tiny, so job/stage count dominates the wall clock).

Usage: python tools/profile_queries.py [sf_dir] [query ...]
Writes a JSON report to /tmp/profile_queries.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    from adsb_clickhouse_spark import queries as q
    from adsb_clickhouse_spark.session import get_spark

    q.load_all()
    spark = get_spark("profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    # warm-up identical to bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in q.TABLES:
        q.load_table(spark, sf_dir, t).count()

    def job_count() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return len(ids)

    rows = []
    names = [n for n in q.REGISTRY if not only or n in only]
    N = int(os.environ.get("PROFILE_RUNS", "2"))
    for name in names:
        spec = q.REGISTRY[name]
        best = None
        for _ in range(N):
            sc.setJobDescription(f"profile:{name}")
            j0 = job_count()
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = job_count()
            len(df.collect())
            t2 = time.perf_counter()
            j2 = job_count()
            rec = {
                "name": name,
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "build_jobs": j1 - j0,
                "exec_jobs": j2 - j1,
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        rows.append(best)
        sc.setJobDescription(None)
        print(
            f"{best['name']:35s} total {best['total_s']:7.2f}  "
            f"build {best['build_s']:6.2f} ({best['build_jobs']:3d} jobs)  "
            f"exec {best['exec_s']:6.2f} ({best['exec_jobs']:3d} jobs)",
            flush=True,
        )
    rows.sort(key=lambda r: -r["total_s"])
    with open("/tmp/profile_queries.json", "w") as fh:
        json.dump(rows, fh, indent=1)
    print("\n=== sorted by total ===")
    for r in rows:
        print(
            f"{r['name']:35s} total {r['total_s']:7.2f}  "
            f"build {r['build_s']:6.2f} ({r['build_jobs']:3d} jobs)  "
            f"exec {r['exec_s']:6.2f} ({r['exec_jobs']:3d} jobs)"
        )


if __name__ == "__main__":
    main()
