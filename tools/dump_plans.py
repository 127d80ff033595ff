"""Dump explain('formatted') for registry rows to plans/<tag>/<query>_<suffix>.txt
(the optimization rounds' before/after plan evidence — guide §1).

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
e.g.   python tools/dump_plans.py r15 before dedup_ngram_jaccard text_quality
With no query names, dumps every registry row.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from adsb_clickhouse_spark import queries as q
    from adsb_clickhouse_spark.session import get_spark

    q.load_all()
    spark = get_spark("dump_plans")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name, spec in q.REGISTRY.items():
        if only and name not in only:
            continue
        try:
            df = spec.spark(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record, keep dumping
            plan = f"ERROR building plan: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
