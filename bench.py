"""Benchmark: every oracled query at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Methodology: one JVM warm-up action + one warm scan per input table, then
each registered query measured once end-to-end (plan -> execute ->
collect). `len(df.collect())` forces the full projection and ordering to
execute (a bare .count() lets Catalyst prune projection-only work — the
round-1 advisor flagged exactly that). `value` is the sum of per-query
wall times; `delta_vs_r1` carries the round-1 numbers forward for the
queries that existed then (negative = faster now).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline subset preserved for cross-round comparability (same list as r1)
HEADLINE = [
    "adsb_latest_per_key",
    "adsb_latest_view_freshness",
    "adsb_stride_sample",
    "adsb_union_fan_in",
    "adsb_minute_rollup",
    "adsb_sessionize",
    "q01_pricing_summary",
    "q03_order_revenue",
    "q05_region_revenue",
    "q_top3_orders_per_customer",
    "q_asof_last_error_before_purchase",
    "q_rollup_order_priority",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_knn_bruteforce",
    "sim_ann_lsh",
    "text_quality",
    "text_token_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from adsb_clickhouse_spark import queries as q
    from adsb_clickhouse_spark.session import get_spark

    q.load_all()
    spark = get_spark("bench")
    # JVM / codegen / page-cache warm-up (excluded from timings): one scan
    # per input table so measured queries reflect steady-state execution
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in q.TABLES:
        q.load_table(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    for name, spec in q.REGISTRY.items():
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        n = len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 3)
        del n
    total = round(sum(timings.values()), 3)
    headline_total = round(sum(timings[n] for n in HEADLINE if n in timings), 3)

    # per-query delta vs the recorded round-1 bench (if present)
    delta: dict[str, float] = {}
    r1_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r01.json")
    try:
        with open(r1_path) as fh:
            r1 = json.load(fh)
        r1_q = r1.get("parsed", r1).get("queries", {})
        delta = {
            n: round(timings[n] - r1_q[n], 3) for n in timings if n in r1_q
        }
    except (OSError, ValueError, AttributeError):
        pass

    # ingest throughput through the full MV cascade (history + state +
    # combined), comparable to the reference's ~550-830 rows/s envelope
    # (BASELINE.md "Sustained ingest volume")
    import tempfile

    from adsb_clickhouse_spark.config import GLOBAL_STREAM
    from adsb_clickhouse_spark.sources.fixtures import raw_batch
    from adsb_clickhouse_spark.streaming.pipeline import IngestPipeline

    raw = raw_batch(
        spark, GLOBAL_STREAM, n_aircraft=12000, n_scrapes=2, with_edges=False
    ).persist()
    n_rows = raw.count()
    with tempfile.TemporaryDirectory() as tmp:
        pipe = IngestPipeline(GLOBAL_STREAM, tmp)
        t0 = time.perf_counter()
        pipe.process_batch(raw)
        ingest_s = time.perf_counter() - t0
    raw.unpersist()
    ingest_rate = round(n_rows / ingest_s, 1)

    print(
        json.dumps(
            {
                "metric": "full_query_suite_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "headline_20_total": headline_total,
                "delta_vs_r1": delta,
                "ingest_rows_per_sec": ingest_rate,
                "ingest_rows": n_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
