"""Scale probe for fixed-point PageRank (operators/graph.py::pagerank):
a synthetic host graph with a power-law in-degree tail — 5M edges over
~500k nodes by default, destination drawn as floor(N * u^4) so low-id
nodes are mega-hubs (node 0 collects ~100k in-links, the regime a real
web host graph puts on a registrar domain).

Scale shape exercised: the edge table is joined with out-degrees and
repartitioned on src ONCE (it never moves again), each of the 5 rounds
exchanges only the node-sized rank table + one per-dst aggregate over
the pinned edge partitions, the dangling mass is a 1-row aggregate, and
per-round localCheckpoint keeps the plan flat — per-iteration wall
should be ~constant, not growing with round number.

Verified planted truth: the top-3 ranked nodes must be 0, 1, 2 in that
order (in-degree is monotone decreasing in node id by construction;
below the top few, second-order effects — who links you, not how many —
legitimately reorder near-ties) and total rank mass must equal the
fixed-point scale minus bounded floor drift.

Usage: python tools/bench_pagerank_scale.py [n_edges] [n_nodes]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    iters = 5

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.graph import (
        PAGERANK_SCALE,
        pagerank,
    )
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("bench-pagerank")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic edges: src ~ uniform, dst ~ floor(N * u^4) power-law
    u = (F.col("id") * F.lit(2654435761) % F.lit(1_000_000_007)).cast(
        "double"
    ) / F.lit(1_000_000_007.0)
    edges = spark.range(n_edges).select(
        (F.col("id") * F.lit(40503) % F.lit(n_nodes)).alias("src"),
        F.floor(F.lit(float(n_nodes)) * F.pow(u, F.lit(4.0))).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    edges = edges.localCheckpoint(eager=True)  # exclude generation cost
    n_e = edges.count()

    t0 = time.time()
    ranks = pagerank(edges, iterations=iters)
    build_s = time.time() - t0

    t0 = time.time()
    top = ranks.orderBy(F.desc("rank_fp"), "node").limit(10).collect()
    total = ranks.agg(F.sum("rank_fp")).collect()[0][0]
    read_s = time.time() - t0

    top_ids = [r["node"] for r in top]
    drift = PAGERANK_SCALE - total

    print(json.dumps({
        "n_edges": n_e,
        "n_nodes": n_nodes,
        "iterations": iters,
        "pagerank_total_sec": round(build_s, 1),
        "per_iteration_sec": round(build_s / iters, 2),
        "topk_read_sec": round(read_s, 2),
        "top3_is_012_in_order": top_ids[:3] == [0, 1, 2],
        "top1_rank_share_pct": round(100.0 * top[0]["rank_fp"] / PAGERANK_SCALE, 2),
        "mass_drift_ppm": round(1e6 * drift / PAGERANK_SCALE, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
