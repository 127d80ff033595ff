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

``--trust`` switches to the TrustRank mode: the same graph plus a
DISCONNECTED 100k-edge spam component (node ids >= n_nodes, no path
from any seed), seeds = the 10 biggest legitimate hubs. Verified
planted truth: every spam node holds rank EXACTLY 0 after 5 rounds
(integer teleport leaks no epsilon into unreachable components), while
the legitimate component carries all the mass.

``--weighted`` attaches integer link multiplicities (1 + id mod 100) to
the same graph and runs the weighted law — same joins, one extra long
column through the propagation; wall should match unweighted.

Usage: python tools/bench_pagerank_scale.py [--trust|--weighted] [n_edges] [n_nodes]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    trust = "--trust" in sys.argv[1:]
    weighted = "--weighted" in sys.argv[1:]
    n_edges = int(args[0]) if len(args) > 0 else 5_000_000
    n_nodes = int(args[1]) if len(args) > 1 else 500_000
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
    if weighted:
        edges = edges.withColumn(
            "w", (F.pmod(F.col("src") + F.col("dst"), F.lit(100)) + 1).cast("long")
        )
    seeds = None
    if trust:
        # disconnected spam ring: ids >= n_nodes, unreachable from seeds
        spam = spark.range(100_000).select(
            (F.col("id") + F.lit(n_nodes)).alias("src"),
            (
                (F.col("id") + 1) % F.lit(100_000) + F.lit(n_nodes)
            ).alias("dst"),
        )
        edges = edges.union(spam)
        seeds = list(range(10))
    edges = edges.localCheckpoint(eager=True)  # exclude generation cost
    n_e = edges.count()

    t0 = time.time()
    ranks = pagerank(
        edges,
        iterations=iters,
        seeds=seeds,
        weight_col="w" if weighted else None,
    )
    build_s = time.time() - t0

    t0 = time.time()
    top = ranks.orderBy(F.desc("rank_fp"), "node").limit(10).collect()
    total = ranks.agg(F.sum("rank_fp")).collect()[0][0]
    spam_mass = (
        ranks.filter(F.col("node") >= n_nodes)
        .agg(F.coalesce(F.sum("rank_fp"), F.lit(0)))
        .collect()[0][0]
        if trust
        else None
    )
    read_s = time.time() - t0

    top_ids = [r["node"] for r in top]
    drift = PAGERANK_SCALE - total

    out = {
        "mode": "trustrank" if trust else (
            "pagerank_weighted" if weighted else "pagerank"
        ),
        "n_edges": n_e,
        "n_nodes": n_nodes + (100_000 if trust else 0),
        "iterations": iters,
        "pagerank_total_sec": round(build_s, 1),
        "per_iteration_sec": round(build_s / iters, 2),
        "topk_read_sec": round(read_s, 2),
        "top3_is_012_in_order": top_ids[:3] == [0, 1, 2],
        "top1_rank_share_pct": round(100.0 * top[0]["rank_fp"] / PAGERANK_SCALE, 2),
        "mass_drift_ppm": round(1e6 * drift / PAGERANK_SCALE, 3),
    }
    if trust:
        out["spam_component_rank_total"] = spam_mass
        out["spam_exactly_zero"] = spam_mass == 0
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
