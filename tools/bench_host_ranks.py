"""Scale probe for the streaming host-rank maintain job
(streaming/curation.py::recompute_host_ranks): the periodic
domain-reputation recompute over the ACCUMULATED per-batch edge store —
fold segments to the distinct edge set, one pagerank_multi propagation
(PageRank + TrustRank together), generational write + pointer swap.

Setup: E synthetic host-link edges over N hosts written directly as
``n_segments`` committed ``batch_id=`` segments (the layout the ingest
accretes), with ~20% duplicate (src, dst) rows across segments — the
redelivery/repeat-link reality the distinct fold absorbs. The probe
times (1) the first recompute (fold + rank + write + swap), (2) a
second recompute with no new segments — NOT a no-op: the job re-ranks
from the consolidated generation (deterministic integer ranks make
that idempotent), isolating the pure rank cost from the
100-tiny-segment fold — and (3) a third after 5 fresh segments land
(the steady-state incremental shape: consolidated edge SET + a small
tail).

Usage: python tools/bench_host_ranks.py [n_edges] [n_hosts] [n_segments]
Defaults: 5_000_000 edges, 100_000 hosts, 100 segments. Prints one
JSON line; headline numbers live in README's measured scale table.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def _edges(spark, lo: int, n: int, n_hosts: int):
    from pyspark.sql import functions as F

    base = spark.range(lo, lo + n)
    # ~20% of rows repeat the previous id's edge: cross-segment dups
    eid = F.when(F.col("id") % 5 == 4, F.col("id") - 1).otherwise(F.col("id"))
    # dst needs a NON-LINEAR mix of the id: a multiplicative constant
    # mod n_hosts collapses to a function of (id mod n_hosts) and the
    # graph degenerates to one edge per residue
    return base.select(
        F.concat(F.lit("h"), (eid % n_hosts).cast("string")).alias("src"),
        F.concat(
            F.lit("h"), F.pmod(F.xxhash64(eid), F.lit(n_hosts)).cast("string")
        ).alias("dst"),
        F.col("id").alias("_id"),
    ).filter(F.col("src") != F.col("dst"))


def main() -> int:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_segments = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.session import get_spark
    from adsb_clickhouse_spark.streaming.curation import CurationIngest

    spark = get_spark("bench-host-ranks")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="hostranks_")
    try:
        ing = CurationIngest(
            base,
            run_id="p",
            host_col="host",
            host_links_col="out_links",
            host_trust_seeds=[f"h{i}" for i in range(1, 51)],
        )
        (
            _edges(spark, 0, n_edges, n_hosts)
            .withColumn(
                "batch_id",
                F.concat(F.lit("seed-"), (F.col("_id") % n_segments).cast("string")),
            )
            .drop("_id")
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(ing.host_edges_path)
        )
        for i in range(n_segments):
            ing._write_marker(f"seed-{i}")

        t0 = time.time()
        s1 = ing.recompute_host_ranks(spark)
        first = round(time.time() - t0, 1)

        t0 = time.time()
        s2 = ing.recompute_host_ranks(spark)
        rerank = round(time.time() - t0, 1)
        assert s2["folded_segments"] == 0

        (
            _edges(spark, n_edges, n_edges // 20, n_hosts)
            .withColumn(
                "batch_id",
                F.concat(F.lit("tail-"), (F.col("_id") % 5).cast("string")),
            )
            .drop("_id")
            .write.mode("append")
            .partitionBy("batch_id")
            .parquet(ing.host_edges_path)
        )
        for i in range(5):
            ing._write_marker(f"tail-{i}")
        t0 = time.time()
        s3 = ing.recompute_host_ranks(spark)
        incr = round(time.time() - t0, 1)

        print(json.dumps({
            "n_edge_rows": n_edges,
            "n_hosts": n_hosts,
            "n_segments": n_segments,
            "distinct_edges": s1["edges"],
            "graph_hosts": s1["hosts"],
            "trust_seeds_in_graph": s1["trust_seeds_in_graph"],
            "first_recompute_sec": first,
            "rerank_from_generation_sec": rerank,
            "incremental_recompute_sec": incr,
            "edges_after_tail": s3["edges"],
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
