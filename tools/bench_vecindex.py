"""Scale probe of the STREAMING stored vector index
(operators/vecindex.py) — the embedding twin of
tools/bench_streaming_curation.py's fingerprint-store measurement.

Regime: a 1M-vector corpus arrives as 50 micro-batch segment appends
against the bootstrap-seeded generation, then the index is compacted
(Lloyd recluster + fold). Measured:

- per-append wall (the steady-state ingest cost: one Arrow assignment
  pass + a partitioned segment write, batch-sized);
- probe latency against the 50-segment accreted pile vs against the
  compacted single generation (the price of never compacting is
  re-listing + re-scanning every segment per probe);
- compaction wall (the one corpus-sized maintenance job);
- recall@1 with a NARROW probe (nprobe/n_lists = 4/64): each query is
  a perturbed copy (x1.001) of a sampled corpus vector, which must rank
  first — measured against the bootstrap-seeded quantizer (pre-compact)
  and the Lloyd-re-learned one (post-compact).

Usage: python tools/bench_vecindex.py [n_vectors] [dim] [n_lists]
Defaults 1_000_000, 32, 64. Prints one JSON line for README's table.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_lists = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_batches, nprobe, n_probe_queries = 50, 4, 40

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators import vecindex as V
    from adsb_clickhouse_spark.session import get_spark

    sys.path.insert(0, "tools")
    from bench_ivf_scale import make_clustered_vectors

    spark = get_spark("vecindex-scale")
    corpus = make_clustered_vectors(spark, n, dim, n_lists, seed=0)
    src = corpus.withColumn("batch", (F.col("vec_id") % n_batches).cast("int"))
    src = src.persist()
    src.count()

    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "vidx")
    V.init_vector_index(spark, path, dim=dim, n_lists=n_lists)

    t0 = time.time()
    append_walls = []
    for b in range(n_batches):
        t1 = time.time()
        V.append_vector_index(
            src.filter(F.col("batch") == b).select("vec_id", "embedding"),
            path,
            f"b{b:03d}",
        )
        append_walls.append(time.time() - t1)
    t_appends = time.time() - t0

    qrows = [
        (int(1_000_000_000 + i), i * (n // n_probe_queries))
        for i in range(n_probe_queries)
    ]
    targets = [t for _qid, t in qrows]
    tdf = (
        src.filter(F.col("vec_id").isin(targets))
        .select("vec_id", "embedding")
        .collect()
    )
    tmap = {r["vec_id"]: r["embedding"] for r in tdf}
    queries = spark.createDataFrame(
        [(qid, [x * 1.001 for x in tmap[t]]) for qid, t in qrows],
        "vec_id long, embedding array<double>",
    )

    t0 = time.time()
    pre = V.knn_probe_stored(spark, path, queries, k=1, nprobe=nprobe).collect()
    t_probe_segments = time.time() - t0
    pre_hits = sum(
        1 for r in pre if r["rank"] == 1 and tmap.get(r["neighbor_id"]) is not None
        and r["neighbor_id"] == dict(qrows)[r["query_id"]]
    )

    t0 = time.time()
    stats = V.compact_vector_index(spark, path, iters=2)
    t_compact = time.time() - t0

    t0 = time.time()
    post = V.knn_probe_stored(spark, path, queries, k=1, nprobe=nprobe).collect()
    t_probe_compacted = time.time() - t0
    post_hits = sum(
        1 for r in post if r["rank"] == 1
        and r["neighbor_id"] == dict(qrows)[r["query_id"]]
    )

    out = {
        "n_vectors": n,
        "dim": dim,
        "n_lists": n_lists,
        "n_batches": n_batches,
        "append_total_sec": round(t_appends, 1),
        "append_median_sec": round(sorted(append_walls)[len(append_walls) // 2], 2),
        "probe_over_segments_sec": round(t_probe_segments, 1),
        "probe_compacted_sec": round(t_probe_compacted, 1),
        "compact_sec": round(t_compact, 1),
        "folded_segments": stats["folded_segments"],
        "nprobe": nprobe,
        "recall_at1_pre_compact": f"{pre_hits}/{n_probe_queries}",
        "recall_at1_post_compact": f"{post_hits}/{n_probe_queries}",
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
