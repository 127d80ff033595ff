"""Scale probe for the Lloyd-refined IVF ANN path (VERDICT r4 #5).

Generates a deterministic clustered corpus (the regime IVF exists for),
builds the coarse quantizer WITH k-means refinement iterations — the
path the oracle gate can't exercise (iters=0 there for SQL
expressibility) — then measures build wall time, probe wall time, and
recall@k against exact brute force at a fixed nprobe.

Usage: python tools/bench_ivf_scale.py [n_vectors] [dim] [n_lists]
Defaults: 1_000_000 vectors, 32 dims, 64 lists, nprobe=8, k=10.

Prints one JSON line; the headline numbers live in README's measured
scale behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def make_clustered_vectors(
    spark, n: int, dim: int, n_clusters: int, *, seed: int = 0, noise: float = 0.5
):
    """(vec_id long, embedding array<double>) — n vectors in n_clusters
    well-separated latent clusters. Fully deterministic regardless of
    partitioning: every value is a pure function of (vec_id, dim index)
    via quasi-random sin folding, so reruns and different parallelism
    produce the identical corpus (no RNG-per-partition seeding traps).

    ``noise`` scales the within-cluster spread. The tight default (0.5
    vs center scale 4.0) makes cluster membership unambiguous — right
    for coarse-quantizer recall tests, but degenerate for PQ: every
    member collapses to the same code and ADC ties id-break. Raise it
    (e.g. 2.0) for a corpus where PQ codes must discriminate WITHIN a
    cluster — the regime real embedding corpora live in."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 1.0, (n_clusters, dim)) * 4.0
    bc = spark.sparkContext.broadcast(centers)
    # per-dimension irrational multipliers make sin(id * m_j) decorrelated
    mults = np.sqrt(np.arange(2, dim + 2, dtype=np.float64))

    def gen(batches):
        c = bc.value
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            cl = ids % c.shape[0]
            nz = np.sin(np.outer(ids + 1, mults)) * noise
            mat = c[cl] + nz
            yield pd.DataFrame({"vec_id": ids, "embedding": list(mat)})

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_lists = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    nprobe, k, n_queries, iters = 8, 10, 20, 2

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.similarity import (
        ivf_build,
        ivf_search,
        knn_bruteforce,
    )
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("ivf-scale")
    corpus = make_clustered_vectors(spark, n, dim, n_lists, seed=0)
    corpus = corpus.persist()
    corpus.count()  # materialize so build timing excludes generation

    queries = corpus.filter(F.col("vec_id") % (n // n_queries) == 0).persist()
    nq = queries.count()

    t0 = time.time()
    assignments, centroids = ivf_build(
        corpus, n_lists=n_lists, iters=iters, id_col="vec_id", vec_col="embedding"
    )
    assignments = assignments.persist()
    assignments.count()
    t_build = time.time() - t0

    t0 = time.time()
    ivf_hits = ivf_search(
        corpus, assignments, centroids, queries,
        k=k, nprobe=nprobe, id_col="vec_id", vec_col="embedding",
    ).collect()
    t_probe = time.time() - t0

    t0 = time.time()
    exact_hits = knn_bruteforce(
        corpus, queries, k=k, id_col="vec_id", vec_col="embedding", dim=dim
    ).collect()
    t_exact = time.time() - t0

    def toset(rows):
        s = {}
        for r in rows:
            s.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return s

    ivf_s, exact_s = toset(ivf_hits), toset(exact_hits)
    recall = sum(
        len(ivf_s.get(q, set()) & nbrs) / len(nbrs) for q, nbrs in exact_s.items()
    ) / max(len(exact_s), 1)

    print(json.dumps({
        "n_vectors": n, "dim": dim, "n_lists": n_lists, "iters": iters,
        "nprobe": nprobe, "k": k, "n_queries": nq,
        "build_sec": round(t_build, 1), "probe_sec": round(t_probe, 1),
        "bruteforce_sec": round(t_exact, 1), "recall_at_k": round(recall, 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
