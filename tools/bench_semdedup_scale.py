"""Scale probe for SemDeDup (operators/similarity.py::semdedup):
1M clustered vectors with planted semantic duplicates, Lloyd-refined
clustering — the regime the oracle gate can't exercise (iters=0 there
for SQL expressibility) — plus planted-duplicate recovery.

Corpus: the bench_ivf_scale clustered generator with every vector whose
id % 10 == 1 replaced by a near-copy of id-1 (tiny deterministic
perturbation → cosine ≈ 1), so 10% of the corpus is a planted semantic
dup whose witness is known. SemDeDup must drop (almost) exactly the
planted set: a planted pair straddling a k-means cell boundary is the
paper's accepted recall miss, so we report recovery, not assert 100%.

The probe demonstrates the O(Σ c_i²) claim directly: doubling n_lists
roughly halves the within-cluster pairwise work, so wall time is
reported at two cluster counts.

Usage: python tools/bench_semdedup_scale.py [n_vectors] [dim]
Defaults: 1_000_000 vectors, 32 dims; n_lists ∈ {n/1000, 2n/1000}
(cluster size, not cluster count, stays bounded); iters=2.
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from bench_ivf_scale import make_clustered_vectors

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.similarity import semdedup
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("semdedup-scale")
    base = make_clustered_vectors(spark, n, dim, 64, noise=2.0)
    # plant dups: id % 10 == 1 becomes a near-copy of id-1 (same latent
    # cluster, +0.001 per coordinate -> cosine ~ 1); one broadcast-free
    # equi-join on the shifted id ships each donor vector to its copy
    donors = base.select(
        (F.col("vec_id") + 1).alias("vec_id"), F.col("embedding").alias("donor")
    )
    vecs = (
        base.join(donors, "vec_id", "left")
        .select(
            "vec_id",
            F.when(
                (F.col("vec_id") % 10 == 1) & F.col("donor").isNotNull(),
                F.transform(F.col("donor"), lambda x: x + 0.001),
            )
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )
        .persist()
    )
    vecs.count()  # materialize: probe timings exclude generation

    planted = sum(1 for i in range(n) if i % 10 == 1 and i >= 1)
    out = {"n_vectors": n, "dim": dim, "planted_dups": planted}
    # n_lists grows ∝ n (the documented SemDeDup contract: cluster size,
    # not cluster count, is what must stay bounded); two counts probe the
    # O(Σ c_i²) scaling directly
    from adsb_clickhouse_spark.operators.similarity import ivf_build

    base_lists = max(64, n // 1000)
    for n_lists in (base_lists, 2 * base_lists):
        t0 = time.time()
        dropped = semdedup(vecs, threshold=0.99, n_lists=n_lists, iters=2)
        rows = dropped.select("id", "witness").collect()
        wall = time.time() - t0
        ids = {r["id"] for r in rows}
        hit = sum(1 for i in range(1, n, 10) if i in ids)
        out[f"lists{n_lists}_wall_sec"] = round(wall, 1)
        out[f"lists{n_lists}_dropped"] = len(ids)
        out[f"lists{n_lists}_planted_recovered"] = hit
        out[f"lists{n_lists}_recovery"] = round(hit / max(planted, 1), 4)
        # isolate the O(Σ c_i²) pairwise term: end-to-end wall is
        # DOMINATED by the Lloyd assignment passes (O(n·n_lists·d) per
        # pass, so it GROWS with n_lists); the paper's halving claim is
        # about the within-cluster prune, measured here alone via the
        # precomputed-assignments path (the stored-IVF-layout shape)
        assigns, _ = ivf_build(
            vecs, n_lists=n_lists, iters=2, id_col="vec_id", vec_col="embedding"
        )
        assigns = assigns.persist()  # already (id, list_id)
        assigns.count()
        t0 = time.time()
        pruned = semdedup(
            vecs, threshold=0.99, n_lists=n_lists, assignments=assigns
        )
        out[f"lists{n_lists}_prune_dropped"] = pruned.count()
        out[f"lists{n_lists}_prune_only_sec"] = round(time.time() - t0, 1)
        assigns.unpersist()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
