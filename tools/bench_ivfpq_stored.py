"""Wall-clock probe of the STORED IVF-ADC layout (VERDICT r5 #1 + #2).

The composed index (operators/similarity.ivfpq_build) written to disk
via write_ann_layout(key_col="list_id") is the repo's concrete 100 TB
ANN promise: a probe lists only its nprobe ``list_id=`` directories and
reads m small int codes per row instead of D doubles. This tool puts
numbers on that promise at ≥1M vectors:

- build the Lloyd-refined (iters>0) IVF-ADC index once, write TWO
  layouts: codes-only (the pure-ADC byte story) and codes+vectors
  (keep_vectors=True — the IVFADC+R layout, Jégou et al. TPAMI 2011 §V)
- probe FROM DISK both ways: pure ADC (cluster-recall — PQ collapses
  same-cluster vectors to tied codes, so exact-rank order is not the
  ADC contract) and ADC→exact-rerank (recall@k vs brute force — the
  property users consume)
- brute-force FROM DISK over the raw corpus: wall time + total bytes
- bytes under the probed directories vs the whole layout / raw corpus

Usage: python tools/bench_ivfpq_stored.py [n_vectors] [dim] [n_lists]
Defaults: 1_000_000 vectors, 32 dims, 64 lists, m=8, ksub=256,
nprobe=16, k=10, rerank=1000, corpus noise 2.0 (the PQ-meaningful
regime — at the tight default noise every cluster member collapses to
one code and ADC ties id-break; see make_clustered_vectors). Prints
one JSON line for README's scale table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_lists = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    m, ksub, nprobe, k, n_queries, iters, rerank = 8, 256, 16, 10, 20, 2, 1000

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.layout import write_ann_layout
    from adsb_clickhouse_spark.operators.similarity import (
        _id_as_long,
        _ivfpq_query_state,
        as_double,
        ivfpq_build,
        ivfpq_probe_stored,
        knn_bruteforce,
    )
    from adsb_clickhouse_spark.session import get_spark
    from tools.bench_ivf_scale import make_clustered_vectors

    spark = get_spark("ivfpq-stored")
    base = tempfile.mkdtemp(prefix="ivfpq_bench_")
    codes_path = os.path.join(base, "layout_codes")
    full_path = os.path.join(base, "layout_full")
    raw_path = os.path.join(base, "raw_corpus")
    try:
        corpus = make_clustered_vectors(
            spark, n, dim, n_lists, seed=0, noise=2.0
        ).persist()
        corpus.count()
        queries = corpus.filter(F.col("vec_id") % (n // n_queries) == 0).persist()
        nq = queries.count()

        t0 = time.time()
        indexed, coarse, pq_cents = ivfpq_build(
            corpus, n_lists=n_lists, m=m, ksub=ksub, iters=iters,
            keep_vectors=True, id_col="vec_id", vec_col="embedding",
        )
        indexed = indexed.persist()
        write_ann_layout(indexed.drop("v"), codes_path, key_col="list_id", sort_col="id")
        write_ann_layout(indexed, full_path, key_col="list_id", sort_col="id")
        t_build = time.time() - t0

        corpus.write.mode("overwrite").parquet(raw_path)

        # probe FROM DISK — pure ADC over the codes-only layout
        t0 = time.time()
        adc_hits = ivfpq_probe_stored(
            spark, codes_path, coarse, pq_cents, queries,
            k=k, nprobe=nprobe, id_col="vec_id", vec_col="embedding",
        ).collect()
        t_adc = time.time() - t0

        # probe FROM DISK — ADC shortlist + exact rerank (IVFADC+R)
        t0 = time.time()
        rr_hits = ivfpq_probe_stored(
            spark, full_path, coarse, pq_cents, queries,
            k=k, nprobe=nprobe, rerank=rerank,
            id_col="vec_id", vec_col="embedding",
        ).collect()
        t_rerank = time.time() - t0

        # full scan FROM DISK — exact brute force over raw vectors
        stored_corpus = spark.read.parquet(raw_path)
        t0 = time.time()
        exact = knn_bruteforce(
            stored_corpus, queries, k=k, id_col="vec_id", vec_col="embedding", dim=dim
        ).collect()
        t_exact = time.time() - t0

        # bytes under the probed directories vs the whole layout — the
        # physical footprint partition pruning buys (union of probe
        # lists over all queries; per query it's nprobe dirs)
        qrows = queries.select(
            _id_as_long(queries, "vec_id", "query_id"),
            as_double(F.col("embedding")).alias("qv"),
        ).collect()
        probe_rows, _lk, _qn, _m = _ivfpq_query_state(
            coarse, pq_cents, qrows, nprobe=nprobe
        )
        probed = {f"list_id={li}" for _q, li in probe_rows}
        probe_bytes_codes = sum(
            _dir_bytes(os.path.join(codes_path, d)) for d in probed
        )
        probe_bytes_full = sum(
            _dir_bytes(os.path.join(full_path, d)) for d in probed
        )

        def toset(rows):
            s = {}
            for r in rows:
                s.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return s

        adc_s, rr_s, exact_s = toset(adc_hits), toset(rr_hits), toset(exact)
        cluster_ok = sum(
            1
            for q, nbrs in adc_s.items()
            for nb in nbrs
            if nb % n_lists == q % n_lists
        )
        n_adc = sum(len(v) for v in adc_s.values())

        def recall(got):
            return sum(
                len(got.get(q, set()) & nbrs) / len(nbrs)
                for q, nbrs in exact_s.items()
            ) / max(len(exact_s), 1)

        print(json.dumps({
            "n_vectors": n, "dim": dim, "n_lists": n_lists, "m": m,
            "ksub": ksub, "iters": iters, "nprobe": nprobe, "k": k,
            "rerank": rerank, "n_queries": nq,
            "build_write_sec": round(t_build, 1),
            "stored_adc_probe_sec": round(t_adc, 1),
            "stored_rerank_probe_sec": round(t_rerank, 1),
            "fullscan_bruteforce_sec": round(t_exact, 1),
            "probed_dirs": len(probed), "total_dirs": n_lists,
            "probe_bytes_codes": probe_bytes_codes,
            "probe_bytes_with_vectors": probe_bytes_full,
            "codes_layout_bytes": _dir_bytes(codes_path),
            "full_layout_bytes": _dir_bytes(full_path),
            "raw_corpus_bytes": _dir_bytes(raw_path),
            "adc_cluster_recall": round(cluster_ok / max(n_adc, 1), 4),
            "rerank_recall_at_k": round(recall(rr_s), 4),
        }))
        return 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
