"""Scale-pin the text-demo pipeline (r12 verdict item 6): the 2k-doc
CLI run certified COMPOSITION; this pins SCALE — the same corpus →
hashed embedder → curation ingest (exact + band near-dedup + stored
IVF) → compaction → stored-kNN loop at 100k+ docs across multiple
batches with ≥2 compaction cycles, recording per-phase wall and the
stored-probe latency BEFORE and AFTER each compaction (the probe is
the text side's dashboard-latency analogue: it must stay bounded as
segments accrete and fold).

Corpus: pairwise-unique 14-word hashed texts with the text-demo's
planted structure — every i%10==1 doc is a byte-exact copy of its
neighbor, every i%10==6 doc a one-word-changed near-copy — generated
by Spark column expressions (no driver-side row list at 100k).

Usage: python tools/bench_text_demo_scale.py [n_docs] [n_batches]
Defaults: 100_000 docs / 10 batches, maintenance after batches 5 and
10 (two full compaction cycles). Prints one JSON line; the headline
row lives in README's measured scale behavior table.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 32


def _corpus(spark, lo: int, n: int):
    """The text-demo's planted corpus as pure column expressions."""
    from pyspark.sql import functions as F

    ids = spark.range(lo, lo + n).select(F.col("id").alias("doc_id"))
    # exact copies point at their neighbor's seed; near-copies use their
    # neighbor's seed but swap word 7
    eff = F.when(
        (F.col("doc_id") % 10 == 1) | (F.col("doc_id") % 10 == 6),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    words = [
        F.concat(
            F.lit("w"),
            F.substring(
                F.md5(F.concat(F.lit("d"), eff.cast("string"), F.lit(f"|{p}"))),
                1,
                6,
            ),
        )
        for p in range(14)
    ]
    words[7] = F.when(F.col("doc_id") % 10 == 6, F.lit("changed")).otherwise(
        words[7]
    )
    return ids.select("doc_id", F.concat_ws(" ", *words).alias("text"))


def _probe_latency(spark, ing, runs: int = 3) -> float:
    """Median stored-kNN probe wall (fresh paraphrase of doc 4)."""
    import hashlib

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.similarity import hashed_text_embeddings

    pw = [
        "w" + hashlib.md5(f"d4|{p}".encode()).hexdigest()[:6] for p in range(14)
    ]
    pw[2], pw[11] = "fresh", "probe"
    qdf = hashed_text_embeddings(
        spark.createDataFrame(
            [(9_999_999, " ".join(pw))], "doc_id long, text string"
        ),
        dim=DIM,
    ).select(F.col("doc_id").alias("vec_id"), "embedding")
    walls = []
    hit = None
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = ing.knn(spark, qdf, k=3, nprobe=8).collect()
        walls.append(time.perf_counter() - t0)
        hit = bool(rows and rows[0]["neighbor_id"] == 4)
    assert hit, f"stored probe lost the planted doc: {rows}"
    return round(statistics.median(walls), 2)


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    per_batch = n_docs // n_batches

    from adsb_clickhouse_spark.session import get_spark
    from adsb_clickhouse_spark.streaming.curation import CurationIngest

    spark = get_spark("text-demo-scale")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="text_demo_scale_")
    try:
        ing = CurationIngest(
            base,
            run_id="scale",
            text_near_dedup=True,
            text_dedup_threshold=0.5,
            vector_index=True,
            embed_dim=DIM,
            vector_n_lists=16,
        )
        batch_walls: list[float] = []
        maintain_walls: list[float] = []
        probe_track: list[dict] = []
        half = n_batches // 2
        for b in range(n_batches):
            t0 = time.perf_counter()
            ing.process_batch(_corpus(spark, b * per_batch, per_batch), batch_id=b)
            batch_walls.append(round(time.perf_counter() - t0, 2))
            if b + 1 in (half, n_batches):
                # probe latency BEFORE the fold (segments accreted)...
                probe_track.append(
                    {
                        "after_batch": b + 1,
                        "state": "pre-compaction",
                        "probe_sec": _probe_latency(spark, ing),
                        "live_segments": ing.live_segment_counts(),
                    }
                )
                t0 = time.perf_counter()
                with ing.maintenance_lease():
                    ing.compact_fingerprints(spark)
                    ing.compact_text_bands(spark)
                    ing.compact_vector_index(spark)
                    ing.compact_ingest_log(spark)
                maintain_walls.append(round(time.perf_counter() - t0, 2))
                # ...and AFTER it (the folded generation serves probes)
                probe_track.append(
                    {
                        "after_batch": b + 1,
                        "state": "post-compaction",
                        "probe_sec": _probe_latency(spark, ing),
                        "live_segments": ing.live_segment_counts(),
                    }
                )
        rep = ing.ingest_report(spark)
        out = {
            "n_docs": n_docs,
            "n_batches": n_batches,
            "admitted": rep["admitted"],
            "dropped_exact": rep["dropped"]["exact_text"]
            + rep["dropped"]["store_dup"],
            "dropped_near": rep["dropped"]["text_near_batch"]
            + rep["dropped"]["text_near_store"],
            "batch_walls": batch_walls,
            "batch_wall_median": round(statistics.median(batch_walls), 2),
            "maintain_walls": maintain_walls,
            "probe_track": probe_track,
            "total_sec": round(sum(batch_walls) + sum(maintain_walls), 1),
        }
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
