"""Scale probe for the streaming-curation store lifecycle
(streaming/curation.py): per-batch latency must stay FLAT as the
fingerprint store grows, and the bucketed compaction must beat the
accumulated-tiny-segments layout it replaces.

Setup: the store is seeded with N synthetic fingerprints spread over
``n_segments`` ``batch_id=`` directories — the exact layout an
uncompacted ingest accretes (one segment per micro-batch). The probe
then measures the SAME micro-batch (20k docs through the full funnel)
three ways:

  1. empty store (baseline — the no-memory floor),
  2. N-fingerprint store as raw segments (what r6 shipped),
  3. N-fingerprint store after ``compact_fingerprints`` (bucketed
     catalog table, one generation).

Flatness claim = (3) ≈ (1): the anti-join against a bucketed store
reads matching buckets without re-listing/re-shuffling the store, so
the per-batch cost is driven by the batch, not the memory. (2) − (3)
is the price of never compacting.

Usage: python tools/bench_streaming_curation.py [n_fps] [n_segments]
Defaults: 1_000_000 fingerprints over 200 segments. Prints one JSON
line; headline numbers live in README's measured scale behavior table.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def _batch(spark, lo: int, n: int):
    from pyspark.sql import functions as F

    return (
        spark.range(lo, lo + n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("probe document number "),
                F.col("id").cast("string"),
                F.lit(" with a body of words long enough for the funnel"),
            ).alias("text"),
        )
    )


def _time_batches(ing, spark, lo: int, k: int = 3, n: int = 20_000):
    times = []
    for i in range(k):
        t0 = time.time()
        ing.process_batch(_batch(spark, lo + i * n, n), batch_id=1000 + lo + i)
        times.append(round(time.time() - t0, 2))
    return times


def main() -> int:
    n_fps = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_segments = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.session import get_spark
    from adsb_clickhouse_spark.streaming.curation import CurationIngest

    spark = get_spark("streaming-curation-scale")
    out = {"n_fps": n_fps, "n_segments": n_segments}

    base_empty = tempfile.mkdtemp(prefix="cur_empty_")
    base_big = tempfile.mkdtemp(prefix="cur_big_")
    tbl = None
    try:
        # 1. empty-store floor
        ing0 = CurationIngest(base_empty, run_id="probe")
        out["latency_empty_store"] = _time_batches(ing0, spark, 0)

        # seed the big store: n_fps synthetic fingerprints laid out as
        # n_segments batch_id= directories (the uncompacted accretion)
        ing = CurationIngest(base_big, run_id="probe")
        per_seg = n_fps // n_segments
        seed = spark.range(n_fps).select(
            F.md5(F.concat(F.lit("seed|"), F.col("id").cast("string"))).alias(
                "fingerprint"
            ),
            (F.col("id") % n_segments).cast("string").alias("batch_id"),
        )
        t0 = time.time()
        seed.write.partitionBy("batch_id").parquet(ing.fps_path)
        out["seed_write_sec"] = round(time.time() - t0, 2)
        out["fps_per_segment"] = per_seg

        # 2. per-batch latency against the raw segment pile
        out["latency_segmented_store"] = _time_batches(ing, spark, 10_000_000)

        # 3. compact, then the same batches against the bucketed table
        t0 = time.time()
        stats = ing.compact_fingerprints(spark, buckets=32, assume_quiesced=True)
        out["compaction_sec"] = round(time.time() - t0, 2)
        out["compaction"] = stats
        tbl = stats.get("table")
        out["store_rows_after_compaction"] = ing.read_fingerprints(spark).count()
        out["latency_compacted_store"] = _time_batches(ing, spark, 20_000_000)

        med = lambda xs: sorted(xs)[len(xs) // 2]
        out["flatness_vs_empty"] = round(
            med(out["latency_compacted_store"]) / med(out["latency_empty_store"]), 3
        )
        out["speedup_vs_segmented"] = round(
            med(out["latency_segmented_store"]) / med(out["latency_compacted_store"]),
            3,
        )
        print(json.dumps(out))
        return 0
    finally:
        if tbl:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(base_empty, ignore_errors=True)
        shutil.rmtree(base_big, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
