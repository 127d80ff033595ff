"""Scale probe for the streaming media near-dedup band store
(streaming/curation.py, media_near_dedup=True): per-batch latency must
stay flat as the stored media population grows, because the probe is an
equi-join on the single bkey long against a store that is bucketed on
exactly that key after compaction — the fingerprint-store physics
applied to the banded-LSH key.

Setup: N synthetic 640-byte payloads are perceptually hashed (one Arrow
pass) and their (bkey, phash) band rows written as ``n_segments``
committed ``batch_id=`` segments — the layout an uncompacted ingest
accretes. The probe then pushes the SAME 5k-doc media batch (2% planted
near-copies of stored media: 5 leading bytes forced to 0xFF, blockhash
hamming <= 3) through the full funnel three ways:

  1. empty band store (baseline — the no-memory floor),
  2. N-media store as raw segments,
  3. the same store after ``compact_phash_bands`` (bkey-bucketed table).

Every run asserts all planted near-copies are suppressed (in store
states 2 and 3) and fresh media survive.

Usage: python tools/bench_band_store.py [n_media] [n_segments]
Defaults: 200_000 media over 50 segments. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

N_BATCH = 5_000
N_PLANTED = 100


def _payloads_df(spark, lo: int, n: int, *, copy_of=None):
    """n synthetic payloads for ids [lo, lo+n); ids with
    ``copy_of(id) is not None`` get a near-copy (5 leading 0xFF bytes)
    of that source id's payload."""
    from pyspark.sql import functions as F  # noqa: F401

    def gen(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads, texts = [], []
            for did in pdf["id"]:
                src = copy_of(int(did)) if copy_of else None
                seed = src if src is not None else int(did)
                rs = np.random.RandomState(seed % (2**31))
                px = rs.randint(0, 256, 640).astype(np.uint8)
                if src is not None:
                    px[:5] = 255
                payloads.append(px.tobytes())
                texts.append(
                    f"probe document {did} with a body of words long "
                    "enough for the funnel"
                )
            yield pd.DataFrame(
                {"doc_id": pdf["id"], "text": texts, "payload": payloads}
            )

    return spark.range(lo, lo + n).repartition(32).mapInPandas(
        gen, "doc_id long, text string, payload binary"
    )


def _seed_band_store(spark, ing, n_media: int, n_segments: int) -> None:
    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.multimodal import (
        perceptual_hash,
        phash_band_keys,
    )

    media = _payloads_df(spark, 1_000_000, n_media).select(
        F.col("doc_id").alias("media_id"), "payload"
    )
    bands = phash_band_keys(perceptual_hash(media)).select(
        "bkey",
        "phash",
        (F.col("id") % n_segments).cast("string").alias("__seg"),
    )
    (
        bands.withColumn("batch_id", F.concat(F.lit("seed-"), F.col("__seg")))
        .drop("__seg")
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(ing.phash_bands_path)
    )
    for i in range(n_segments):
        ing._write_marker(f"seed-{i}")


def main() -> int:
    n_media = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_segments = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from adsb_clickhouse_spark.session import get_spark
    from adsb_clickhouse_spark.streaming.curation import CurationIngest

    spark = get_spark("bench-band-store")
    spark.sparkContext.setLogLevel("ERROR")

    # planted near-copies reference seed ids 1_000_000..1_000_099
    def copy_of(did: int):
        k = did - 2_000_000
        return 1_000_000 + k if 0 <= k < N_PLANTED else None

    batch = _payloads_df(
        spark, 2_000_000, N_BATCH, copy_of=copy_of
    ).localCheckpoint(eager=True)
    batch.count()

    walls, out = {}, {}

    def _run(tag: str, seed: bool, compact: bool) -> None:
        base = tempfile.mkdtemp(prefix=f"bandstore_{tag}_")
        try:
            ing = CurationIngest(
                base, run_id="p", media_dedup=True, media_near_dedup=True
            )
            if seed:
                _seed_band_store(spark, ing, n_media, n_segments)
            if compact:
                stats = ing.compact_phash_bands(spark)
                assert stats["folded_segments"] == n_segments, stats
            t0 = time.time()
            ing.process_batch(batch, batch_id=0)
            walls[tag] = round(time.time() - t0, 1)
            kept = ing.curated(spark).count()
            out[f"kept_{tag}"] = kept
            if seed:
                # all planted near-copies suppressed by the stored bands
                assert kept == N_BATCH - N_PLANTED, (tag, kept)
            else:
                assert kept == N_BATCH, (tag, kept)
        finally:
            shutil.rmtree(base, ignore_errors=True)

    _run("empty", seed=False, compact=False)
    _run("segments", seed=True, compact=False)
    _run("compacted", seed=True, compact=True)

    print(json.dumps({
        "n_media_stored": n_media,
        "n_segments": n_segments,
        "batch_docs": N_BATCH,
        "planted_near_copies": N_PLANTED,
        "batch_sec_empty_store": walls["empty"],
        "batch_sec_segment_store": walls["segments"],
        "batch_sec_compacted_store": walls["compacted"],
        **out,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
