"""Scale probe for perceptual-hash media dedup
(operators/multimodal.py::perceptual_hash + phash_near_dup): N media
rows with 256-byte payloads, planted near-duplicates, and a hot
constant-payload cluster exercising the band-frequency valve.

Corpus (deterministic, splitmix-style uint64 mixing so no two base
payloads collide):

- ids with id % 10 == 1 are near-dups of id-1: same payload with two
  4-byte blocks pushed to extremes (the blockhash flips those blocks'
  bits and possibly a couple of median-adjacent ones — recovery at
  Hamming <= 3 is reported, not assumed);
- ids with id % 200 == 7 all carry the SAME constant payload (the
  letterboxed-thumbnail mega-cluster): ~n/200 rows whose band keys are
  identical, which without the valve contribute ~(n/200)^2/2 candidate
  pairs. The probe runs near-dup WITH max_band_freq=100 so they are
  dropped; exact dedup owns them.

Usage: python tools/bench_phash_scale.py [n_rows]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

PAYLOAD = 256


def make_media(spark, n: int):
    import numpy as np
    import pandas as pd

    js = np.arange(PAYLOAD, dtype=np.uint64)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            base = np.where(ids % 10 == 1, ids - 1, ids).astype(np.uint64)
            v = (
                base[:, None] * np.uint64(6364136223846793005)
                + js[None, :] * np.uint64(1442695040888963407)
            )
            v ^= v >> np.uint64(31)
            v *= np.uint64(0x9E3779B97F4A7C15)
            pix = ((v >> np.uint64(33)) % np.uint64(256)).astype(np.uint8)
            near = ids % 10 == 1
            pix[near, 12:16] = 255  # block 3 bright
            pix[near, 160:164] = 0  # block 40 dark
            pix[ids % 200 == 7, :] = 128  # constant mega-cluster
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [row.tobytes() for row in pix],
                    "media_type": "image",
                    "format": "png",
                }
            )

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "media_id long, payload binary, media_type string, format string")
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.multimodal import (
        perceptual_hash,
        phash_near_dup,
    )
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("phash-scale")
    media = make_media(spark, n).persist()
    media.count()  # materialize: probe timings exclude generation

    t0 = time.time()
    hashes = perceptual_hash(media).persist()
    hashes.count()
    t_hash = time.time() - t0

    t0 = time.time()
    pairs = phash_near_dup(hashes, max_hamming=3, max_band_freq=100).persist()
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    planted = pairs.filter(
        (F.col("id_b") - F.col("id_a") == 1) & (F.col("id_b") % 10 == 1)
    ).count()
    n_planted = sum(1 for i in range(n) if i % 10 == 1)
    n_hot = sum(1 for i in range(n) if i % 200 == 7)
    hot_pairs = pairs.filter((F.col("id_a") % 200 == 7) & (F.col("id_b") % 200 == 7)).count()

    print(
        json.dumps(
            {
                "n_media": n,
                "hash_sec": round(t_hash, 1),
                "near_dup_sec": round(t_pairs, 1),
                "pairs_found": n_pairs,
                "planted_recovered": planted,
                "planted_total": n_planted,
                "recovery": round(planted / max(n_planted, 1), 4),
                "hot_cluster_rows": n_hot,
                "hot_cluster_pairs_emitted": hot_pairs,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
