"""Scale probe for the MinHash-LSH dedup path: 500k documents with
planted near-duplicates and exact duplicates, end-to-end wall time and
found-pair counts.

The corpus is deterministic (every token a pure function of
(doc_id, position) — stable under partitioning and reruns):

- base docs: 40 tokens from a 50k-word vocabulary
- ids with id % 20 == 1 are near-dups of id-1 (last token changed →
  3 of 38 shingles differ, true Jaccard ≈ 0.92)
- ids with id % 50 == 2 are byte-identical copies of id-2

Usage: python tools/bench_dedup_scale.py [n_docs]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def make_corpus(spark, n: int):
    import numpy as np
    import pandas as pd

    n_tok, vocab = 40, 50_000
    mults = np.sqrt(np.arange(2, n_tok + 2, dtype=np.float64))

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            base = np.where(ids % 20 == 1, ids - 1, ids)  # near-dup source
            base = np.where(base % 50 == 2, base - 2, base)  # exact-dup source
            words = (
                np.abs(np.sin(np.outer(base + 7, mults))) * vocab
            ).astype(np.int64) % vocab
            # near-dups: swap the LAST token only (base stays shared)
            last = np.where(ids % 20 == 1, (words[:, -1] + 1 + ids) % vocab, words[:, -1])
            words[:, -1] = last
            texts = [
                " ".join(f"w{w:05d}" for w in row) for row in words
            ]
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "doc_id long, text string")
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000

    from adsb_clickhouse_spark.operators.dedup import (
        exact_duplicates,
        minhash_lsh_pairs,
    )
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("dedup-scale")
    corpus = make_corpus(spark, n).persist()
    corpus.count()  # materialize: probe timings exclude generation

    t0 = time.time()
    n_exact = exact_duplicates(corpus).count()
    t_exact = time.time() - t0

    t0 = time.time()
    pairs = minhash_lsh_pairs(corpus, threshold=0.5)
    n_pairs = pairs.count()
    t_lsh = time.time() - t0

    planted_near = sum(1 for i in range(n) if i % 20 == 1 and not (i % 50 == 2 or (i - 1) % 50 == 2))
    planted_exact_groups = sum(1 for i in range(n) if i % 50 == 2)
    print(json.dumps({
        "n_docs": n,
        "exact_dup_groups_found": n_exact,
        "exact_planted": planted_exact_groups,
        "exact_sec": round(t_exact, 1),
        "lsh_pairs_found": n_pairs,
        "near_planted_min": planted_near,
        "lsh_sec": round(t_lsh, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
