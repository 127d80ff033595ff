"""Scale probe for BPE merge learning (operators/bpe.py): 1M documents,
learn 30 merges, segment the corpus under them.

The claim measured: after the ONE corpus-sized word-count shuffle,
every merge iteration runs on the distinct-word table — so per-
iteration cost tracks VOCABULARY size, not corpus size. The corpus
here has a closed ~2.2k-word vocabulary (24 tokens/doc drawn from two
vocab pools with per-doc hashing), so iterations should be fast and
flat while the corpus-sized stages (word count, segmentation join)
scale with n.

Usage: python tools/bench_bpe_scale.py [n_docs] [n_merges]
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
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    from bench_dsir_scale import make_docs

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.bpe import (
        bpe_learn,
        bpe_segment,
        word_counts,
    )
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("bpe-scale")
    docs = make_docs(spark, n, wiki_frac_mod=10, id_base=0, seed=17).persist()
    docs.count()

    t0 = time.time()
    wc = word_counts(docs).persist()
    n_vocab = wc.count()
    wc_sec = round(time.time() - t0, 1)
    wc.unpersist()

    t0 = time.time()
    merges = bpe_learn(docs, n_merges=n_merges)
    learn_sec = round(time.time() - t0, 1)

    t0 = time.time()
    seg = bpe_segment(docs, merges)
    stats = seg.agg(
        F.count("*").alias("docs"),
        F.sum("n_words").alias("words"),
        F.sum("n_pieces").alias("pieces"),
    ).collect()[0]
    seg_sec = round(time.time() - t0, 1)

    print(
        json.dumps(
            {
                "n_docs": n,
                "n_vocab_words": n_vocab,
                "word_count_sec": wc_sec,
                "n_merges": len(merges),
                "learn_sec": learn_sec,
                "sec_per_merge": round(learn_sec / max(len(merges), 1), 2),
                "segment_sec": seg_sec,
                "segmented_docs": stats["docs"],
                "total_words": int(stats["words"]),
                "total_pieces": int(stats["pieces"]),
                "compression": round(int(stats["pieces"]) / int(stats["words"]), 3),
                "first_merges": ["".join(m) for m in merges[:5]],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
