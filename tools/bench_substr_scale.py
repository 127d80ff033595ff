"""Scale probe for the duplicated-substring removal pass
(operators/dedup.duplicated_substring_stats): N documents in which
1-in-10 docs embeds a shared 16-token boilerplate block at a
position that varies per doc, everything else unique.

With k=8 the boilerplate block is the ONLY source of corpus-duplicated
k-grams, so the expected answer is exact: each carrier doc loses
exactly the 16 block tokens as one span; every other doc loses nothing.
The probe verifies that invariant at scale and reports wall time.

Corpus is deterministic (tokens a pure function of (doc_id, position)):
- 60 unique tokens per doc from a 5M-word id space (doc-salted, so no
  accidental cross-doc 8-grams)
- ids with id % 10 == 3 splice the 16-token shared block at offset
  (id % 29) + 5

Usage: python tools/bench_substr_scale.py [n_docs]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

N_TOK = 60
BLOCK = ["blk%02d" % i for i in range(16)]


def make_corpus(spark, n: int):
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for did in ids:
                # doc-unique tokens: salt every token with the doc id so
                # no 8-gram repeats across docs except the planted block
                toks = [f"u{did}x{j}" for j in range(N_TOK)]
                if did % 10 == 3:
                    off = (did % 29) + 5
                    toks[off : off + 16] = BLOCK
                texts.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(n).repartition(32).mapInPandas(gen, "doc_id long, text string")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.dedup import duplicated_substring_stats
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("substr-scale")
    corpus = make_corpus(spark, n).persist()
    corpus.count()  # materialize: probe timing excludes generation

    t0 = time.time()
    out = duplicated_substring_stats(corpus, k=8)
    agg = out.agg(
        F.sum(F.when(F.col("n_dup_tokens") == 16, 1).otherwise(0)).alias("full_block"),
        F.sum(F.when(F.col("n_dup_tokens") == 0, 1).otherwise(0)).alias("untouched"),
        F.sum("n_dup_tokens").alias("total_removed"),
        F.max("n_dup_spans").alias("max_spans"),
    ).collect()[0]
    wall = time.time() - t0

    planted = sum(1 for i in range(n) if i % 10 == 3)
    print(
        json.dumps(
            {
                "n_docs": n,
                "planted_block_docs": planted,
                "docs_losing_exactly_block": int(agg["full_block"]),
                "docs_untouched": int(agg["untouched"]),
                "total_tokens_removed": int(agg["total_removed"]),
                "max_spans_per_doc": int(agg["max_spans"]),
                "wall_sec": round(wall, 1),
                "exact_recovery": bool(
                    agg["full_block"] == planted
                    and agg["untouched"] == n - planted
                    and agg["total_removed"] == 16 * planted
                    and agg["max_spans"] == 1
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
