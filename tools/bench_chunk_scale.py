"""Scale probe for the token-window chunker
(operators/packing.chunk_documents): the chunker claims zero shuffles —
a pure whole-stage-codegen projection that should run at scan speed at
any corpus size. The probe chunks N 60-token documents (32-token
windows, stride 24 → 3 chunks/doc, ~47% overlap redundancy) and
verifies the expected chunk count and token accounting exactly.

Usage: python tools/bench_chunk_scale.py [n_docs]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from bench_substr_scale import N_TOK, make_corpus  # 60-token deterministic docs


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.packing import chunk_documents
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("chunk-scale")
    corpus = make_corpus(spark, n).persist()
    corpus.count()  # materialize: probe timing excludes generation

    c, s = 32, 24
    t0 = time.time()
    out = chunk_documents(corpus, chunk_tokens=c, stride=s)
    agg = out.agg(
        F.count("*").alias("chunks"),
        F.sum("n_tok").alias("chunk_tokens"),
        F.min("n_tok").alias("min_tok"),
        F.max("n_tok").alias("max_tok"),
    ).collect()[0]
    wall = time.time() - t0

    # 60 tokens, c=32, s=24 -> chunks at 1/25/49: 32 + 32 + 12 tokens
    expect_chunks = 3 * n
    expect_tokens = (32 + 32 + 12) * n
    print(
        json.dumps(
            {
                "n_docs": n,
                "corpus_tokens": N_TOK * n,
                "chunks": int(agg["chunks"]),
                "chunk_tokens": int(agg["chunk_tokens"]),
                "min_tok": int(agg["min_tok"]),
                "max_tok": int(agg["max_tok"]),
                "wall_sec": round(wall, 1),
                "exact": bool(
                    agg["chunks"] == expect_chunks
                    and agg["chunk_tokens"] == expect_tokens
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
