"""Scale probe for the corpus data card (operators/curation.corpus_report)
and the vocabulary coverage builder (vocab_coverage): 1M documents with a
skewed domain mix and a planted Zipf-ish vocabulary, end-to-end wall
times plus exactness checks (the cube's grand total must equal the
corpus size; coverage must be monotone and end at the retained mass).

Usage: python tools/bench_report_scale.py [n_docs]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from bench_dedup_scale import make_corpus


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.curation import corpus_report, vocab_coverage
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("report-scale")
    corpus = (
        make_corpus(spark, n)
        .withColumn("lang", F.lit("en"))
        .withColumn(
            "source",
            F.when(F.col("doc_id") % 100 < 90, "web")
            .when(F.col("doc_id") % 100 < 99, "books")
            .otherwise("wiki"),
        )
        .persist()
    )
    corpus.count()  # materialize: probe timings exclude generation

    t0 = time.time()
    rows = corpus_report(corpus).collect()
    t_report = time.time() - t0
    total = [r for r in rows if r["predicted_lang"] is None and r["domain"] is None][0]

    t0 = time.time()
    vocab = vocab_coverage(corpus, top_k=10_000).collect()
    t_vocab = time.time() - t0
    cov = [r["cum_coverage"] for r in sorted(vocab, key=lambda r: r["rank"])]

    print(
        json.dumps(
            {
                "n_docs": n,
                "report_cells": len(rows),
                "report_total_docs": int(total["n_docs"]),
                "report_total_tokens": int(total["n_tokens"]),
                "report_dup_docs": int(total["n_exact_dup_docs"]),
                "report_sec": round(t_report, 1),
                "vocab_rows": len(vocab),
                "vocab_coverage_at_k": cov[-1] if cov else None,
                "vocab_monotone": bool(all(a <= b + 1e-12 for a, b in zip(cov, cov[1:]))),
                "vocab_sec": round(t_vocab, 1),
                "exact": bool(total["n_docs"] == n),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
