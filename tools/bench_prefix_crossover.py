"""Measure the naive-vs-prefix-filter Jaccard dedup crossover.

The naive inverted-index join meets every doc pair sharing ANY shingle —
on a boilerplate-heavy corpus (every doc carries a hot template, the
web-dedup regime) that candidate fan-out is quadratic in hot-shingle
frequency. Prefix filtering (AllPairs/PPJoin) globally orders shingles
by frequency and only indexes each doc's rarest prefix, so hot template
shingles never generate candidates.

This script times both operators on synthetic corpora with a growing
boilerplate fraction and prints a markdown table (pasted into README.md).

Usage: python tools/bench_prefix_crossover.py [n_docs] [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from adsb_clickhouse_spark.operators import dedup as D  # noqa: E402
from adsb_clickhouse_spark.session import get_spark  # noqa: E402


def synth_corpus(spark, n_docs: int, boiler_tokens: int, unique_tokens: int = 60):
    """Every doc = one shared boilerplate template + a unique tail.
    Deterministic (seeded by doc id), built with Spark-side functions."""
    boiler = " ".join(f"boiler{i}" for i in range(boiler_tokens))
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.lit(boiler),
                *[
                    F.concat(F.lit(f"u{j}_"), F.substring(F.md5(F.concat_ws("_", F.col("id"), F.lit(j))), 1, 8))
                    for j in range(unique_tokens)
                ],
            ).alias("text"),
        )
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    print(f"| boilerplate tokens/doc | hot-shingle freq | naive (s) | prefix (s) |")
    print(f"|---|---|---|---|")
    # unique content stays dominant (prefixes contain only rare shingles
    # at t=0.5); the boilerplate fraction drives the naive join's
    # quadratic hot-shingle fan-out: candidates ~ C(n_docs,2) x hot count
    for boiler_tokens in (0, 8, 16, 32):
        docs = synth_corpus(spark, n_docs, boiler_tokens)
        docs = docs.persist()
        docs.count()
        rows = {}
        times: dict[str, list[float]] = {"naive": [], "prefix": []}
        for _ in range(reps):
            t = time.time()
            rows["naive"] = D.ngram_jaccard_pairs(docs, threshold=0.5).count()
            times["naive"].append(time.time() - t)
            t = time.time()
            rows["prefix"] = D.ngram_jaccard_pairs_prefix(docs, threshold=0.5).count()
            times["prefix"].append(time.time() - t)
        assert rows["naive"] == rows["prefix"], (
            f"result mismatch at boiler={boiler_tokens}: {rows}"
        )
        hot_freq = n_docs if boiler_tokens >= 3 else 0
        print(
            f"| {boiler_tokens} | {hot_freq} "
            f"| {statistics.median(times['naive']):.1f} "
            f"| {statistics.median(times['prefix']):.1f} |",
            flush=True,
        )
        docs.unpersist()


if __name__ == "__main__":
    main()
