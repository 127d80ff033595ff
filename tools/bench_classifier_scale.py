"""Scale probe for the learned quality classifier
(operators/classifier.py): train logistic regression on a 20k-doc
labeled set (10k wiki-vocabulary positives, 10k web-vocabulary
negatives), then score 1M raw documents (10% wiki-like) and apply the
GPT-3 Pareto keep rule.

Scale shape exercised: per-iteration cost is bounded by the TRAINING
set (persisted feature rows, broadcast weight table, B-bounded
gradient shuffle — driver state is B doubles); scoring the full corpus
is the one corpus-sized pass (gram projection + broadcast weights join
+ doc-keyed sum). The probe reports separation: the wiki-like share in
the kept set vs the 10% base rate.

Usage: python tools/bench_classifier_scale.py [n_raw] [n_train_side]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from bench_dsir_scale import make_docs


def main() -> int:
    n_raw = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_side = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.classifier import (
        pareto_keep,
        score_quality,
        train_quality_classifier,
    )
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("classifier-scale")
    raw = make_docs(spark, n_raw, wiki_frac_mod=10, id_base=0, seed=99).persist()
    pos = make_docs(spark, n_side, wiki_frac_mod=None, id_base=10_000_000, seed=7)
    # negatives: a raw-corpus-like mixture (90% web) — the paper's
    # "random crawl sample" negative set
    neg = make_docs(spark, n_side, wiki_frac_mod=10, id_base=20_000_000, seed=13)
    raw.count()

    t0 = time.time()
    model = train_quality_classifier(pos, neg, n_buckets=4096, n_iters=20)
    train_sec = time.time() - t0

    t0 = time.time()
    kept = pareto_keep(score_quality(raw, model, n_buckets=4096))
    agg = kept.agg(
        F.count("*").alias("n"),
        F.sum(F.col("keep").cast("int")).alias("n_keep"),
        F.sum(
            (F.col("keep") & ((F.col("doc_id") % 10) == 7)).cast("int")
        ).alias("n_keep_wiki"),
        F.avg(F.when((F.col("doc_id") % 10) == 7, F.col("prob"))).alias("wiki_prob"),
        F.avg(F.when((F.col("doc_id") % 10) != 7, F.col("prob"))).alias("web_prob"),
    ).collect()[0]
    score_sec = time.time() - t0

    print(
        json.dumps(
            {
                "n_raw": n_raw,
                "n_train": 2 * n_side,
                "n_iters": 20,
                "train_sec": round(train_sec, 1),
                "sec_per_iter": round(train_sec / 20, 2),
                "final_loss": round(model["losses"][-1], 4),
                "score_sec": round(score_sec, 1),
                "wiki_mean_prob": round(agg["wiki_prob"], 4),
                "web_mean_prob": round(agg["web_prob"], 4),
                "kept": agg["n_keep"],
                "kept_wiki_frac": round(agg["n_keep_wiki"] / agg["n_keep"], 4),
                "base_wiki_frac": 0.1,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
