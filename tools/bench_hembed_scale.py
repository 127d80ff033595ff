"""Scale probe for the hashed-projection text embedder
(operators/similarity.py::hashed_text_embeddings) — the r11 verdict's
missing 1M-doc cost pin.

Cost model to verify: one token explode (linear in corpus GRAMS) + ONE
doc-keyed shuffle whose aggregate computes ``dim`` conditional sums in
whole-stage codegen. So wall time should scale ~linearly in gram volume
(bigrams ≈ 2× unigrams) and sub-linearly in ``dim`` (more codegen'd sum
columns over the same exchanged rows, no extra shuffle).

The probe embeds 1M synthetic 14-token docs at dim 16 and 64, unigram
and ngram=(1,2), forcing full materialization through a checksum that
folds every component (column pruning can't cheat). Prints one JSON
line; headline numbers live in README's measured scale behavior table.

Usage: python tools/bench_hembed_scale.py [n_docs] [n_runs]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.similarity import (
        hashed_text_embeddings,
    )
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("hembed-scale")
    spark.sparkContext.setLogLevel("ERROR")
    words = F.concat_ws(
        " ",
        *[
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f"|w{j}")))
            for j in range(14)
        ],
    )
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), words.alias("text")
    ).persist()
    docs.count()  # warm: text generation off the clock

    out = {"n_docs": n, "tokens_per_doc": 14}
    for dim in (16, 64):
        for ng, tag in ((1, "uni"), ((1, 2), "bi")):
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                emb = hashed_text_embeddings(docs, dim=dim, ngram=ng)
                # force every component: fold the full array into one sum
                chk = emb.select(
                    F.aggregate(
                        "embedding", F.lit(0.0), lambda a, x: a + F.abs(x)
                    ).alias("s")
                ).agg(F.sum("s").alias("total"), F.count("*").alias("n")).collect()[0]
                ts.append(time.perf_counter() - t0)
            out[f"dim{dim}_{tag}_sec"] = round(statistics.median(ts), 2)
            out[f"dim{dim}_{tag}_docs_per_sec"] = int(n / statistics.median(ts))
            out["rows_embedded"] = int(chk["n"])
    out["bi_over_uni_dim16"] = round(
        out["dim16_bi_sec"] / out["dim16_uni_sec"], 2
    )
    out["dim64_over_dim16_uni"] = round(
        out["dim64_uni_sec"] / out["dim16_uni_sec"], 2
    )
    docs.unpersist()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
