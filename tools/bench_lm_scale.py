"""Scale probe for CCNet perplexity filtering
(operators/lm.py::lm_perplexity_filter): 1M raw documents — 10%
drawn from a "wiki-like" vocabulary with natural bigram structure,
90% from a "web-like" one — scored under a hashed-bigram LM trained
on a 10k-doc wiki-vocabulary reference corpus. CCNet's claim,
measured: the head tercile should be overwhelmingly wiki-like.

Scale shape exercised: LM training touches only the 10k-doc reference
(broadcast tables), scoring is the ONE corpus-sized pass (codegen
bigram projection + two broadcast joins + doc-keyed sum), and the
tercile thresholds derive from the value-bounded ce histogram — no
corpus window, no Python, no corpus-sized driver state.

Usage: python tools/bench_lm_scale.py [n_raw] [n_ref]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from bench_dsir_scale import make_docs  # same synthetic corpus shapes


def main() -> int:
    n_raw = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_ref = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.lm import lm_perplexity_filter
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("lm-scale")
    raw = make_docs(spark, n_raw, wiki_frac_mod=10, id_base=0, seed=99).persist()
    ref = make_docs(
        spark, n_ref, wiki_frac_mod=None, id_base=10_000_000, seed=7
    ).persist()
    raw.count()
    ref.count()

    t0 = time.time()
    out = lm_perplexity_filter(raw, ref, n_buckets=4096)
    agg = (
        out.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(((F.col("doc_id") % 10) == 7).cast("int")).alias("n_wiki"),
        )
        .collect()
    )
    wall = time.time() - t0
    by_bucket = {
        r["bucket"]: {"n": r["n"], "wiki_frac": round(r["n_wiki"] / r["n"], 4)}
        for r in agg
    }
    print(
        json.dumps(
            {
                "n_raw": n_raw,
                "n_ref": n_ref,
                "wall_sec": round(wall, 1),
                "wiki_like_in_raw_frac": 0.1,
                "by_bucket": by_bucket,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
