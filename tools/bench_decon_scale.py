"""Scale probe for benchmark decontamination
(operators/dedup.decontamination_pairs): N train documents scanned
against a 1,000-doc eval benchmark in which 500 eval docs are verbatim
copies of train docs (planted leaks) and 500 are fresh.

The eval shingle index broadcasts (benchmark-sized, fixed while train
grows), so the probe demonstrates the shape that matters at 100 TB: the
train corpus streams map-side against the broadcast — no corpus-sized
shuffle — and only the (train, eval) hit pairs reach the one groupBy.
Exactness: every planted leak must surface at containment 1.0 and no
fresh eval doc may match at the threshold.

Usage: python tools/bench_decon_scale.py [n_train]
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
    n_eval, n_leak = 1000, 500

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.dedup import decontamination_pairs
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("decon-scale")
    train = make_corpus(spark, n).persist()
    train.count()  # materialize: probe timing excludes generation

    # leaks: verbatim copies of train docs 0,2,4,... (even ids avoid the
    # corpus's own planted near-dup ids); fresh docs use an out-of-range
    # vocabulary so they share no shingle with train
    leak_src = train.filter(
        (F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 2 * n_leak)
    ).select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    fresh = spark.range(n_leak).select(
        (F.col("id") + 20_000_000).alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit(f"fresh{j}x"), F.col("id")) for j in range(40)]
        ).alias("text"),
    )
    evalset = leak_src.unionByName(fresh).persist()
    assert evalset.count() == n_eval

    t0 = time.time()
    hits = decontamination_pairs(train, evalset, threshold=0.5).persist()
    n_hits = hits.count()
    full = hits.filter(F.col("containment") >= 0.9999)
    leaked_evals = {r["eval_id"] for r in full.select("eval_id").distinct().collect()}
    fresh_hit = hits.filter(F.col("eval_id") >= 20_000_000).count()
    wall = time.time() - t0

    planted = {10_000_000 + 2 * i for i in range(n_leak)}
    print(
        json.dumps(
            {
                "n_train": n,
                "n_eval": n_eval,
                "planted_leaks": n_leak,
                "hit_pairs": n_hits,
                "leaks_found_at_1": len(leaked_evals & planted),
                "fresh_false_hits": int(fresh_hit),
                "wall_sec": round(wall, 1),
                "exact": bool(
                    leaked_evals >= planted and fresh_hit == 0
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
