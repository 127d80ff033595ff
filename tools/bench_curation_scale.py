"""Scale probe for the composed curation pipeline
(operators/curation.py::curate_documents): N synthetic documents with
planted near/exact duplicates (the bench_dedup_scale corpus, which the
MinHash stage's planted-recall numbers are calibrated on) pushed through
the full funnel — scrub → langid → quality → near-dedup → pack — with
end-to-end wall time and per-stage counts.

Usage: python tools/bench_curation_scale.py [n_docs]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from bench_dedup_scale import make_corpus

    from adsb_clickhouse_spark.operators.curation import curate_documents
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("curation-scale")
    corpus = make_corpus(spark, n).withColumn("lang", F.lit("en")).persist()
    corpus.count()  # materialize: probe timing excludes generation

    t0 = time.time()
    res = curate_documents(
        corpus,
        min_quality=0.1,
        dedup_threshold=0.5,
        pack_budget=2048,
    )
    funnel = res.funnel()
    # force the packed stage fully (funnel's max(pack_id) already ran the
    # prefix-sum job; count the rows too so the full output materializes)
    funnel["packed_rows"] = res.packed.count()
    wall = time.time() - t0

    print(json.dumps({"n_docs": n, "wall_sec": round(wall, 1), **funnel}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
