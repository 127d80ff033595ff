"""Scale probe for line-level boilerplate removal
(operators/dedup.py::boilerplate_line_removal): N documents x 12 lines
with planted boilerplate at three frequency tiers, end-to-end wall time
and exact excision counts.

The corpus is deterministic (every line a pure function of
(doc_id, line_idx) — stable under partitioning and reruns):

- every doc carries a UNIVERSAL banner line (df = n, the hot skew key
  the AQE-split story is about), one of 1000 TEMPLATE lines keyed by
  doc_id % 1000 (df = n/1000 — above threshold once n >= 30k), and one
  of n/2 RARE lines keyed by doc_id % (n//2) (df = 2, always kept);
- the other 9 lines are unique content (df = 1, always kept).

Expected per doc at n >= 30k with min_doc_freq=30: n_removed = 2
(banner + template), n_kept = 10 (9 content + rare).

Usage: python tools/bench_linededup_scale.py [n_docs]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def make_corpus(spark, n: int):
    import pandas as pd

    half = max(n // 2, 1)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_list()
            texts = []
            for i in ids:
                lines = [f"content {i} line {j} payload {(i * 31 + j) % 997}" for j in range(9)]
                lines.insert(2, "FOLLOW US ON SOCIAL MEDIA AND SUBSCRIBE")
                lines.insert(5, f"Template footer variant {i % 1000}")
                lines.insert(8, f"rare shared line {i % half}")
                texts.append("\n".join(lines))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(n).repartition(32).mapInPandas(gen, "doc_id long, text string")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.dedup import boilerplate_line_removal
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("linededup-scale")
    corpus = make_corpus(spark, n).persist()
    corpus.count()  # materialize: probe timings exclude generation

    t0 = time.time()
    out = boilerplate_line_removal(corpus, min_doc_freq=30)
    agg = out.agg(
        F.count("*").alias("docs"),
        F.sum("n_removed").alias("removed"),
        F.sum("n_kept").alias("kept"),
        F.count(F.when((F.col("n_removed") == 2) & (F.col("n_kept") == 10), 1)).alias(
            "exact_shape"
        ),
    ).first()
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "n_docs": n,
                "wall_sec": round(wall, 1),
                "docs_out": agg["docs"],
                "lines_removed": agg["removed"],
                "lines_kept": agg["kept"],
                "docs_exact_expected_shape": agg["exact_shape"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
