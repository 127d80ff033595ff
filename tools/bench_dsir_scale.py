"""Scale probe for DSIR importance resampling
(operators/selection.py::dsir_select): 1M raw documents of which 10%
are drawn from a "wiki-like" vocabulary and 90% from a "web-like" one,
a 10k-doc target corpus drawn from the wiki vocabulary, select
k = 100k. The paper's claim, measured: the selected set should be
overwhelmingly wiki-like (the raw mixture is 10% wiki, so a random
sample would hit 10%).

Scale shape exercised: the two corpus-sized gram projections, the
B-bounded bucket-count shuffles (B = 10k buckets), the broadcast
log-ratio join, one doc-keyed sum, and the distributed
``orderBy().limit(k)`` top-k — no global window, no Python, no
corpus-sized driver state.

Usage: python tools/bench_dsir_scale.py [n_raw] [n_target]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

WEB = ["click", "buy", "now", "deal", "offer", "sale", "price", "shop",
       "cart", "checkout", "discount", "free", "shipping", "order", "item"]
WIKI = ["history", "science", "theory", "article", "reference", "citation",
        "source", "century", "published", "research", "university", "study",
        "region", "population", "language"]


def make_docs(spark, n: int, wiki_frac_mod: int | None, id_base: int, seed: int):
    """wiki_frac_mod=10 → ids with id%10==7 are wiki-like; None → all wiki."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                wiki = wiki_frac_mod is None or (i % wiki_frac_mod == 7)
                vocab = WIKI if wiki else WEB
                h = (i * 2654435761 + seed) & 0xFFFFFFFF
                toks = [vocab[(h >> (2 * j)) % len(vocab)] for j in range(24)]
                texts.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": ids + id_base, "text": texts})

    return spark.range(n).repartition(32).mapInPandas(gen, "doc_id long, text string")


def main() -> int:
    n_raw = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_target = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from adsb_clickhouse_spark.operators.selection import dsir_select
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("dsir-scale")
    raw = make_docs(spark, n_raw, wiki_frac_mod=10, id_base=0, seed=99).persist()
    target = make_docs(
        spark, n_target, wiki_frac_mod=None, id_base=10_000_000, seed=7
    ).persist()
    n_wiki_raw = raw.count() // 10  # ids with id%10==7
    target.count()

    k = n_raw // 10
    t0 = time.time()
    sel = dsir_select(raw, target, k=k)
    rows = sel.select("doc_id").collect()
    wall = time.time() - t0
    wiki_sel = sum(1 for r in rows if r["doc_id"] % 10 == 7)
    print(
        json.dumps(
            {
                "n_raw": n_raw,
                "n_target": n_target,
                "k": k,
                "wall_sec": round(wall, 1),
                "wiki_like_in_raw_frac": 0.1,
                "wiki_like_selected": wiki_sel,
                "wiki_like_selected_frac": round(wiki_sel / len(rows), 4),
                "random_baseline_frac": 0.1,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
