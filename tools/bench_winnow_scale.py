"""Scale probe for winnowing local-alignment near-dup detection
(operators/dedup.winnow_near_dup_pairs): N documents of unique prose in
which 1-in-40 PAIRS of docs share a 64-character quote embedded at
different offsets in otherwise-unrelated text — the case whole-document
Jaccard/MinHash misses by construction (the unshared remainder drowns
the ratio) and winnowing's ≥k+w-1 shared-substring guarantee catches.

Docs 80i and 80i+40 carry quote i; everything else is doc-unique (char
grams salted by doc id). Expected: every planted pair surfaces with
n_common ≥ min_common; no cross-pair hits (each quote is pair-unique).

With ``--hot N`` the corpus additionally plants a SINGLE template quote
shared by N documents (1-in-(n/N) docs carry it at varying offsets) —
the hot-fingerprint skew regime: without the ``max_fp_freq`` cap those
fingerprints would contribute ~N²/2 join rows (5·10^7 at N=10k) and
flood the pair join; with the cap they are dropped before the
self-join, so wall time stays flat and the planted PAIR recovery is
unaffected. Mega-cluster boilerplate like this is deliberately left to
the document-level MinHash family (which catches it as whole-doc
near-dups when the docs are mostly template) — the cap trades recall
on degenerate clusters for bounded work, exactly like
``max_shingle_freq`` in the Jaccard family.

Usage: python tools/bench_winnow_scale.py [n_docs] [--hot N]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def make_corpus(spark, n: int, n_hot: int = 0):
    import pandas as pd

    hot_every = (n // n_hot) if n_hot else 0

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for did in ids:
                # per-(doc, position) hash tokens: every char 8-gram
                # embeds an independent hash, so two docs colliding on
                # one token prefix share ONE window region, not thirty —
                # a single doc-level hash (let alone naive f"u{did}tok{j}"
                # tokens) leaks enough shared windows across 200k docs to
                # flood the pair join with birthday collisions
                body = " ".join(
                    f"{((did * 31 + j) * 2654435761 + 99) % (1 << 32):08x}"
                    for j in range(30)
                )
                pair = did % 80
                if pair in (0, 40):
                    q = did - pair  # quote id = pair-group base (doc 80i)
                    # pair-unique quote text (hash-derived — a shared
                    # literal prefix like "shared quote NNN" would give
                    # every carrier a common fingerprint and C(500,2)
                    # cross-pair hits)
                    qh = f"{(q * 40503 + 7) % (1 << 32):08x}"
                    quote = " ".join(f"q{qh}{j:02d}" for j in range(6))  # ~70 chars
                    cut = 60 if pair == 0 else 160
                    body = body[:cut] + " " + quote + body[cut:]
                if hot_every and did % hot_every == 13:
                    # the ONE template quote every hot carrier shares —
                    # its fingerprints occur in n_hot docs and must be
                    # dropped by the max_fp_freq cap, not joined
                    tq = " ".join(f"tmplhot{j:02d}token" for j in range(6))
                    hcut = (did * 37) % 180
                    body = body[:hcut] + " " + tq + body[hcut:]
                texts.append(body)
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(n).repartition(32).mapInPandas(gen, "doc_id long, text string")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 200_000
    n_hot = 0
    if "--hot" in sys.argv:
        n_hot = int(sys.argv[sys.argv.index("--hot") + 1])

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.dedup import winnow_near_dup_pairs
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("winnow-scale")
    corpus = make_corpus(spark, n, n_hot).persist()
    corpus.count()  # materialize: probe timing excludes generation

    t0 = time.time()
    pairs = winnow_near_dup_pairs(corpus, k=8, w=4, min_common=5).persist()
    n_pairs = pairs.count()
    planted_found = pairs.filter(
        (F.col("id_b") - F.col("id_a") == 40) & (F.col("id_a") % 80 == 0)
    ).count()
    wall = time.time() - t0

    planted = len([i for i in range(0, n - 40, 80)])
    out = {
        "n_docs": n,
        "planted_pairs": planted,
        "pairs_found": n_pairs,
        "planted_found": int(planted_found),
        "wall_sec": round(wall, 1),
        "exact_recovery": bool(planted_found == planted),
    }
    if n_hot:
        hot_every = n // n_hot
        # pairs where BOTH ends carry the template: must be zero — the
        # freq cap dropped the template fingerprints before the join
        hot_pairs = pairs.filter(
            (F.col("id_a") % hot_every == 13) & (F.col("id_b") % hot_every == 13)
        ).count()
        out["n_hot_carriers"] = n_hot
        out["hot_cluster_pairs"] = int(hot_pairs)
        out["hot_capped"] = bool(hot_pairs == 0)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
