"""Scale probe for the stored BM25 inverted index
(operators/search.py): 1M synthetic docs (24 common-vocabulary tokens
each, plus 2 rare id-derived tokens so selective queries exist),
index written partitionBy(term bucket), then two probes FROM DISK:

- a RARE-term query (matches ~100 docs) — the pruned fast path: the
  scan reads only the query's term buckets and the term-level parquet
  filter drops everything else;
- a COMMON-term query (every doc matches) — the saturation worst case:
  candidate set = the corpus, showing the candidate-bounded reduce
  still holds.

Both probes are checked row-identical to the in-memory bm25_search on
the same corpus, and the in-memory search wall is reported as the
"no index" baseline.

Usage: python tools/bench_search_scale.py [n_docs]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

sys.path.insert(0, ".")

VOCAB = ["click", "buy", "now", "deal", "offer", "sale", "price", "shop",
         "cart", "checkout", "discount", "free", "shipping", "order",
         "item", "join", "hash", "merge", "window", "batch"]


def make_docs(spark, n: int):
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                h = (i * 2654435761 + 17) & 0xFFFFFFFF
                toks = [VOCAB[(h >> j) % len(VOCAB)] for j in range(24)]
                # two rare tokens: shared by ~n/10000 docs each
                toks.append(f"rare{i % 10000}")
                toks.append(f"tag{i % 3333}")
                texts.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(n).repartition(32).mapInPandas(gen, "doc_id long, text string")


def _du(path: str) -> float:
    out = subprocess.run(["du", "-sm", path], capture_output=True, text=True)
    return float(out.stdout.split()[0])


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from adsb_clickhouse_spark.operators.search import (
        bm25_probe_stored,
        bm25_search,
        write_text_index,
    )
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("search-scale")
    import tempfile

    root = tempfile.mkdtemp(prefix="bm25idx_")
    docs = make_docs(spark, n).persist()
    docs.count()

    t0 = time.time()
    meta = write_text_index(docs, root, n_buckets=64)
    build = time.time() - t0

    rare_q = "rare42 tag7"
    common_q = "join hash merge window"
    out = {"n_docs": n, "build_sec": round(build, 1),
           "index_mb": round(_du(root), 1)}

    for name, q in (("rare", rare_q), ("common", common_q)):
        t0 = time.time()
        got = bm25_probe_stored(spark, root, q, k=10).collect()
        probe = time.time() - t0
        t0 = time.time()
        want = bm25_search(docs, q, k=10).collect()
        mem = time.time() - t0
        out[name] = {
            "probe_sec": round(probe, 2),
            "in_memory_sec": round(mem, 2),
            "rows_match": [tuple(r) for r in got] == [tuple(r) for r in want],
            "top_score": got[0]["score"] if got else None,
        }

    # lifecycle: 40 micro-batch appends accrete; the probe pays a
    # per-segment listing+scan tax until compaction folds them back
    # into one bucketed generation
    from adsb_clickhouse_spark.operators.search import (
        append_text_index,
        compact_text_index,
    )

    n_seg = 40
    for s in range(n_seg):
        batch = make_docs(spark, 2000)
        batch = batch.selectExpr(
            f"doc_id + {n + s * 2000} AS doc_id", "text"
        )
        append_text_index(batch, root, f"b{s:04d}")
    t0 = time.time()
    seg_rows = bm25_probe_stored(spark, root, common_q, k=10).collect()
    probe_segmented = time.time() - t0
    t0 = time.time()
    res = compact_text_index(spark, root)
    compact_sec = time.time() - t0
    t0 = time.time()
    cmp_rows = bm25_probe_stored(spark, root, common_q, k=10).collect()
    probe_compacted = time.time() - t0
    out["lifecycle"] = {
        "appended_segments": n_seg,
        "probe_segmented_sec": round(probe_segmented, 2),
        "compact_sec": round(compact_sec, 2),
        "folded": res["folded_segments"],
        "probe_compacted_sec": round(probe_compacted, 2),
        "rows_match_across_compact": [tuple(r) for r in seg_rows]
        == [tuple(r) for r in cmp_rows],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
