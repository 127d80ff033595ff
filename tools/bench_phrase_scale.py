"""Scale probe for exact-phrase search (operators/search.py):
1M synthetic docs, the two-term phrase 'join hash', run three ways —

- in-memory slot-join over the raw corpus (the no-index baseline);
- FROM DISK against a positional stored index (positions arrays in
  the postings, probe pruned to the phrase terms' buckets);
- and the positional index build cost vs the plain BM25 index, to
  price the positions payload.

Both result sets are checked identical.

Usage: python tools/bench_phrase_scale.py [n_docs]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, ".")

from bench_search_scale import make_docs


def _du(path: str) -> float:
    out = subprocess.run(["du", "-sm", path], capture_output=True, text=True)
    return float(out.stdout.split()[0])


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from adsb_clickhouse_spark.operators.search import (
        phrase_probe_stored,
        phrase_search,
        write_text_index,
    )
    from adsb_clickhouse_spark.session import get_spark

    from pyspark.sql import functions as F

    spark = get_spark("phrase-scale")
    # the raw stream's bit-shifted token picks can never emit this
    # adjacency, so plant it: 1 in 97 docs carries the phrase twice
    docs = (
        make_docs(spark, n)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 97 == 0,
                F.concat(F.col("text"), F.lit(" join hash join hash zebra quilt")),
            ).otherwise(F.col("text")),
        )
        .persist()
    )
    docs.count()
    phrase = "join hash"

    root = tempfile.mkdtemp(prefix="posidx_")
    t0 = time.time()
    write_text_index(docs, root, n_buckets=64, with_positions=True)
    build_pos = time.time() - t0
    pos_mb = _du(root)

    results = {}
    for tag, ph in (("common", phrase), ("selective", "zebra quilt")):
        t0 = time.time()
        mem = phrase_search(docs, ph, k=20).collect()
        mem_sec = time.time() - t0
        t0 = time.time()
        got = phrase_probe_stored(spark, root, ph, k=20).collect()
        probe_sec = time.time() - t0
        results[tag] = {
            "phrase": ph,
            "in_memory_sec": round(mem_sec, 2),
            "probe_stored_sec": round(probe_sec, 2),
            "rows_match": [tuple(r) for r in got] == [tuple(r) for r in mem],
            "n_hits": len(got),
        }

    root2 = tempfile.mkdtemp(prefix="plainidx_")
    t0 = time.time()
    write_text_index(docs, root2, n_buckets=64)
    build_plain = time.time() - t0

    print(
        json.dumps(
            {
                "n_docs": n,
                "build_positional_sec": round(build_pos, 1),
                "build_plain_sec": round(build_plain, 1),
                "positional_index_mb": round(pos_mb, 1),
                "plain_index_mb": round(_du(root2), 1),
                **results,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
