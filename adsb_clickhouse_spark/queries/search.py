"""Retrieval queries: BM25 keyword search over `documents`, with a
DuckDB oracle. The stored inverted-index probe (same scores from a
partition-pruned layout) is pytest-verified in tests/test_search.py —
layout round-trips aren't oracle-expressible."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.texttools import duck_tokens
from . import load_table, register

_BM25_QUERY = "join hash merge window"
_BM25_K = 10


def _duck_bm25_sql() -> str:
    """Twin of operators/search.py::bm25_search — identical literal
    association (the k1/b constants appear exactly as the Spark side
    composes them), round-4 before ordering, ties on doc_id."""
    terms = ", ".join(f"'{t}'" for t in _BM25_QUERY.split())
    return f"""
    WITH tk AS (SELECT doc_id, {duck_tokens('text')} AS toks FROM documents),
    d AS (SELECT doc_id, toks, len(toks) AS dl FROM tk WHERE len(toks) > 0),
    stats AS (SELECT count(*) AS N, sum(dl) / count(*) AS avgdl FROM d),
    e AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
    tf AS (SELECT doc_id, dl, term, count(*) AS tf
           FROM e WHERE term IN ({terms}) GROUP BY 1, 2, 3),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    idf AS (SELECT term, avgdl,
                   ln(1.0 + (N - df + 0.5) / (df + 0.5)) AS idf
            FROM dft, stats),
    sc AS (SELECT doc_id, count(*) AS n_terms_matched,
                  round(sum(idf * ((tf * (1.2 + 1.0))
                        / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))),
                        4) AS score
           FROM tf JOIN idf USING (term) GROUP BY 1)
    SELECT doc_id, n_terms_matched, score
    FROM sc ORDER BY score DESC, doc_id LIMIT {_BM25_K}
    """


@register(
    "text_bm25_search",
    _duck_bm25_sql(),
    doc=(
        "Okapi BM25 keyword search: top-10 documents for the query "
        f"'{_BM25_QUERY}' by idf·tf-saturation scoring with document-"
        "length normalization (k1=1.2, b=0.75) — the keyword-retrieval "
        "member of the engine next to the ANN family. operators/"
        "search.py carries the scale story: the query-term filter runs "
        "BEFORE any shuffle so only matching posting rows exist, corpus "
        "stats and per-term idf broadcast as tiny tables, the reduce is "
        "candidate-bounded, and the top-k is a distributed "
        "TakeOrderedAndProject. The stored inverted-index twin "
        "(write_text_index/bm25_probe_stored — postings partitioned by "
        "term bucket with dl denormalized in, probes partition-pruned "
        "to the query's buckets) returns identical rows, pinned in "
        "tests/test_search.py."
    ),
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import bm25_search

    d = load_table(spark, sf_dir, "documents")
    return bm25_search(d, _BM25_QUERY, k=_BM25_K)
