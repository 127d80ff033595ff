"""Retrieval queries: BM25 keyword search over `documents`, with a
DuckDB oracle. The stored inverted-index probe (same scores from a
partition-pruned layout) is pytest-verified in tests/test_search.py —
layout round-trips aren't oracle-expressible."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texttools import duck_tokens
from . import load_table, register

_BM25_QUERY = "join hash merge window"
_BM25_K = 10


def _duck_bm25_ctes() -> str:
    """The shared BM25 CTE chain ending at ``sc`` (doc_id,
    n_terms_matched, score) — identical literal association to the
    Spark side (the k1/b constants appear exactly as it composes
    them), round-4 before any ordering."""
    terms = ", ".join(f"'{t}'" for t in _BM25_QUERY.split())
    return f"""tk AS (SELECT doc_id, {duck_tokens('text')} AS toks FROM documents),
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
           FROM tf JOIN idf USING (term) GROUP BY 1)"""


def _duck_bm25_sql() -> str:
    return f"""
    WITH {_duck_bm25_ctes()}
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


_RRF_KB = 20   # BM25 shortlist
_RRF_KA = 20   # ANN shortlist
_RRF_K = 10    # fused top-k
_RRF_C = 60
_RRF_VEC = 0   # probe vector


def _duck_hybrid_sql() -> str:
    """Twin of operators/search.py::hybrid_search_rrf: the shared BM25
    CTE chain + the sim_knn_bruteforce cosine chain (raw-double
    ordering, ties on neighbor id — the same law the oracled knn row
    pins), fused by reciprocal rank with the addition order the Spark
    side uses (bm25 term first)."""
    cos = (
        "list_dot_product(q.v, c.v) / "
        "(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))"
    )
    return f"""
    WITH {_duck_bm25_ctes()},
    bt AS (SELECT doc_id,
                  row_number() OVER (ORDER BY score DESC, doc_id) AS bm25_rank
           FROM sc
           QUALIFY bm25_rank <= {_RRF_KB}),
    ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
    q AS (SELECT vec_id, v FROM ev WHERE vec_id = {_RRF_VEC}),
    scored AS (SELECT c.vec_id AS neighbor_id, {cos} AS cs
               FROM q JOIN ev c ON c.vec_id != q.vec_id),
    at AS (SELECT neighbor_id AS doc_id,
                  row_number() OVER (ORDER BY cs DESC, neighbor_id) AS ann_rank
           FROM scored
           QUALIFY ann_rank <= {_RRF_KA}),
    f AS (SELECT coalesce(bt.doc_id, at.doc_id) AS doc_id,
                 bt.bm25_rank AS bm25_rank, at.ann_rank AS ann_rank
          FROM bt FULL OUTER JOIN at ON bt.doc_id = at.doc_id)
    SELECT doc_id, bm25_rank, ann_rank,
           round(coalesce(1.0 / ({float(_RRF_C)} + bm25_rank), 0.0)
                 + coalesce(1.0 / ({float(_RRF_C)} + ann_rank), 0.0),
                 6) AS rrf_score
    FROM f ORDER BY rrf_score DESC, doc_id LIMIT {_RRF_K}
    """


@register(
    "search_hybrid_rrf",
    _duck_hybrid_sql(),
    doc=(
        "Hybrid keyword+vector retrieval: BM25 top-20 for "
        f"'{_BM25_QUERY}' fused with the exact cosine top-20 neighbors "
        f"of probe vector {_RRF_VEC} by reciprocal-rank fusion "
        "(Cormack et al., SIGIR 2009): score = Σ 1/(60 + rank), a doc "
        "missing from a list contributes 0. Each leg is its own "
        "scale-shaped operator; the fusion joins two ≤20-row "
        "shortlists, so its windows and full-outer join are bounded by "
        "construction — corpus cost is exactly the two legs."
    ),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import hybrid_search_rrf

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return hybrid_search_rrf(
        d, e, _BM25_QUERY, _RRF_VEC, kb=_RRF_KB, ka=_RRF_KA, k=_RRF_K, c=_RRF_C
    ).orderBy(F.desc("rrf_score"), F.asc("doc_id"))


_PHRASE = "hash join"
_PHRASE_K = 50


def _duck_phrase_sql() -> str:
    """Twin of operators/search.py::phrase_search — the same slot-count
    law (a phrase occurs at start s iff all m slots land on s), 1-based
    positions DuckDB-side vs 0-based Spark-side (start is internal, so
    the base cancels)."""
    terms = _PHRASE.split()
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(terms))
    return f"""
    WITH tk AS (SELECT doc_id, {duck_tokens('text')} AS toks FROM documents),
    tr AS (SELECT doc_id, unnest(toks) AS term,
                  unnest(range(1, len(toks) + 1)) AS pos
           FROM tk),
    ph(i, term) AS (VALUES {vals}),
    cand AS (SELECT doc_id, tr.pos - ph.i AS start, ph.i AS i
             FROM tr JOIN ph ON tr.term = ph.term),
    hits AS (SELECT doc_id, start FROM cand
             GROUP BY doc_id, start HAVING count(*) = {len(terms)})
    SELECT doc_id, count(*) AS n_matches
    FROM hits GROUP BY 1
    ORDER BY n_matches DESC, doc_id LIMIT {_PHRASE_K}
    """


@register(
    "text_phrase_search",
    _duck_phrase_sql(),
    doc=(
        f"Exact-phrase search: documents containing the token sequence "
        f"'{_PHRASE}', with occurrence counts, top-{_PHRASE_K}. The "
        "slot-join formulation: broadcast the (slot, term) phrase table "
        "onto the position-exploded token stream — the join itself "
        "term-filters the scan, so only phrase-term rows survive — and "
        "a phrase occurs at a start iff all slots are present there "
        "(one candidate-bounded grouped count, a doc-level reduce, a "
        "distributed top-k; no corpus shuffle beyond the candidates). "
        "The positional stored-index twin (phrase_probe_stored over "
        "write_text_index(with_positions=True)) runs the same law over "
        "partition-pruned postings, pinned row-identical in "
        "tests/test_search.py."
    ),
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import phrase_search

    d = load_table(spark, sf_dir, "documents")
    return phrase_search(d, _PHRASE, k=_PHRASE_K)
