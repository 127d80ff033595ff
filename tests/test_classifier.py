"""Learned quality classifier (operators/classifier.py): training
separates a synthetic good-vs-junk corpus, loss descends, scoring is a
broadcast plan, and the Pareto keep rule matches its closed form."""

import math

from pyspark.sql import functions as F

from adsb_clickhouse_spark.operators.classifier import (
    hashed_features,
    pareto_keep,
    score_quality,
    train_quality_classifier,
)

GOOD_WORDS = ["history", "science", "theory", "article", "reference",
              "research", "university", "study", "century", "language"]
JUNK_WORDS = ["click", "buy", "now", "deal", "offer", "sale", "free",
              "winner", "prize", "casino"]


def _mk(words, n_docs, base):
    rows = []
    for i in range(n_docs):
        toks = [words[(i * 7 + j * 3) % len(words)] for j in range(20)]
        rows.append((base + i, " ".join(toks)))
    return rows


def test_features_are_l1_normalized(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b c d")], "doc_id long, text string"
    )
    rows = hashed_features(docs, n_buckets=64).collect()
    assert abs(sum(r["x"] for r in rows) - 1.0) < 1e-9
    assert all(r["x"] > 0 for r in rows)


def test_training_separates_and_loss_descends(spark):
    good = spark.createDataFrame(_mk(GOOD_WORDS, 60, 0), "doc_id long, text string")
    junk = spark.createDataFrame(_mk(JUNK_WORDS, 60, 1000), "doc_id long, text string")
    model = train_quality_classifier(good, junk, n_buckets=256, n_iters=40)
    assert model["losses"][0] > model["losses"][-1]
    assert model["losses"][-1] < 0.3
    # held-out style check: score fresh docs from each vocabulary
    test_docs = spark.createDataFrame(
        _mk(GOOD_WORDS, 10, 5000) + _mk(JUNK_WORDS, 10, 6000),
        "doc_id long, text string",
    )
    scored = {r["doc_id"]: r["prob"] for r in score_quality(
        test_docs, model, n_buckets=256
    ).collect()}
    good_probs = [scored[i] for i in range(5000, 5010)]
    junk_probs = [scored[i] for i in range(6000, 6010)]
    assert min(good_probs) > max(junk_probs)
    assert sum(good_probs) / 10 > 0.8 and sum(junk_probs) / 10 < 0.2


def test_scoring_plan_is_broadcast_and_jvm(spark):
    docs = spark.createDataFrame(_mk(GOOD_WORDS, 5, 0), "doc_id long, text string")
    model = {"weights": {1: 0.5, 2: -0.5}, "bias": 0.1}
    out = score_quality(docs, model, n_buckets=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan and "Window" not in plan
    # no-gram doc scores exactly at the bias
    empty = spark.createDataFrame([(9, "x")], "doc_id long, text string")
    r = score_quality(empty, model, n_buckets=64).collect()[0]
    assert abs(r["logit"] - 0.1) < 1e-12


def test_pareto_keep_matches_closed_form(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(i, 0.5) for i in range(200)], "doc_id long, prob double"
    )
    rows = pareto_keep(docs, alpha=9.0, salt=83).collect()
    for r in rows[:50]:
        h = int(
            hashlib.md5(f"83|{r['doc_id']}".encode()).hexdigest()[:15], 16
        )
        u = (h % 1_000_000 + 0.5) / 1_000_000
        x = u ** (-1.0 / 9.0) - 1.0
        assert abs(r["pareto_x"] - x) < 1e-9
        assert r["keep"] == (0.5 > 1.0 - x)
    # a prob=1 doc always survives; prob=0 survives only on the tail
    hi = pareto_keep(
        spark.createDataFrame([(1, 0.9999)], "doc_id long, prob double")
    ).collect()[0]
    assert hi["keep"]
    keep_frac = sum(1 for r in rows if r["keep"]) / len(rows)
    assert 0.0 < keep_frac < 1.0  # stochastic long tail, not a cliff


def test_funnel_classifier_gate(spark):
    from adsb_clickhouse_spark.operators.curation import curate_documents

    good = _mk(GOOD_WORDS, 30, 0)
    junk = _mk(JUNK_WORDS, 30, 1000)
    model = train_quality_classifier(
        spark.createDataFrame(good[:20], "doc_id long, text string"),
        spark.createDataFrame(junk[:20], "doc_id long, text string"),
        n_buckets=256, n_iters=40,
    )
    docs = spark.createDataFrame(good[20:] + junk[20:], "doc_id long, text string")
    res = curate_documents(
        docs, lang_col=None, quality_model=model,
        quality_n_buckets=256, dedup_threshold=0.95,
    )
    kept = {r["doc_id"] for r in res.filtered.select("doc_id").collect()}
    assert kept and all(i < 1000 for i in kept)      # junk gated out
    assert "clf_prob" in res.scored.columns
