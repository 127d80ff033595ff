"""DSIR importance resampling (operators/selection.py): weights favor
target-like documents, short docs survive neutrally, the selection plan
is a distributed top-k with no Python and no window."""

import pytest

from pyspark.sql import functions as F

from adsb_clickhouse_spark.operators.selection import (
    dsir_importance_weights,
    dsir_select,
    hashed_gram_buckets,
)


@pytest.fixture()
def corpora(spark):
    # raw: 40 "web" docs (vocab A) + 10 "wiki" docs (vocab B);
    # target: 8 fresh wiki-vocab docs (disjoint ids — target need not
    # be a subset of raw)
    web = [
        (i, f"click here buy now deal offer sale price shop cart item{i % 7}")
        for i in range(40)
    ]
    wiki = [
        (100 + i, f"history science theory article reference citation source note{i % 5}")
        for i in range(10)
    ]
    tgt = [
        (1000 + i, f"science history article theory citation reference note{i % 5} source")
        for i in range(8)
    ]
    raw = spark.createDataFrame(web + wiki, "doc_id long, text string")
    target = spark.createDataFrame(tgt, "doc_id long, text string")
    return raw, target


def test_weights_favor_target_like_docs(spark, corpora):
    raw, target = corpora
    w = {r["doc_id"]: r["log_w"] for r in dsir_importance_weights(raw, target).collect()}
    assert len(w) == 50
    web_w = [w[i] for i in range(40)]
    wiki_w = [w[100 + i] for i in range(10)]
    assert min(wiki_w) > max(web_w)  # clean vocab split -> clean margin


def test_selection_enriches_target_like_docs(spark, corpora):
    raw, target = corpora
    sel = dsir_select(raw, target, k=10)
    rows = sel.collect()
    assert len(rows) == 10
    wiki_selected = sum(1 for r in rows if r["doc_id"] >= 100)
    # wiki docs are 20% of raw but should dominate the selection
    assert wiki_selected >= 8
    # output is ordered by the selection key
    keys = [r["sel_key"] for r in rows]
    assert keys == sorted(keys, reverse=True)


def test_short_docs_survive_neutral(spark):
    raw = spark.createDataFrame(
        [
            (0, "single"),
            (1, None),
            (2, "two words here and more of them"),
            (3, "unrelated junk vocabulary entirely different from anything relevant"),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "two words here and more of them")], "doc_id long, text string"
    )
    w = {r["doc_id"]: (r["n_feats"], r["log_w"]) for r in
         dsir_importance_weights(raw, target).collect()}
    assert w[0] == (0, 0.0) and w[1] == (0, 0.0)  # no bigrams -> neutral
    assert w[2][0] == 6 and w[2][1] > 0.0   # matches the target exactly
    assert w[3][1] < 0.0                    # off-target vocabulary


def test_selection_plan_is_distributed_topk(spark, corpora):
    raw, target = corpora
    sel = dsir_select(raw, target, k=5)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan and "EvalPython" not in plan


def test_gram_buckets_deterministic_and_bounded(spark, corpora):
    raw, _ = corpora
    g1 = hashed_gram_buckets(raw, n_buckets=64)
    rows = g1.collect()
    assert all(0 <= r["bucket"] < 64 for r in rows)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, g1.collect()))


def test_empty_corpora_totals_coalesce(spark):
    """r15: R/T are derived as sums of the bucket counts (was two extra
    full gram passes); an EMPTY corpus must still yield the count()
    semantics (0, not NULL) so the smoothed log-ratio stays finite."""
    raw = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "")],
        "doc_id long, text string",
    )
    empty = raw.filter(F.col("doc_id") < 0)
    # empty TARGET: every bucket unseen, weights finite, all raw docs out
    w = {r["doc_id"]: r["log_w"]
         for r in dsir_importance_weights(raw, empty).collect()}
    assert set(w) == {0, 1}
    assert all(v == v and abs(v) < 1e6 for v in w.values())  # finite, not NaN
    # empty RAW: no rows, no crash
    assert dsir_importance_weights(empty, raw).collect() == []
