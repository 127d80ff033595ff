"""BPE merge learning (operators/bpe.py) vs a pure-Python reference
implementation of Sennrich et al. 2016 with identical tie-breaking."""

from collections import Counter

import pytest

from pyspark.sql import functions as F

from adsb_clickhouse_spark.operators.bpe import (
    EOW,
    bpe_learn,
    bpe_segment,
    segment_words,
)


def _ref_symbols(word: str) -> tuple[str, ...]:
    chars = list(word)
    chars[-1] = chars[-1] + EOW
    return tuple(chars)


def _ref_apply(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return tuple(out)


def _ref_bpe(word_freqs: dict[str, int], n_merges: int, min_pair_freq: int = 2):
    vocab = {_ref_symbols(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_freq:
            break
        merges.append((a, b))
        # re-apply the whole merge list from scratch (clarity over speed)
        vocab = {}
        for w, f in word_freqs.items():
            s = _ref_symbols(w)
            for ma, mb in merges:
                s = _ref_apply(s, ma, mb)
            vocab[s] = vocab.get(s, 0) + f
    return merges


CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest"),
    (3, "widest widest widest"),
    (4, "low lower newest widest"),
]


def _word_freqs(rows):
    c = Counter()
    for _, text in rows:
        for w in text.split():
            c[w] += 1
    return dict(c)


def test_bpe_learn_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = bpe_learn(docs, n_merges=10)
    want = _ref_bpe(_word_freqs(CORPUS), 10)
    assert got == want
    assert len(got) == 10  # this corpus supports at least 10 merges


def test_bpe_learn_deterministic(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    assert bpe_learn(docs, n_merges=5) == bpe_learn(docs, n_merges=5)


def test_segment_words_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_learn(docs, n_merges=6)
    words = spark.createDataFrame(
        [("low",), ("lowest",), ("newest",), ("a",)], "word string"
    )
    got = {r["word"]: tuple(r["pieces"]) for r in segment_words(words, merges).collect()}
    for w in ["low", "lowest", "newest", "a"]:
        s = _ref_symbols(w)
        for a, b in merges:
            s = _ref_apply(s, a, b)
        assert got[w] == s, w
    # pieces always reassemble the word exactly
    for w, pieces in got.items():
        assert "".join(pieces) == w + EOW


def test_bpe_segment_corpus_counts(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_learn(docs, n_merges=8)
    seg = bpe_segment(docs, merges)
    rows = {r["doc_id"]: r for r in seg.collect()}
    assert rows[0]["n_words"] == 5
    # "low" merges to a single piece on this corpus -> 5 pieces total
    assert rows[0]["n_pieces"] >= 5
    # pieces reassemble the document's tokens in order
    assert "".join(rows[0]["pieces"]) == ("low" + EOW) * 5
    # plan: corpus side is a broadcast join, no Python
    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "EvalPython" not in plan


def test_bpe_driver_and_distributed_paths_agree(spark):
    """r15 size-adaptive split: the collected-vocab pure-Python learner
    (default below DRIVER_VOCAB_THRESHOLD) and the distributed merge
    loop (forced via driver_vocab_threshold=0) must produce the same
    merge list — and both must match the reference implementation."""
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    drv = bpe_learn(docs, n_merges=10)
    dist = bpe_learn(docs, n_merges=10, driver_vocab_threshold=0)
    assert drv == dist == _ref_bpe(_word_freqs(CORPUS), 10)


def test_bpe_early_stop_on_tiny_corpus(spark):
    docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    merges = bpe_learn(docs, n_merges=50)
    # only ~2 merges exist before every word is one symbol
    assert 1 <= len(merges) <= 3
