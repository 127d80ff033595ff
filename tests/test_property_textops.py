"""Property tests for the round-6 text operators against pure-Python
reference implementations: random small-vocab corpora (small vocab ⇒
dense cross-doc k-gram collisions, the adversarial regime for the
interval merge) checked doc-for-doc against a dict-and-loop oracle.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

VOCAB = [f"w{i}" for i in range(6)]  # tiny vocab -> dup-dense k-grams

doc_strategy = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=30)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=12)


def ref_substring_dedup(token_lists: list[list[str]], k: int):
    """Reference: global k-gram counts, covered positions, merged spans."""
    from collections import Counter

    counts: Counter = Counter()
    for toks in token_lists:
        for i in range(len(toks) - k + 1):
            counts[tuple(toks[i : i + k])] += 1
    out = []
    for toks in token_lists:
        n = len(toks)
        covered = [False] * n
        for i in range(n - k + 1):
            if counts[tuple(toks[i : i + k])] >= 2:
                for j in range(i, i + k):
                    covered[j] = True
        spans = sum(
            1 for t in range(n) if covered[t] and (t == 0 or not covered[t - 1])
        )
        kept = [tok for t, tok in enumerate(toks) if not covered[t]]
        out.append((sum(covered), spans, " ".join(kept)))
    return out


def ref_chunks(toks: list[str], c: int, s: int):
    n = len(toks)
    n_chunks = 1 if n <= c else 1 + -(-(n - c) // s)
    return [
        (i, i * s + 1, max(min(c, n - i * s), 0), " ".join(toks[i * s : i * s + c]))
        for i in range(n_chunks)
    ]


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus=corpus_strategy, k=st.integers(min_value=2, max_value=5))
def test_substring_dedup_matches_reference(sp, corpus, k):
    from adsb_clickhouse_spark.operators.dedup import duplicated_substring_stats

    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    d = sp.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_dup_tokens"], r["n_dup_spans"], r["dedup_text"])
        for r in duplicated_substring_stats(d, k=k).collect()
    }
    want = ref_substring_dedup(corpus, k)
    for i, exp in enumerate(want):
        assert got[i] == exp, f"doc {i} k={k}: {got[i]} != {exp}"


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    toks=st.lists(st.sampled_from(VOCAB), min_size=0, max_size=40),
    c=st.integers(min_value=1, max_value=8),
    s=st.integers(min_value=1, max_value=8),
)
def test_chunk_documents_matches_reference(sp, toks, c, s):
    from adsb_clickhouse_spark.operators.packing import chunk_documents

    d = sp.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    got = sorted(
        (r["chunk_idx"], r["start_tok"], r["n_tok"], r["chunk_text"])
        for r in chunk_documents(d, chunk_tokens=c, stride=s).collect()
    )
    assert got == ref_chunks(toks, c, s)
