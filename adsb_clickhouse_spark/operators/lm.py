"""CCNet-style hashed-bigram LM perplexity quality filtering.

Implements the perplexity-filter step of LLM pretraining prep (Wenzek
et al., "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data", LREC 2020 — public paper): train a small language model on
a CLEAN reference corpus (CCNet uses Wikipedia), score every raw
document by its per-token cross-entropy under that model, and split
the corpus into head / middle / tail perplexity terciles — "head" is
the most-reference-like third, the slice that typically feeds training
first. The quality-by-fluency member of the training-data family, next
to the heuristic quality gates (operators/curation.py) and importance
resampling (operators/selection.py).

Model: a conditional bigram LM over HASHED token buckets (no
vocabulary to build, same trick as DSIR's feature space):

    P(w | prev) = (c(b_prev, b_w) + s) / (c(b_prev) + s·B)

with ``b_x = md5_long(x) % B`` and add-``s`` smoothing over the
``B``-bucket successor space. A document's score is the cross-entropy

    ce = −(1/T) · Σ_bigrams ln P(w_i | w_{i−1})

rounded to 4 decimals (the DSIR float-parity discipline: identical
literal association in the DuckDB oracle, round before any ordering
decision). Unseen context buckets fall back to the uniform 1/B.

Tercile assignment is by VALUE, not rank: the thresholds are the
smallest rounded-ce values t1, t2 with 3·cum ≥ n and 3·cum ≥ 2n over
the ce histogram, and assignment compares STRICTLY (head: ce < t1) —
every doc with an equal score lands in the same bucket, ties that span
a boundary sink to the later bucket, deterministic and identical in
the SQL oracle.

Scale shape at 100 TB raw / bounded reference:

- training touches only the REFERENCE corpus: two ref-bounded
  aggregations (pair counts, context counts); the LM tables are
  ref-corpus-bounded and BROADCAST — the same contract as benchmark
  decontamination (ref ≪ raw, like eval ≪ train).
- scoring is the one corpus-sized pass: a codegen bigram projection,
  two broadcast hash joins against the LM tables, one doc-keyed sum.
  No corpus shuffle except the doc-keyed aggregation, no Python.
- the threshold pass runs on the ce HISTOGRAM — bounded by the number
  of distinct 4-decimal scores (a value-space bound, corpus-size-free),
  collected under the bounded-driver contract; the two thresholds
  return to the plan as literals.

No reference-repo equivalent (the reference is an ADS-B pipeline);
this is a training-data extension like operators/selection.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texttools import md5_long, tokens


def _bigram_buckets(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """(doc_id, bc, bw): one row per token bigram, both sides hashed
    into ``n_buckets``. Docs with <2 tokens contribute no rows. A
    zero-shuffle codegen projection."""
    B = int(n_buckets)
    d = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    )
    return (
        d.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("toks") - 1)).alias("pos"),
            "toks",
        )
        .select(
            "doc_id",
            (md5_long(F.element_at("toks", F.col("pos"))) % B).alias("bc"),
            (md5_long(F.element_at("toks", F.col("pos") + 1)) % B).alias("bw"),
        )
    )


def lm_train(
    ref: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> tuple[DataFrame, DataFrame]:
    """(pair_counts, ctx_counts) for the reference corpus: the hashed
    conditional-bigram LM. Both tables are ref-corpus-bounded (pair
    rows ≤ distinct observed bigram buckets ≤ ref bigram count) — the
    broadcast-ability contract callers rely on."""
    g = _bigram_buckets(
        ref, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )
    pairs = g.groupBy("bc", "bw").agg(F.count("*").alias("cp"))
    # context counts are EXACTLY the pair counts re-aggregated — both
    # count the same bigram rows, so Σ_bw cp(bc, bw) = cc(bc) (integer
    # sums, no float). Deriving ctx from pairs removes the second
    # reference-corpus tokenize+explode pass; what remains is a
    # pair-table-bounded aggregation (≤ distinct observed bigram
    # buckets), free at any corpus size (r15, guide §2.4).
    ctx = pairs.groupBy("bc").agg(F.sum("cp").alias("cc"))
    return pairs, ctx


def lm_cross_entropy(
    raw: DataFrame,
    ref: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    smoothing: float = 1.0,
) -> DataFrame:
    """(doc_id, n_bigrams, ce) for every raw document. ``ce`` is the
    per-bigram cross-entropy under the reference LM, rounded to 4
    decimals; docs with <2 tokens get (0, NULL).

    Plan: ref-bounded LM aggregations broadcast; the raw corpus is one
    bigram projection + two broadcast left joins + one doc-keyed sum."""
    s = float(smoothing)
    B = int(n_buckets)
    pairs, ctx = lm_train(
        ref, text_col=text_col, id_col=id_col, n_buckets=B
    )
    g = _bigram_buckets(
        raw, text_col=text_col, id_col=id_col, n_buckets=B
    )
    # association order mirrors the DuckDB oracle text EXACTLY:
    # ln((cp + s) / (cc + s*B)); unseen context -> cc = 0 -> uniform 1/B
    lp = (
        g.join(F.broadcast(pairs), ["bc", "bw"], "left")
        .join(F.broadcast(ctx), ["bc"], "left")
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("cp"), F.lit(0)) + F.lit(s))
                / (F.coalesce(F.col("cc"), F.lit(0)) + F.lit(s * B))
            ).alias("lp"),
        )
    )
    scores = lp.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(-F.sum("lp") / F.count("*"), 4).alias("ce"),
    )
    return (
        raw.select(F.col(id_col).alias("doc_id"))
        .join(scores, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.col("ce"),
        )
    )


def perplexity_thresholds(scored: DataFrame) -> tuple[float | None, float | None]:
    """(t1, t2): the smallest rounded-ce values whose cumulative count
    reaches n/3 and 2n/3. Computed from the ce HISTOGRAM — bounded by
    the number of distinct 4-decimal scores (a value-space bound,
    corpus-size-free), so the driver-side cumulative sum is the same
    bounded-collect contract as the packing offsets; no corpus data and
    no single-partition window anywhere."""
    hist = sorted(
        (r["ce"], r["c"])
        for r in scored.filter(F.col("ce").isNotNull())
        .groupBy("ce")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    n = sum(c for _, c in hist)
    t1 = t2 = None
    cum = 0
    for ce, c in hist:
        cum += c
        if t1 is None and cum * 3 >= n:
            t1 = ce
        if t2 is None and cum * 3 >= n * 2:
            t2 = ce
            break
    return t1, t2


def perplexity_buckets(scored: DataFrame) -> DataFrame:
    """Adds CCNet's (head, middle, tail) tercile bucket to a
    ``lm_cross_entropy`` result; docs without a score get 'unscored'.

    Assignment is by VALUE with STRICT comparisons — head: ce < t1,
    middle: ce < t2, tail: the rest — so all docs sharing a rounded
    score share a bucket, and a tie that spans a tercile boundary is
    pushed into the LATER (worse) bucket: ambiguous mass never inflates
    the premium head slice. Degenerate case this matters for: a corpus
    where >2/3 of docs score identically (e.g. every bigram unseen →
    uniform 1/B) puts that mass in tail, not head."""
    t1, t2 = perplexity_thresholds(scored)
    bucket = F.when(F.col("ce").isNull(), F.lit("unscored"))
    if t1 is not None:
        bucket = bucket.when(F.col("ce") < F.lit(t1), F.lit("head"))
    if t2 is not None:
        bucket = bucket.when(F.col("ce") < F.lit(t2), F.lit("middle"))
    return scored.select(
        "doc_id", "n_bigrams", "ce", bucket.otherwise(F.lit("tail")).alias("bucket")
    )


def lm_perplexity_filter(
    raw: DataFrame,
    ref: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    smoothing: float = 1.0,
) -> DataFrame:
    """(doc_id, n_bigrams, ce, bucket): the full CCNet perplexity
    split — score under the reference LM, then tercile-bucket.

    The scored frame is materialized ONCE (lazy localCheckpoint): the
    threshold pass collects its ce histogram and the caller's result
    reads it again — without the pin the whole scoring pipeline
    (corpus bigram projection + LM broadcast joins + doc-keyed sum)
    ran twice (r15; the frame is doc-sized — one row per document —
    strictly smaller than re-running the corpus-sized scoring)."""
    scored = lm_cross_entropy(
        raw,
        ref,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        smoothing=smoothing,
    ).localCheckpoint(eager=False)
    return perplexity_buckets(scored)
