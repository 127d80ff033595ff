"""DSIR-style data selection: hashed n-gram importance resampling.

Implements the data-SELECTION step of LLM pretraining prep (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023 — public paper): given a huge RAW corpus and a small
TARGET corpus that exemplifies the distribution you want (wiki-quality
pages, a domain slice), weight every raw document by how target-like
its hashed n-gram features are and keep a Gumbel-top-k sample — the
principled replacement for "train a classifier, threshold the score"
domain filtering.

Model: both corpora are reduced to hashed n-gram bucket counts
(``md5_long(gram) % n_buckets`` — the paper's hashed feature space, no
vocabulary to build). Bucket ``b`` has smoothed probability
``p(b) = (c_b + s) / (total + s·B)`` under each corpus; a raw document
scores ``log_w = Σ_grams [ln p_target(b) − ln p_raw(b)]`` — the log
importance ratio under a bag-of-hashed-ngrams model. Sampling without
replacement via the Gumbel trick: ``key = log_w + Gumbel(doc_id)``
with deterministic hash-derived Gumbel noise, and the selected set is
the distributed top-k by key (``orderBy().limit(k)`` —
TakeOrderedAndProject, never a global window).

Scale shape, stage by stage, at 100 TB raw / bounded target:

- gram→bucket rows: pure codegen projection (explode + slice/concat/md5
  — the measured-fast shape every dedup family uses). The raw pass is
  the one corpus-sized scan.
- bucket counts: groupBy over a ≤``n_buckets`` key space — map-side
  partial agg collapses each task to ≤B rows, the shuffle is B-bounded.
- log-ratio table: ≤B rows, BROADCAST back; per-doc scoring is the gram
  projection joined map-side against it + one groupBy(doc_id) sum — one
  doc-keyed shuffle, no Python anywhere.
- selection: distributed top-k. ``k`` is caller-supplied; the oracle
  twin (queries/text.py::text_dsir_select) derives it as N/4 in SQL.

Float parity with the DuckDB oracle: the probability expressions are
written with IDENTICAL literal association in both engines, rounded to
4 decimals before any ordering decision; ranking ties break on doc_id.

No reference-repo equivalent (the reference is an ADS-B pipeline);
this is a training-data extension like operators/curation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texttools import md5_long, salted_md5_long, tokens

DSIR_GUMBEL_SALT = 57   # independent of the langid/mixture/split salts
DSIR_GUMBEL_MOD = 1_000_000


def hashed_gram_buckets(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 10_000,
) -> DataFrame:
    """(doc_id, bucket): one row per n-gram occurrence, hashed into
    ``n_buckets`` feature buckets. Documents shorter than ``n`` tokens
    contribute no rows (they score log_w = 0 downstream — no evidence
    either way). A zero-shuffle codegen projection."""
    d = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    )
    return (
        d.filter(F.size("toks") >= n)
        .select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(1), F.size("toks") - (n - 1))).alias("pos"),
        )
        .select(
            "doc_id",
            (
                md5_long(F.concat_ws(" ", F.slice(F.col("toks"), F.col("pos"), n)))
                % int(n_buckets)
            ).alias("bucket"),
        )
    )


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """(doc_id, n_feats, log_w) for every raw document: the hashed
    n-gram log importance ratio toward the target corpus, rounded to 4
    decimals. Docs with no n-grams get (0, 0.0).

    Plan: two B-bounded bucket-count aggregations, the ≤B-row log-ratio
    table broadcast, one doc-keyed sum — the raw corpus is scanned
    twice (gram pass for counts, gram pass for scoring); callers
    looping over many targets should persist the gram rows."""
    s = float(smoothing)
    B = int(n_buckets)
    gr = hashed_gram_buckets(
        raw, text_col=text_col, id_col=id_col, n=n, n_buckets=B
    )
    gt = hashed_gram_buckets(
        target, text_col=text_col, id_col=id_col, n=n, n_buckets=B
    )
    cr = gr.groupBy("bucket").agg(F.count("*").alias("cr"))
    ct = gt.groupBy("bucket").agg(F.count("*").alias("ct"))
    # R and T are EXACTLY the sums of the bucket counts — deriving them
    # from cr/ct removes two full gram passes over the corpora (r15;
    # was gr.count() + gt.count(), each re-running tokenize + explode +
    # hash). coalesce: an empty corpus has no bucket rows, sum → NULL,
    # where count() returned 0.
    totals = (
        cr.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("R"))
        .crossJoin(ct.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("T")))
    )
    # association order mirrors the DuckDB oracle text EXACTLY
    lr = (
        cr.join(ct, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(s))
                    / (F.col("T") + F.lit(s * B))
                )
                - F.log((F.col("cr") + F.lit(s)) / (F.col("R") + F.lit(s * B)))
            ).alias("lr"),
        )
    )
    scores = (
        gr.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.sum("lr"), 4).alias("log_w"),
        )
    )
    return (
        raw.select(F.col(id_col).alias("doc_id"))
        .join(scores, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
        )
    )


def gumbel_key(doc_id_col, *, salt: int = DSIR_GUMBEL_SALT) -> "F.Column":
    """Deterministic hash-derived Gumbel(0,1) noise for a document id:
    ``u = (md5(salt|id) mod M + 0.5)/M`` (open interval — never 0 or 1),
    ``g = −ln(−ln u)``. Reproducible, coordination-free, identical in
    the DuckDB oracle; rounded to 4 decimals by callers before ordering
    so a last-ulp libm difference can't flip a rank."""
    u = (
        salted_md5_long(doc_id_col.cast("string"), salt) % DSIR_GUMBEL_MOD
        + F.lit(0.5)
    ) / DSIR_GUMBEL_MOD
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    *,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
    salt: int = DSIR_GUMBEL_SALT,
) -> DataFrame:
    """The ``k`` raw documents selected by Gumbel-top-k importance
    resampling: (doc_id, n_feats, log_w, gumbel, sel_key), ordered by
    selection key descending. ``sel_key = log_w + gumbel`` (both
    4-decimal-rounded); ties break on doc_id. The top-k is a
    distributed ``orderBy().limit(k)`` — per-partition heads, no global
    window, no driver sort of the corpus."""
    w = dsir_importance_weights(
        raw,
        target,
        text_col=text_col,
        id_col=id_col,
        n=n,
        n_buckets=n_buckets,
        smoothing=smoothing,
    )
    g = F.round(gumbel_key(F.col("doc_id"), salt=salt), 4)
    return (
        w.withColumn("gumbel", g)
        .withColumn("sel_key", F.col("log_w") + F.col("gumbel"))
        .orderBy(F.desc("sel_key"), F.asc("doc_id"))
        .limit(int(k))
    )
