"""Document deduplication operators for training-data pipelines.

Four families, each a DataFrame→DataFrame operator designed for the
100 TB regime:

- **exact** — md5-fingerprint groupBy. One shuffle on the 16-byte hash,
  map-side partial agg; the canonical-id choice (min doc_id) is a plain
  aggregate. Scales linearly.
- **n-gram Jaccard** — shingle inverted index + self-join: only documents
  sharing ≥1 shingle meet, so the candidate set is sparse (vs the O(n²)
  cross join). At 100 TB the hot-shingle skew is the bottleneck → drop
  top-frequency shingles (stopword shingles carry no dedup signal) via
  ``max_shingle_freq``.
- **MinHash + LSH** — k salted min-hashes per doc, banded into b buckets;
  candidate pairs share a band bucket; exact Jaccard verifies. The band
  join touches only ~n·b rows — this is the scale path when the shingle
  index itself is too hot.
- **SimHash** — 32-bit sign-fingerprint of token hashes; near-dups have
  small Hamming distance. Emitted per-doc (join-on-band to pair up).

All hashing is the cross-engine md5 scheme from
:mod:`..functions.texttools`, so every operator has an exact DuckDB
oracle (queries/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texttools import md5_long, tokens


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (fingerprint, n_docs,
    canonical_id, doc_ids). Only groups with >1 member are returned."""
    return (
        # NULL text fingerprints as '' (the tokens()-family contract) —
        # and unlike a NULL fingerprint it can match in equality joins
        # on both engines
        docs.select(
            F.col(id_col),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _shingle_rows(docs: DataFrame, text_col: str, id_col: str, w: int) -> DataFrame:
    """(id, s) shingle rows, NON-distinct, fully whole-stage-codegen.

    Positions explode via ``sequence()`` and each shingle is built per
    row with ``array_join(slice(tk, i, w))`` — regular codegen
    expressions. Building the shingle ARRAY first (a ``transform`` lambda) evaluates interpreted per element and measured
    ~6× slower at sf0.1 (3.15 s vs 0.51 s for the hashed distinct
    index). The token array is consumed inside the same codegen stage,
    so it is never materialized per exploded row. Docs shorter than w
    tokens yield one whole-doc shingle (the [whole-doc-join]
    fallback the DuckDB twin duck_word_shingles also takes)."""
    tk = tokens(F.col(text_col))
    return (
        docs.select(F.col(id_col).alias("id"), tk.alias("tk"))
        .select(
            "id",
            "tk",
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.size("tk") - (w - 1), F.lit(1)))
            ).alias("i"),
        )
        .select("id", F.array_join(F.slice("tk", F.col("i"), w), " ").alias("s"))
    )


def _shingle_index(docs: DataFrame, text_col: str, id_col: str, w: int) -> DataFrame:
    """(id, shingle) rows, NON-distinct (duplicate shingles within a doc
    pass through). Safe for its only consumer — minhash signatures,
    where ``min()`` is insensitive to multiplicity — and skipping the
    per-doc dedup avoids an aggregation exchange entirely."""
    return _shingle_rows(docs, text_col, id_col, w).select(
        "id", F.col("s").alias("shingle")
    )


def _hashed_shingle_index(docs: DataFrame, text_col: str, id_col: str, w: int) -> DataFrame:
    """(id, h) rows over 60-bit md5 shingle hashes, NON-distinct — the
    min-aggregate consumers (LSH minhash signatures) are insensitive to
    multiplicity, so no dedup exchange. 2^60 keyspace makes collisions
    negligible (and the DuckDB oracle hashes identically, so any
    collision affects both engines the same way). Shingles build as
    exploded rows so md5+conv run inside whole-stage codegen, never as
    an interpreted array-lambda."""
    return _shingle_rows(docs, text_col, id_col, w).select(
        "id", md5_long(F.col("s")).alias("h")
    )


def _xx_shingle_index(docs: DataFrame, text_col: str, id_col: str, w: int) -> DataFrame:
    """(id, h) DISTINCT inverted index over xxhash64 shingle hashes.

    Used ONLY where the hash never reaches the output (exact-Jaccard
    candidate generation + common counts): xxhash64 is a codegen'd JVM
    primitive — no hex-string materialization, ~10× cheaper than the md5
    path — and the DuckDB oracle joins the raw shingle strings instead,
    so outputs agree unless a 64-bit collision changes a Jaccard count
    (P ≈ n²/2⁶⁵; any occurrence fails the gate's value hash loudly).

    The per-doc dedup (Jaccard needs SET semantics) is a distinct on
    (id, h): each doc's exploded rows stay inside one input task, so the
    partial aggregate removes all duplicates map-side and the exchange
    carries already-distinct volume. That one exchange costs less than
    building distinct arrays with the interpreted ``transform`` lambda
    (0.51 s vs 3.15 s at sf0.1 for the whole index) — and at cluster
    scale it shuffles the same (id, h) volume the candidate join must
    shuffle anyway."""
    return (
        _shingle_rows(docs, text_col, id_col, w)
        .select("id", F.xxhash64("s").alias("h"))
        .distinct()
    )


def _shingle_sizes(docs: DataFrame, text_col: str, id_col: str, w: int) -> DataFrame:
    """|shingle-set| per doc as a count-distinct over the codegen row
    index — one exchange on id, with the partial aggregate deduping
    map-side (docs never span input tasks). The shuffle-free
    alternative, sizing a transform-built shingle array, prices the interpreted
    array-lambda on every doc and measured slower end-to-end; the
    distinct count uses xxhash64 like the verify index (collisions
    would shift a Jaccard denominator — same negligible-P,
    loud-failure argument as _xx_shingle_index)."""
    return (
        _shingle_rows(docs, text_col, id_col, w)
        .select("id", F.xxhash64("s").alias("h"))
        .groupBy("id")
        .agg(F.count_distinct("h").alias("n"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Candidate pairs by shared shingle, scored with exact Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.
    ``max_shingle_freq`` drops shingles appearing in more than that many
    docs before the join (skew control at scale; exactness is preserved
    only for pairs sharing at least one surviving shingle).
    """
    sh = _xx_shingle_index(docs, text_col, id_col, w)
    # |shingle set| per doc DERIVED from the index (r16): the index is
    # already distinct (id, h), so its per-id row count IS the set size
    # — re-aggregating it replaces the second full corpus shingle pass
    # (_shingle_sizes' explode + xxhash64 + count_distinct) with a
    # doc-sized re-agg whose subtree ReuseExchange shares with the join
    # sides. Sizes stay UNCAPPED (computed before the hot-shingle
    # window below), matching the oracle's denominator.
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    if max_shingle_freq is not None:
        # fold the hot-shingle cap into the shuffle the self-join needs
        # anyway: a count window over h hash-partitions by h, the join
        # reuses that partitioning — no extra scan, groupBy, or broadcast
        from pyspark.sql import Window

        sh = (
            sh.withColumn("__freq", F.count("*").over(Window.partitionBy("h")))
            .filter(F.col("__freq") <= max_shingle_freq)
            .drop("__freq")
        )
    # self-join as a SHUFFLE join, pinned: AQE otherwise broadcasts one
    # side at bench scale, which (a) re-evaluates the whole index subtree
    # into a hash table (measured ~15% slower than shuffling it) and
    # (b) is the wrong strategy at 100 TB, where the index is corpus-sized
    # and only ever shuffle-joinable. No persist — the plan is returned
    # unexecuted, so the operator can't own an unpersist.
    a = sh.alias("a")
    b = sh.hint("shuffle_hash").alias("b")
    common = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "n": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


MINHASH_PRIME = 2147483647  # 2^31 - 1; products stay < 2^63 in both engines


def minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) universal-hash constants, derived from md5 in
    pure python so the DuckDB oracle can inline identical literals."""
    import hashlib

    params = []
    for i in range(k):
        h = hashlib.md5(f"minhash:{i}".encode()).hexdigest()
        a = (int(h[:8], 16) % (MINHASH_PRIME - 1)) + 1
        b = int(h[8:16], 16) % MINHASH_PRIME
        params.append((a, b))
    return params


def minhash_signatures(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    w: int = 3,
) -> DataFrame:
    """(id, minhash_0..k-1): min over shingles of k universal hashes.

    md5 is computed ONCE per shingle (the expensive part); the k
    permutations are cheap integer arithmetic h_i = (a_i·h + b_i) mod p —
    one explode + one groupBy with k min() aggregates, map-side partials.
    """
    sh = _shingle_index(docs, text_col, id_col, w).withColumn(
        "h", md5_long(F.col("shingle")) % MINHASH_PRIME
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_PRIME).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_params(k))
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    w: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Docs agreeing on all r=k/bands hashes of any band become candidates
    (P[candidate] ≈ 1-(1-j^r)^b — the standard S-curve); candidates are
    then verified with exact Jaccard so output = true pairs ≥ threshold
    among LSH candidates.
    """
    r = k // bands
    sh = _hashed_shingle_index(docs, text_col, id_col, w)
    hashed = sh.withColumn("h", F.col("h") % MINHASH_PRIME)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_PRIME).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_params(k))
    ]
    sig = hashed.groupBy("id").agg(*aggs)
    # one (band, band_key) row per band via a single explode — a per-band
    # UNION would re-evaluate the whole signature pipeline (index + 16-min
    # groupBy) once per band per join side; the explode keeps it to one
    # subtree, and the self-join's identical sides reuse one exchange
    bands_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_", *[F.col(f"mh_{b * r + j}") for j in range(r)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    band_rows = sig.select("id", F.explode(bands_arr).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )
    x = band_rows.alias("x")
    y = band_rows.alias("y")
    candidates = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    # candidate-first verification: only candidate PAIRS touch the shingle
    # index (join index to each candidate side), instead of pair-counting
    # every id<id pair that shares a shingle. At 100 TB the full-index
    # self-join is quadratic in hot-shingle frequency; this path is linear
    # in |candidates| x doc shingle count.
    # The verify index uses xxhash64, not md5: only hash EQUALITY matters
    # here (common-shingle counts), and xxhash64 is a codegen'd primitive
    # ~10x cheaper than md5+conv — the md5 index above is kept only where
    # its values reach the output (the minhash signatures).
    vx = _xx_shingle_index(docs, text_col, id_col, w)
    # |shingle set| per doc derived from the (distinct) verify index
    # instead of a third full corpus shingle pass (r16 — same
    # derivation as ngram_jaccard_pairs)
    sizes = vx.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    fa = vx.withColumnsRenamed({"id": "id_a"})
    fb = vx.withColumnsRenamed({"id": "idb2", "h": "hb"})
    common = (
        candidates.join(fa, "id_a")
        .join(fb, (F.col("id_b") == F.col("idb2")) & (F.col("h") == F.col("hb")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "n": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_band_rows(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    w: int = 3,
) -> DataFrame:
    """(id, sig, bkey): one row per (document, LSH band) with the full
    k-value minhash signature and the band compressed into ONE long
    equi-join key ``bkey = md5_long(band ‖ '_' ‖ band_key)`` — the
    probe/store rows of the streaming text band index
    (streaming/curation.py, ``text_near_dedup=True``), mirroring the
    phash band key (operators/multimodal.py::phash_band_keys): a single
    long key lets the stored side be bucketed on exactly the join key.

    Documents with no w-shingles (short/NULL text) produce no rows —
    they can never be near-dups under the LSH law, only exact dups
    (which the fingerprint store owns). Same banding law as
    :func:`minhash_lsh_pairs`; the signature rides along so a probe can
    VERIFY by signature agreement (#equal positions / k estimates
    Jaccard) without touching any corpus text."""
    r = k // bands
    sh = _hashed_shingle_index(docs, text_col, id_col, w)
    hashed = sh.withColumn("h", F.col("h") % MINHASH_PRIME)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_PRIME).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_params(k))
    ]
    sig = hashed.groupBy("id").agg(*aggs)
    bands_arr = F.array(
        *[
            md5_long(
                F.concat_ws(
                    "_",
                    F.lit(str(b)),
                    *[F.col(f"mh_{b * r + j}") for j in range(r)],
                )
            )
            for b in range(bands)
        ]
    )
    sig_arr = F.array(*[F.col(f"mh_{i}") for i in range(k)])
    return sig.select(
        "id", sig_arr.alias("sig"), F.explode(bands_arr).alias("bkey")
    )


def simhash(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """(id, simhash): sign-aggregated token-hash fingerprint.

    Single explode + one groupBy with `bits` conditional sums — near-dup
    docs land within small Hamming distance. Token multiplicity is kept
    (frequency-weighted SimHash).
    """
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", md5_long(F.col("tok")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s_{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("id").agg(*bit_sums)
    fingerprint = None
    for i in range(bits):
        term = F.when(F.col(f"s_{i}") > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return agg.select("id", fingerprint.alias("simhash"))


def ngram_jaccard_pairs_prefix(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard pairs via prefix filtering (AllPairs/PPJoin family).

    Same output as :func:`ngram_jaccard_pairs`, quadratically cheaper
    candidate generation: shingles are globally ordered by (frequency,
    hash); a doc only indexes its first |S| - ceil(t·|S|) + 1 shingles.
    Two docs with J ≥ t MUST share a prefix shingle (pigeonhole on the
    common canonical order), so the candidate join runs on the ~(1-t)
    prefix of the index — and the rarest shingles at that, which is where
    the join fan-out is smallest. A size-ratio filter (|B| ≥ t·|A|)
    prunes further before verification against the full index.

    Crossover (measured, tools/bench_prefix_crossover.py): at bench
    scale (sf0.1, ~27k distinct shingles, max frequency 25) the naive
    inverted-index join is still faster (~4.9 s vs ~7.4 s median) — the
    ranking windows' fixed cost exceeds the candidate savings on a corpus
    with no hot shingles. On a boilerplate-heavy corpus (every doc
    sharing a hot template, the web-dedup regime) the naive join's
    candidate fan-out grows quadratically in shingle frequency while the
    prefix drops hot shingles from every doc's prefix; see README for the
    measured crossover table.
    """
    from pyspark.sql import Window

    # the index feeds several plan branches; recomputing the (cheap,
    # codegen'd) explode+hash per branch measures FASTER than
    # materializing it (persist leaks CacheManager entries across calls —
    # r1 advisor; localCheckpoint measured 1.7x slower by blocking
    # column-pruning into the branches)
    # xxhash64 is safe here: prefix filtering is exact under ANY global
    # shingle order, so the (freq, h) tie-break need not match the oracle's
    sh = _xx_shingle_index(docs, text_col, id_col, w)
    # shingle frequency via count-over-window, not groupBy+join: the freq
    # table's cardinality is the distinct-shingle count, which grows with
    # the corpus (a blind broadcast is a 100 TB OOM; a shuffle join is two
    # extra exchanges). The window folds the count into one shuffle on h,
    # and the per-doc ranking window then reshuffles on id — two
    # exchanges total for the whole ranked prefix.
    wnd = Window.partitionBy("id").orderBy("freq", "h")
    ranked = (
        sh.withColumn("freq", F.count("*").over(Window.partitionBy("h")))
        .withColumn("rn", F.row_number().over(wnd))
        .withColumn("n", F.count("*").over(Window.partitionBy("id")))
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    ).select("id", "h", "n")
    a = prefix.alias("a")
    b = prefix.alias("b")
    # candidates carry both docs' |shingle-set| sizes straight from the
    # ranking window's n (functionally dependent on the ids, so the
    # distinct is unaffected) — the final Jaccard needs no sizes joins
    # and the index subtree is evaluated two fewer times
    candidates = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("b.n") * F.lit(threshold) <= F.col("a.n"))
            & (F.col("a.n") * F.lit(threshold) <= F.col("b.n")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .distinct()
    )
    # verify against the (cheap, codegen'd) exploded index — measured
    # FASTER than an array_intersect verify over per-doc shingle arrays
    # (8.9 s vs 7.4 s at sf0.1: the wide array rows cost more to join
    # than the explode fan-out costs to aggregate)
    fa = sh.withColumnsRenamed({"id": "id_a"})
    fb = sh.withColumnsRenamed({"id": "idb2", "h": "hb"})
    common = (
        candidates.join(fa, "id_a")
        .join(fb, (F.col("id_b") == F.col("idb2")) & (F.col("h") == F.col("hb")))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# naive-vs-prefix decision cutoff: measured mean candidate fan-out per
# index row is ~10.7 on the bench corpus (naive wins there, 2.8 s vs
# 4.9 s at sf0.1) and ≥112 on every boilerplate-heavy synthetic from
# tools/bench_prefix_crossover.py (where prefix wins by growing
# margins). 48 sits in the gap with ~4× margin on both sides.
NAIVE_FANOUT_CUTOFF = 48.0


def estimate_naive_fanout(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    sample_mod: int | None = None,
) -> float:
    """Estimated mean candidate fan-out per index row of the naive
    inverted-index self-join: (Σ_h f_h²) / (Σ_h f_h), where f_h is
    shingle h's document frequency. This is the statistic that decides
    the naive-vs-prefix crossover — the naive join's work is Σ f_h²,
    quadratic in hot-shingle frequency, while the prefix path's window
    fixed-costs don't care.

    ``sample_mod=s`` computes it on the deterministic 1/s hash-sample
    of docs and scales back (f_sampled ≈ f/s per shingle, so the ratio
    scales by 1/s): at cluster scale pass s ≈ 100 and the decision job
    touches 1% of the corpus; unsampled it is one scan + a map-side
    partial count per shingle — still far cheaper than either join."""
    src = docs
    if sample_mod and sample_mod > 1:
        src = docs.filter(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(sample_mod)) == 0
        )
    idx = _xx_shingle_index(src, text_col, id_col, w)
    row = (
        idx.groupBy("h")
        .count()
        .agg((F.sum(F.col("count") * F.col("count")) / F.sum("count")).alias("fo"))
        .first()
    )
    fo = float(row["fo"]) if row and row["fo"] is not None else 0.0
    return fo * (sample_mod if sample_mod and sample_mod > 1 else 1)


def ngram_jaccard_pairs_auto(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    threshold: float = 0.5,
    sample_mod: int | None = None,
    fanout_cutoff: float = NAIVE_FANOUT_CUTOFF,
) -> DataFrame:
    """Exact Jaccard ≥ threshold pairs, auto-selecting the physical
    strategy by the measured hot-shingle fan-out (VERDICT r5 #3: the
    crossover between :func:`ngram_jaccard_pairs` and
    :func:`ngram_jaccard_pairs_prefix` sits above bench scale, so a
    fixed choice is wrong somewhere — the operator decides per corpus).

    Both paths produce IDENTICAL output (prefix filtering is exact
    under any global shingle order), so the choice is purely physical:
    fan-out ≤ cutoff → the naive inverted-index join (cheaper fixed
    costs, wins on web-scale-rare shingles); fan-out > cutoff → prefix
    filtering (hot template shingles never enter the candidate join,
    wins on boilerplate-heavy corpora). The estimate is one cheap
    aggregate (sampled at scale via ``sample_mod``) ahead of either
    join — see :func:`estimate_naive_fanout` for the cutoff
    calibration."""
    fo = estimate_naive_fanout(
        docs, text_col=text_col, id_col=id_col, w=w, sample_mod=sample_mod
    )
    if fo > fanout_cutoff:
        return ngram_jaccard_pairs_prefix(
            docs, text_col=text_col, id_col=id_col, w=w, threshold=threshold
        )
    return ngram_jaccard_pairs(
        docs, text_col=text_col, id_col=id_col, w=w, threshold=threshold
    )


def decontamination_pairs(
    train: DataFrame,
    evalset: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Benchmark decontamination: (train_id, eval_id, containment) for
    every train document whose w-shingle overlap covers ≥ ``threshold``
    of an eval document's shingle set.

    Containment = |S_train ∩ S_eval| / |S_eval| — the GPT-3/PaLM-style
    n-gram contamination test, directional (a train doc that embeds a
    whole eval doc scores 1.0 however much else it contains, where
    Jaccard would dilute it).

    Scale shape: the eval side is benchmark-sized (thousands of docs)
    and FIXED while train grows to 100 TB, so the eval shingle index is
    the canonical broadcast dim — the train index streams map-side
    against it with no shuffle of the corpus, and only the (train, eval)
    hit pairs reach the one groupBy. Contrast the dedup self-joins,
    which must shuffle because both sides are corpus-sized.

    Reference analogue: none (the reference keeps raw history); this is
    the eval-leakage gate a training-data pipeline runs before export.
    """
    tr = _xx_shingle_index(train, text_col, id_col, w).withColumnsRenamed(
        {"id": "train_id"}
    )
    ev = _xx_shingle_index(evalset, text_col, id_col, w).withColumnsRenamed(
        {"id": "eval_id"}
    )
    # |shingle set| per eval doc derived from the (distinct) eval index
    # instead of a second evalset shingle pass (r16)
    ev_sizes = ev.groupBy("eval_id").agg(F.count(F.lit(1)).alias("n_eval"))
    common = (
        tr.join(F.broadcast(ev), "h")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(F.broadcast(ev_sizes), "eval_id")
        .withColumn("containment", F.round(F.col("common") / F.col("n_eval"), 4))
        .filter(F.col("containment") >= threshold)
        .select("train_id", "eval_id", "containment")
    )


def connected_components(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """(id, component) for every node of the near-dup pair graph, where
    ``component`` is the smallest node id reachable from ``id``.

    Dedup emits *pairs*; retention policy needs *clusters* (keep one doc
    per component, drop the rest). This is hash-to-min label propagation
    with pointer doubling: every round each node takes the min label over
    itself and its neighbors, then labels are shortcut one level
    (``comp := comp's comp``), so convergence is O(log diameter) rounds
    rather than O(diameter) — the bound that matters when a hot template
    chains thousands of documents. Each round is a constant number of
    shuffles on the node id, and lineage is truncated per round
    (``localCheckpoint``) so the plan stays flat across iterations.
    Convergence is detected by the (monotone non-increasing) sum of
    labels going stable; all labels are node ids, so the fixpoint is
    exactly the per-component min — fully deterministic, which is what
    lets a DuckDB recursive CTE oracle the result (queries/dedup.py).

    Size-adaptive, like broadcast-vs-shuffle join selection: post-threshold
    pair sets are usually tiny relative to the corpus, and at or below
    ``driver_threshold`` PAIRS the component labels come from a driver
    union-find fed by one limit-bounded collect of the pair list (a
    provably small set, zero iteration jobs) — identical output. Past the
    cap the distributed iteration engages automatically; the 1.8M-edge
    probe in README exercises it.

    Reference analogue: none (the reference keeps raw history); this is
    the training-data pipeline's dup-cluster step.
    """
    # bounded probe-collect (r16): the driver path previously built a
    # distinct edge frame (eager checkpoint), counted it, and collected
    # it — 4-5 fixed-latency jobs per call. ONE limit-bounded collect of
    # the PAIR list (≤ driver_threshold+1 rows — the pair count bounds
    # the edge count) both decides the path and feeds the union-find;
    # duplicate and reversed edges are union-find no-ops, so the
    # distinct pass moves to the driver for free. The size guard now
    # counts PAIRS where it counted distinct directed edges (≤ 2×pairs)
    # — the same "provably small" bound, and the two paths are
    # output-identical either way (parity-pinned). Past the cap the
    # distributed iteration below is unchanged.
    probe = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .limit(int(driver_threshold) + 1)
        .collect()
    )
    if len(probe) <= driver_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for row in probe:
            u, v = row["u"], row["v"]
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by MIN root so labels match the distributed fixpoint
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
        rows = [(x, find(x)) for x in parent]
        return pairs.sparkSession.createDataFrame(rows or [], "id long, comp long")
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .unionByName(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round; truncate lineage once
    )
    labels = (
        edges.select(F.col("u").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint(eager=True)
    prev_sum = None
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels.withColumnRenamed("id", "u"), "u")
            .groupBy("v")
            .agg(F.min("comp").alias("nc"))
            .withColumnRenamed("v", "id")
        )
        merged = labels.join(nbr_min, "id", "left").select(
            "id", F.least(F.col("comp"), F.coalesce("nc", "comp")).alias("comp")
        )
        # pointer doubling: follow comp one hop through the label table
        hop = (
            merged.alias("m")
            .join(
                merged.select(F.col("id").alias("c_id"), F.col("comp").alias("c_comp")),
                F.col("m.comp") == F.col("c_id"),
                "left",
            )
            .select(
                F.col("m.id").alias("id"),
                F.least(F.col("m.comp"), F.coalesce("c_comp", F.col("m.comp"))).alias("comp"),
            )
        )
        labels = hop.localCheckpoint(eager=True)
        cur_sum = labels.agg(F.sum("comp")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def winnow_fingerprints(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    kernel: str = "window",
) -> DataFrame:
    """(doc_id, fingerprint): winnowing document fingerprints
    (Schleimer et al., SIGMOD 2003) — rolling character k-gram hashes,
    minimum per w-hash window, distinct minima per document.

    The guarantee that makes this the LOCAL-alignment dedup primitive:
    any shared substring of length ≥ k+w-1 contributes at least one
    COMMON fingerprint to both documents, however different the rest of
    the text is — which is exactly what whole-document Jaccard/MinHash
    can't see when a long quote sits inside two otherwise-unrelated
    pages.

    Two kernels, identical rows (pinned by
    tests/test_dataops.py::test_winnow_kernels_agree):

    - ``kernel="window"``: explode gram positions → codegen md5 →
      frame-bounded window min → collect_set on the window's existing
      doc_id partitioning. The window's ``partitionBy(doc_id)`` hashes
      and sorts EVERY GRAM ROW (~n_chars per doc) through one corpus-
      sized exchange.
    - ``kernel="arrow"`` (r15): the whole computation is per-doc-local,
      so one ``mapInPandas`` pass computes each doc's fingerprints
      in-task (hashlib md5 — bytewise the md5_long law — and a
      vectorized numpy w-window min) and the gram rows NEVER exist as
      Spark rows: zero exchanges before the caller's own ordering, and
      the Python boundary carries (doc_id, text) in / the winnowed
      (doc_id, fingerprint) set out (~2/(w+1) of the gram count).
      Guide §2.4/§4.2/§8: the shuffle that disappears is the corpus-
      sized one; per-core Python md5 is ~4× JVM codegen md5, the
      standard trade of hash throughput for the removed exchange+sort.

    Earlier JVM-shape alternatives (doc-level pre-repartition;
    window-position explode + two-level groupBy) measured slower at
    sf0.1 than the window kernel; the A/B numbers live in the
    `text_winnow_fingerprint` row docstring."""
    from pyspark.sql import Window

    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    if kernel == "arrow":
        return _winnow_fingerprints_arrow(d, k=k, w=w)
    if kernel != "window":
        raise ValueError(f"unknown winnow kernel {kernel!r}")
    g = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("text") - (k - 1), F.lit(1)))
        ).alias("pos"),
        "text",
        F.greatest(F.length("text") - (k - 1) - (w - 1), F.lit(1)).alias("lim"),
    ).select(
        "doc_id", "pos", md5_long(F.expr(f"substr(text, pos, {k})")).alias("h"), "lim"
    )
    wmin = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    minima = g.withColumn("m", F.min("h").over(wmin)).filter(
        F.col("pos") <= F.col("lim")
    )
    return (
        minima.groupBy("doc_id")
        .agg(F.collect_set("m").alias("fps"))
        .select("doc_id", F.explode("fps").alias("fingerprint"))
    )


def _winnow_fps_py(text: str | None, k: int, w: int) -> "object":
    """One document's winnowing fingerprint set, bit-identical to the
    window kernel's rows: md5_long (= int(md5hex[:15], 16), 60-bit) of
    every character k-gram (the whole text when shorter than k — the
    substr(text, pos, k) law), numpy w-window minima over the first
    max(n_grams − w + 1, 1) positions, distinct. NULL text hashes to
    NULL on the window path (md5(NULL)) and its minima vanish in
    collect_set — here: an empty set. Returns a sorted int64 ndarray."""
    import hashlib

    import numpy as np

    if not isinstance(text, str):  # NULL arrives as None (or NaN)
        return np.empty(0, dtype=np.int64)
    n_g = max(len(text) - (k - 1), 1)
    md5 = hashlib.md5
    hs = np.fromiter(
        (
            int(md5(text[i : i + k].encode("utf-8")).hexdigest()[:15], 16)
            for i in range(n_g)
        ),
        dtype=np.int64,
        count=n_g,
    )
    lim = max(n_g - (w - 1), 1)
    m = hs[:lim].copy()
    for j in range(1, w):
        upper = min(j + lim, n_g)
        if upper > j:
            np.minimum(m[: upper - j], hs[j:upper], out=m[: upper - j])
    return np.unique(m)


def _winnow_fingerprints_arrow(d: DataFrame, *, k: int, w: int) -> DataFrame:
    """mapInPandas winnowing kernel over (doc_id, text): per-doc-local
    by construction, so no gram row ever crosses an exchange. See
    :func:`winnow_fingerprints` (kernel="arrow").

    Fan-out guard: :func:`..operators.fanout` — the window kernel got
    its parallelism for free from the window exchange; here the DOC
    rows round-robin (text moves once, ~gram_count/n_chars the bytes
    of the gram exchange) only when the scan has fewer splits than the
    session's parallelism."""
    from . import fanout

    d = fanout(d)

    def compute(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids: list = []
            fps: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                out = _winnow_fps_py(text, k, w)
                if len(out):
                    ids.append(np.full(len(out), doc_id, dtype=np.int64))
                    fps.append(out)
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids),
                        "fingerprint": np.concatenate(fps),
                    }
                )

    return d.mapInPandas(compute, "doc_id long, fingerprint long")


def winnow_near_dup_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_common: int = 3,
    max_fp_freq: int | None = 1000,
) -> DataFrame:
    """(id_a, id_b, n_common): document pairs sharing ≥ ``min_common``
    winnowing fingerprints — MOSS-style local-alignment near-dup
    detection. Catches partial overlap (a shared boilerplate block, a
    long quotation, one doc embedded in another) that whole-document
    Jaccard misses because the unshared remainder drowns the ratio.

    Same scale shape as the shingle inverted index: fingerprints are
    the (already winnowed, ~2/(w+1) density) index rows, the self-join
    meets only docs sharing a fingerprint, and ``max_fp_freq`` drops
    degenerate fingerprints that every template page carries (a
    fingerprint in f docs contributes f² join work but no alignment
    signal once f is large — identical reasoning, and identical
    default, to ``max_shingle_freq`` in the Jaccard family)."""
    fps = winnow_fingerprints(docs, text_col=text_col, id_col=id_col, k=k, w=w)
    if max_fp_freq is not None:
        counts = fps.groupBy("fingerprint").agg(F.count("*").alias("__f"))
        fps = (
            fps.join(counts, "fingerprint")
            .filter(F.col("__f") <= max_fp_freq)
            .drop("__f")
        )
    a = fps.withColumnRenamed("doc_id", "id_a")
    b = fps.withColumnRenamed("doc_id", "id_b")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def dedup_audit(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    sample_mod: int = 20,
) -> DataFrame:
    """One-row audit of the MinHash-LSH dedup against exact Jaccard on a
    deterministic hash-sample: (sample_docs, truth_pairs, lsh_pairs,
    recall, precision). The operational QA a 100 TB dedup run needs —
    exact all-pairs verification of the full corpus is off the table, but
    on a ~(1/sample_mod) hash-sample the exact inverted-index pass is
    affordable and the sampled recall estimates the production recall
    (banding probabilities don't depend on corpus size; the sample sees
    the same per-pair collision process).

    The sample is ``md5(id) % sample_mod == 0`` — reproducible, and both
    systems see the SAME sample so the comparison is paired. Precision
    should be 1.0 by construction (LSH candidates are exact-Jaccard
    verified); recall < 1 quantifies band-miss losses at the configured
    threshold. Cost: sample-sized index joins, corpus-sized only in the
    one sampling projection."""
    sample = docs.filter(
        md5_long(F.col(id_col).cast("string")) % int(sample_mod) == 0
    ).persist()
    truth = ngram_jaccard_pairs(
        sample, text_col=text_col, id_col=id_col, threshold=threshold
    ).select("id_a", "id_b")
    lsh = minhash_lsh_pairs(
        sample, text_col=text_col, id_col=id_col, threshold=threshold
    ).select("id_a", "id_b")
    n_sample = sample.count()
    n_truth = truth.count()
    n_lsh = lsh.count()
    n_common = truth.join(lsh, ["id_a", "id_b"], "left_semi").count()
    sample.unpersist()
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (
                n_sample,
                n_truth,
                n_lsh,
                round(n_common / n_truth, 4) if n_truth else 1.0,
                round(n_common / n_lsh, 4) if n_lsh else 1.0,
            )
        ],
        "sample_docs long, truth_pairs long, lsh_pairs long, "
        "recall double, precision double",
    )


def duplicated_substring_stats(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """(doc_id, n_dup_tokens, n_dup_spans, dedup_text): exact duplicated-
    substring removal at token granularity (the ExactSubstr pass of Lee
    et al., "Deduplicating Training Data Makes Language Models Better",
    ACL 2022 — re-expressed on k-gram hashes instead of a suffix array,
    the standard distributed approximation).

    Semantics: a token k-gram whose hash occurs at ≥2 positions anywhere
    in the corpus (across documents OR repeated within one) is
    *duplicated*; every token position covered by at least one duplicated
    k-gram occurrence is removed. ``dedup_text`` is the surviving tokens
    re-joined in order, ``n_dup_tokens`` the removed-position count, and
    ``n_dup_spans`` the number of maximal removed runs. Documents shorter
    than ``k`` tokens have no k-grams and survive whole; NULL text is
    empty text (the tokens()-family contract).

    Plan — three bounded shuffles, then one array-side projection:

    1. gram rows (doc_id, pos, h): position-explode + ``slice``/
       ``concat_ws``/md5 as column functions (the measured-fast shape
       from the shingle/bigram family — a ``transform``-built gram array
       evaluates interpreted per element).
    2. groupBy h → the ≥2-occurrence dup-hash set (map-side partial agg
       on a 60-bit key; most grams in a natural corpus are unique, so
       the post-filter set is small relative to the index).
    3. join gram rows to dup hashes (shuffle on h), then groupBy doc_id
       → the per-doc sorted dup-start array.
    4. left-join the start arrays onto the token projection (doc_id
       keyed) and compute EVERYTHING array-side from merged intervals:
       each start covers [s, s+k-1]; a start opens a maximal span iff
       the previous start is > k behind it (``zip_with`` against the
       shifted array), so span bounds, covered-token count, and the
       kept text (``flatten`` of the complement-gap ``slice``s,
       re-joined) all derive in O(|starts| + spans) per document with
       NO token explode, NO window, and NO final groupBy — the prior
       shape (position-explode + a k-wide ``array_contains`` OR-chain +
       collect_list reassembly) paid O(n·k·|starts|) comparisons plus a
       corpus-sized aggregate. A/B at sf0.1 (dup-dense synthetic vocab,
       median of 5 warm runs): 2.0 s → 1.64 s operator-only, one fewer
       exchange; the asymptotic gap widens with dup density, and the
       sparse-corpus 1M-doc probe is unchanged.

    At 100 TB the dup-set shuffle (2) is the cost center and is exactly
    the shingle-index shuffle every other dedup family already pays; the
    interval pass adds one doc_id-keyed join and zero further exchanges.
    Skew note: a boilerplate k-gram shared by millions of documents makes
    its hash a hot key in the join (3) — both sides hash-partition on h,
    so the hot key's gram rows converge on one reducer. The session
    enables AQE (skewedJoin splits the oversized partition and replicates
    the single dup-set row), which is the correct mitigation here because
    the dup side of a hot key is exactly ONE row — unlike the pair-join
    dedup families there is no quadratic blow-up to cap, so no
    ``max_shingle_freq`` analogue is needed for correctness or memory."""
    d = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    )
    grams = (
        d.filter(F.size("toks") >= k)
        .select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(1), F.size("toks") - (k - 1))).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            md5_long(F.concat_ws(" ", F.slice(F.col("toks"), F.col("pos"), k))).alias(
                "h"
            ),
        )
    )
    dup = grams.groupBy("h").agg(F.count("*").alias("__c")).filter(
        F.col("__c") >= 2
    ).select("h")
    starts = (
        grams.join(dup, "h")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("pos")).alias("__starts"))
    )
    # merged covered intervals [s, e] from the sorted starts: a start s
    # OPENS a maximal span iff prev start < s - k (prev's interval ends
    # before s-1); it CLOSES one iff next start > s + k. zip_with against
    # the shifted arrays keeps the whole derivation O(|starts|).
    opens = (
        "filter(zip_with(__starts, "
        # sentinel -(k+1): positions are >= 1, so the first start always
        # opens (1 - (-(k+1)) = k+2 > k) and ANSI arithmetic can't overflow
        f"concat(array({-(k + 1)}), "
        "slice(__starts, 1, greatest(size(__starts) - 1, 0))), "
        f"(s, p) -> CASE WHEN s - p > {k} THEN s END), x -> x IS NOT NULL)"
    )
    closes = (
        "filter(zip_with(__starts, "
        "concat(CASE WHEN size(__starts) > 1 THEN slice(__starts, 2, size(__starts) - 1) "
        "ELSE CAST(array() AS array<int>) END, array(2147483647)), "
        f"(s, nx) -> CASE WHEN nx - s > {k} THEN s + {k} - 1 END), "
        "x -> x IS NOT NULL)"
    )
    return (
        d.join(starts, "doc_id", "left")
        .withColumn(
            "__starts",
            F.coalesce(F.col("__starts"), F.expr("CAST(array() AS array<int>)")),
        )
        .withColumn("__opens", F.expr(opens))
        .withColumn("__closes", F.expr(closes))
        .select(
            "doc_id",
            F.expr(
                "aggregate(zip_with(__opens, __closes, (a, b) -> b - a + 1), "
                "0L, (acc, x) -> acc + x)"
            ).alias("n_dup_tokens"),
            F.size("__opens").cast("long").alias("n_dup_spans"),
            F.expr(
                "array_join(flatten(zip_with("
                "concat(array(1), transform(__closes, e -> e + 1)), "
                "concat(transform(__opens, s -> s - 1), array(size(toks))), "
                "(a, b) -> slice(toks, a, greatest(b - a + 1, 0)))), ' ')"
            ).alias("dedup_text"),
        )
    )


def boilerplate_line_removal(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 30,
    sep: str = "\n",
) -> DataFrame:
    """Line-level boilerplate removal (RefinedWeb §"line-wise corrections",
    Penedo 2023; CCNet dedups the same way at paragraph granularity —
    pass ``sep="\\n\\n"``): a line whose TRIMMED form appears in at least
    ``min_doc_freq`` distinct documents is navigation/footer boilerplate,
    not content, and is excised from every document; the survivors are
    reassembled in original order. Returns
    ``(id_col, text_clean, n_kept, n_removed)`` — one row per input
    document (a fully-boilerplate document comes back with
    ``text_clean = ''``, it is not dropped).

    Scale shape (100 TB): three shuffles, all on bounded-width keys —
    (1) the doc-frequency aggregate, keyed on the 16-byte md5 of the
    trimmed line (never the raw line bytes) with a map-side-combined
    two-phase count-distinct; (2) the lines ⋈ boilerplate-set left join
    on the same 16-byte key — the boilerplate side has exactly one row
    per key, so AQE's skew-split handles the hot keys (a banner line in
    10⁹ docs is precisely the skewed key this join always has) without
    salting; (3) the doc-keyed reassembly groupBy. The per-doc line
    order travels as a posexplode index and is restored with
    array_sort over (pos, line) structs — no window, no single-partition
    stage. When ``min_doc_freq`` is high the boilerplate set is small
    and AQE demotes join (2) to a broadcast on its own; at web scale
    with low thresholds it stays a shuffle join, which is the correct
    plan. Exact-count df is intentional (it is the dedup signal); an
    approx_count_distinct variant would save one exchange phase but
    break the oracle and the removal guarantee.
    """
    import re as _re

    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _re.escape(sep))
        ).alias("pos", "ln"),
    ).withColumn("k", F.md5(F.trim(F.col("ln"))))
    boiler = (
        lines.filter(F.trim(F.col("ln")) != "")
        .groupBy("k")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= int(min_doc_freq))
        .select("k", F.lit(True).alias("_rm"))
    )
    marked = lines.join(boiler, "k", "left")
    return marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_rm").isNull(), F.struct("pos", "ln"))
                    )
                ),
                lambda x: x["ln"],
            ),
            sep,
        ).alias("text_clean"),
        F.count(F.when(F.col("_rm").isNull(), 1)).alias("n_kept"),
        F.count(F.when(F.col("_rm").isNotNull(), 1)).alias("n_removed"),
    )
