"""Distributed BPE merge learning + subword segmentation.

Byte-pair-encoding vocabulary learning (Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016 —
public paper): iteratively merge the most frequent adjacent symbol
pair. The tokenizer-training step of the LLM data pipeline, completing
the story next to ``vocab_coverage`` (which plans a WORD vocabulary)
and the BPE-ish pre-token counts in ``text_token_stats``.

The published algorithm's actual scale shape, preserved here: BPE
iterations operate on the WORD-FREQUENCY table, not the corpus —

1. ONE corpus-sized pass: tokenize + groupBy(word) count. This is the
   only shuffle whose size tracks the corpus (and it is the same
   token-count aggregation ``vocab_coverage`` pays).
2. Every merge iteration runs on the DISTINCT-WORD table (bounded by
   vocabulary size — millions of rows when the corpus is billions):
   explode adjacent symbol pairs weighted by word frequency, one
   map-side-combined groupBy(pair) sum, and a deterministic argmax
   (max count, ties to the lexicographically smallest pair) — a
   one-row driver collect per iteration, the same bounded-driver
   contract as the IVF k-means reduce.
3. Applying the winning merge rewrites the symbol-array column with a
   left-fold (``F.aggregate``): greedy leftmost-first pairing, exactly
   the reference implementation's semantics. The word table is
   ``localCheckpoint``-ed periodically so M iterations don't stack M
   plans deep.

``bpe_segment`` applies a learned merge list to a corpus WITHOUT
per-row merge loops: segment the distinct-word table once (vocab-sized
work), then broadcast-join the word→pieces map back onto the token
stream — at 100 TB the corpus-side cost is the tokenize projection plus
one broadcast hash join, no Python and no per-document iteration.

Not SQL-expressible as one query (iterative argmax), so this family is
pytest-verified against a pure-Python reference implementation
(tests/test_bpe.py) rather than DuckDB-oracled — the documented carve-
out for iterative algorithms. No reference-repo equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texttools import tokens

# end-of-word sentinel (Sennrich's </w>): distinguishes "low" the word
# from "low" the prefix of "lower"; [^a-z0-9] so it can't collide with
# a real token character
EOW = "_"
_CHECKPOINT_EVERY = 8

# bpe_learn collects the (word, freq) table to the driver below this
# vocabulary size and learns the merges in pure Python — identical
# output (same greedy argmax + tie-break; parity pinned in
# tests/test_bpe.py), zero per-merge Spark jobs. Mirrors
# dedup.connected_components' driver_threshold pattern.
DRIVER_VOCAB_THRESHOLD = 100_000


def _symbols_py(word: str) -> tuple[str, ...]:
    """Pure-Python twin of :func:`_symbols_col` (same EOW law)."""
    chars = list(word)
    if not chars:
        return (EOW,)
    chars[-1] = chars[-1] + EOW
    return tuple(chars)


def _apply_merge_py(
    syms: tuple[str, ...], a: str, b: str
) -> tuple[str, ...]:
    """Pure-Python twin of :func:`_apply_merge` — the same greedy
    leftmost non-re-merging scan."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return tuple(out)


def bpe_learn_py(
    word_freqs: dict[str, int],
    *,
    n_merges: int,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn BPE merges from a word-frequency dict in pure Python —
    the bounded-vocabulary twin of the distributed loop in
    :func:`bpe_learn`: identical pair counting (per distinct word ×
    freq), identical argmax (count desc, pair asc), identical stop
    conditions."""
    vocab = [(_symbols_py(w), int(f)) for w, f in word_freqs.items()]
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_freq:
            break
        merges.append((a, b))
        vocab = [(_apply_merge_py(s, a, b), f) for s, f in vocab]
    return merges


def word_counts(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(word, freq): the one corpus-sized aggregation. Map-side partial
    agg collapses each task to its distinct words; the shuffle carries
    vocabulary-sized data."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _symbols_col(word_col) -> "F.Column":
    """Initial symbol array: characters, with EOW appended to the last."""
    chars = F.split(word_col, "")
    n = F.size(chars)
    return F.concat(
        F.slice(chars, 1, F.greatest(n - 1, F.lit(0))),
        F.array(F.concat(F.element_at(chars, -1), F.lit(EOW))),
    )


def _apply_merge(sym_col, a: str, b: str) -> "F.Column":
    """Greedy leftmost merge of adjacent (a, b) in one left fold —
    identical to the reference implementation's scan: if the previous
    kept symbol is ``a`` and the current is ``b``, replace the pair with
    ``a+b``; a merged symbol never re-merges within the same pass."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        sym_col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(la, lb))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn(
    docs: DataFrame,
    *,
    n_merges: int = 100,
    text_col: str = "text",
    min_pair_freq: int = 2,
    driver_vocab_threshold: int = DRIVER_VOCAB_THRESHOLD,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules over a corpus. Returns the
    ordered merge list [(a, b), ...]; stops early when no pair reaches
    ``min_pair_freq``. Determinism: argmax by (count desc, pair asc) —
    two runs over the same corpus give identical vocabularies.

    Driver-side state is one (pair, count) row per iteration plus the
    merge list — never corpus- or vocab-sized... except on the
    size-adaptive fast path: at or below ``driver_vocab_threshold``
    distinct words the (word, freq) table — already materialized for
    the size check — is collected and the merges learned by
    :func:`bpe_learn_py`, identical output for 2 Spark jobs instead of
    2 + ~2·n_merges. The corpus-sized tokenize+count pass is paid
    either way; only the vocab-sized iteration moves to the driver."""
    wc = word_counts(docs, text_col=text_col).localCheckpoint(eager=True)
    n_vocab = wc.count()
    if n_vocab <= int(driver_vocab_threshold):
        word_freqs = {r["word"]: r["freq"] for r in wc.collect()}
        return bpe_learn_py(
            word_freqs, n_merges=n_merges, min_pair_freq=min_pair_freq
        )
    vocab = wc.select(_symbols_col(F.col("word")).alias("syms"), "freq")
    # iteration partitioning tracks VOCAB size, not corpus size: a 100 TB
    # corpus with a 10M-word vocabulary wants ~50 partitions per merge
    # job, and the local small-vocab case collapses to 1 instead of
    # paying 32 near-empty tasks × n_merges of scheduling overhead
    parts = max(1, min(1024, n_vocab // 200_000 + 1))
    merges: list[tuple[str, str]] = []
    cur = vocab.coalesce(parts)
    for i in range(int(n_merges)):
        pairs = (
            cur.filter(F.size("syms") >= 2)
            .select(
                F.explode(F.sequence(F.lit(1), F.size("syms") - 1)).alias("p"),
                "syms",
                "freq",
            )
            .select(
                F.element_at("syms", F.col("p")).alias("a"),
                F.element_at("syms", F.col("p") + 1).alias("b"),
                "freq",
            )
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("c"))
        )
        top = pairs.orderBy(F.desc("c"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top or top[0]["c"] < min_pair_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        nxt = cur.select(_apply_merge(F.col("syms"), a, b).alias("syms"), "freq")
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            nxt = nxt.localCheckpoint(eager=True)
        cur = nxt
    return merges


def segment_words(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(word, pieces): apply an ordered merge list to a distinct-word
    table. Vocab-sized work: the merge chain is one column expression
    per rule (interpreted past codegen depth — fine on a bounded
    table), applied once per distinct word, never per occurrence."""
    syms = _symbols_col(F.col("word"))
    for a, b in merges:
        syms = _apply_merge(syms, a, b)
    return words.select("word", syms.alias("pieces"))


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_words, n_pieces, pieces): subword segmentation of a
    corpus under a learned merge list. Corpus-side plan: tokenize
    projection → broadcast hash join against the vocab-sized
    word→pieces map → one doc-keyed aggregation; the merge rules
    themselves are only ever applied to distinct words."""
    wc = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .distinct()
    )
    mapping = segment_words(wc, merges)
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "word"),
    )
    return (
        tok.join(F.broadcast(mapping), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.size("pieces")).alias("n_pieces"),
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("pieces")))
                    ),
                    lambda s: s.pieces,
                )
            ).alias("pieces"),
        )
    )
