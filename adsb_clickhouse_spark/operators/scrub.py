"""PII detection + redaction for training-data curation.

Before a web corpus reaches a training run, emails / phone numbers /
IPs / SSN-shaped identifiers get counted (corpus health metrics) and
masked (the scrub pass). Both operators are pure whole-stage-codegen
column pipelines — one projection over the corpus, no UDF, no shuffle —
so they compose with the quality/langid/dedup passes at any scale.

Pattern dialect note: every regex here avoids ``\\s``, ``\\b``, ``\\d``
shorthands and backtracking-dependent constructs, staying on the
subset where Java regex (Spark) and RE2 (DuckDB/Go tooling) agree —
the same discipline as functions/texttools.TOKEN_RE, so a future
DuckDB oracle twin stays exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: redaction applies top to bottom, so more specific patterns
# (email contains host-like runs; ssn is digit-grouped like phones)
# must fire before the general ones
#
# explicit contract on phone shapes: separator-delimited groups,
# parenthesized US area codes, and ``+cc (0)`` international forms ARE
# matched; bare contiguous 10-digit runs (``5551234567``) are NOT —
# without word boundaries (outside this dialect subset) that shape
# false-positives on order ids / timestamps / numeric keys, which in a
# curation pipeline silently corrupts non-PII documents.
_IPV4_OCTET = r"(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    # ipv4 before phone: a dotted IP (4 dotted groups) would otherwise be
    # eaten by the dotted-phone shape; a dotted phone (3 groups) can
    # never match the ipv4 pattern, so this order resolves the overlap.
    # Octets are range-guarded (0-255, zero-padding allowed): an
    # out-of-range quad like `999.999.999.999` is NOT counted as ipv4 —
    # it falls through to the dotted-phone shape and is redacted there
    # (over-redaction of a nonsense string is the safe direction for a
    # scrub pass; the guard's job is correct categorization).
    "ipv4": rf"{_IPV4_OCTET}\.{_IPV4_OCTET}\.{_IPV4_OCTET}\.{_IPV4_OCTET}",
    # alternatives ordered most-specific-first; Java regex and RE2 (as
    # DuckDB configures it) are both leftmost-first, so the order is
    # part of the contract
    "phone": (
        r"\+[0-9]{1,3} \(0\) ?[0-9]{2,4}[-. ][0-9]{3,4}([-. ][0-9]{3,4})?"
        r"|\([0-9]{3}\) ?[0-9]{3}[-. ][0-9]{4}"
        r"|\+?[0-9]{2,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{3,4})?"
    ),
}


def pii_counts(text: Column) -> list[Column]:
    """One ``n_<kind>`` count column per PII category — corpus health
    metrics (aggregate for docs-with-PII rates, filter for drop
    policies).

    Counts follow the same precedence as redaction: each pattern is
    counted on the text with every higher-precedence category already
    masked, so a span is attributed to exactly one category (a dotted
    IP counts as ipv4, never also as phone). Category tokens contain no
    digits or ``@``, so masking can't create new matches.

    NULL text counts as the empty document (all counts 0) — the same
    NULL-as-'' contract as the tokens()/exact-dedup family; otherwise
    regexp_extract_all(NULL) -> NULL would silently drop NULL-text
    docs from both ``filter(has_pii)`` and ``filter(~has_pii)``."""
    cols = []
    cur = F.coalesce(text, F.lit(""))
    for kind, pat in PII_PATTERNS.items():
        cols.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).alias(f"n_{kind}")
        )
        cur = F.regexp_replace(cur, pat, f"<{kind.upper()}>")
    return cols


def pii_redact(text: Column) -> Column:
    """Mask every PII span with its category token (``<EMAIL>`` etc.),
    applied in PII_PATTERNS order so specific shapes win over general
    ones. A chain of regexp_replace — single codegen projection.
    NULL text redacts to ``''`` (NULL-as-empty contract, see
    pii_counts)."""
    out = F.coalesce(text, F.lit(""))
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_scrub(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, <counts per category>, has_pii, clean_text): the curation
    pass — detect, flag, mask — as one projection over the corpus."""
    counts = pii_counts(F.col(text_col))
    flag = None
    for c in counts:
        term = c > 0
        flag = term if flag is None else flag | term
    return docs.select(
        F.col(id_col).alias("id"),
        *counts,
        flag.alias("has_pii"),
        pii_redact(F.col(text_col)).alias("clean_text"),
    )
