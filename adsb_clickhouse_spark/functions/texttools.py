"""Text primitives for the training-data pipeline operators — tokenize,
shingle, cross-engine-stable hashing. All JVM builtins (no Python UDFs):
these run inside WholeStageCodegen at parquet-scan speed, which is what
makes the dedup/text operators viable at 100 TB.

Hashing: we need a hash that the DuckDB oracle can reproduce exactly, so
xxhash64/murmur (engine-specific seeds) are out. We use the first 15 hex
digits of md5 as a 60-bit integer:

    Spark : conv(substring(md5(s), 1, 15), 16, 10) :: long
    DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

md5 is bytewise-identical everywhere; 15 hex digits keep it inside int64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def tokens(text: Column) -> Column:
    """Lowercased alnum tokens; RE2-compatible pattern so Spark (Java
    regex) and DuckDB (RE2) agree. NULL text tokenizes as empty text —
    without the coalesce a NULL doc's shingle rows would diverge
    between the engines (Spark xxhash64(NULL) is a non-null seed hash;
    DuckDB's fallback is '') and silently cross-pair with empty docs on
    one side only."""
    return F.regexp_extract_all(F.lower(F.coalesce(text, F.lit(""))), F.lit(TOKEN_RE), 0)


def md5_long(s: Column) -> Column:
    """60-bit integer hash, reproducible in DuckDB (see module doc)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def salted_md5_long(s: Column, salt: int) -> Column:
    return md5_long(F.concat(F.lit(f"{salt}|"), s))


# DuckDB twins of the helpers above, for composing oracle SQL strings.

def duck_tokens(expr: str) -> str:
    """NULL-coalescing twin of :func:`tokens`."""
    return f"regexp_extract_all(lower(coalesce({expr}, '')), '{TOKEN_RE}')"


def duck_md5_long(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def duck_salted_md5_long(expr: str, salt: int) -> str:
    return duck_md5_long(f"'{salt}|' || {expr}")


def duck_word_shingles(toks_expr: str, w: int = 3) -> str:
    """DuckDB list slicing is 1-based inclusive: toks[i : i+w-1] is w items.

    The short-doc fallback coalesces to '' because DuckDB's
    ``array_to_string([])`` is NULL where Spark's ``array_join`` yields
    '' — without it a zero-token doc's whole-doc shingle hashes to NULL
    and silently drops out of every dedup join (found by the
    adversarial-corpus parity suite, tests/test_text_edge_parity.py)."""
    return (
        f"list_distinct(CASE WHEN len({toks_expr}) >= {w} THEN "
        f"list_transform(range(1, len({toks_expr}) - {w} + 2), "
        f"i -> array_to_string({toks_expr}[i : i + {w - 1}], ' ')) "
        f"ELSE [coalesce(array_to_string({toks_expr}, ' '), '')] END)"
    )


def duck_word_ngrams(toks_expr: str, w: int = 2) -> str:
    """Non-distinct twin of :func:`word_ngrams` (empty list when < w tokens)."""
    return (
        f"CASE WHEN len({toks_expr}) >= {w} THEN "
        f"list_transform(range(1, len({toks_expr}) - {w} + 2), "
        f"i -> array_to_string({toks_expr}[i : i + {w - 1}], ' ')) "
        f"ELSE []::VARCHAR[] END"
    )
