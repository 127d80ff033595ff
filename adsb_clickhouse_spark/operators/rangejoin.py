"""Bucketized interval (range) join: points ⋈ intervals without a
nested-loop plan.

Spark has no native range-join optimization: ``points JOIN intervals
ON p BETWEEN s AND e`` plans as BroadcastNestedLoopJoin (or a
cartesian product when neither side broadcasts) — O(|P|·|I|) pairs
evaluated, which at 100 TB is not a slow plan but an impossible one.
The standard fix (the bucketized/binned range join every warehouse
engine implements — e.g. Databricks' range-join hints, public docs)
re-expresses the θ-join as an EQUI-join on a derived bucket key:

- every interval is exploded to the ``floor(s/w) .. floor(e/w)``
  buckets it overlaps (one row per covered bucket);
- every point maps to its single bucket ``floor(p/w)``;
- the shuffle-hash/sort-merge equi-join on ``bucket`` then meets
  exactly the candidate pairs whose bucket ranges touch, and the
  residual ``BETWEEN`` predicate keeps the true matches.

Because a point lives in exactly ONE bucket, each qualifying (point,
interval) pair is produced exactly once — no post-join dedup.

Cost model, which the ``bucket_width`` parameter trades: interval-side
replication is ``1 + len/w`` rows per interval, candidate fan-in per
point is the intervals overlapping its bucket — wide buckets replicate
less but admit more false candidates; narrow buckets the reverse. The
default width is the AVERAGE interval length (one tiny agg over the
interval side), the textbook sweet spot: ~2 replicas per interval and
candidate lists that track true selectivity. Skewed buckets (a few
giant intervals) are AQE's skew-join case — the join is a plain
equi-join, so every Spark skew mitigation applies, unlike a nested
loop which has no shuffle to split.

Verified against a DuckDB BETWEEN join on fuzzed inputs
(tests/test_rangejoin.py — oracle-parity pytest; the driver registry
is at its 50-row cap) and plan-pinned to contain NO
BroadcastNestedLoopJoin / CartesianProduct.

No reference-repo equivalent; this is an engine extension like the
as-of join (queries/relational.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row with
    ``start <= point <= end`` (inclusive ends, the SQL BETWEEN law).
    Columns from both sides are preserved (names must not collide).
    ``how`` is 'inner' or 'left' (unmatched points keep NULL interval
    columns). All three key columns must be integral (cast timestamps
    to epoch micros first)."""
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports inner/left, got {how!r}")
    w = bucket_width
    if w is None:
        # default width = average interval length (tiny agg, one row)
        row = intervals.agg(
            F.avg(F.col(end_col) - F.col(start_col)).alias("avg_len")
        ).collect()[0]
        w = max(1, int(row["avg_len"] or 1))
    w = int(w)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w)
            )
        ),
    )
    pt = points.withColumn("__bucket", F.floor(F.col(point_col) / w))
    on = (
        (pt["__bucket"] == iv["__bucket"])
        & (pt[point_col] >= iv[start_col])
        & (pt[point_col] <= iv[end_col])
    )
    joined = pt.join(iv, on, how)
    return joined.drop(pt["__bucket"]).drop(iv["__bucket"])
