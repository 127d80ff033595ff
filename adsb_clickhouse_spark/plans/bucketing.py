"""Bucketed tables for co-located (shuffle-free) joins.

At 100 TB, a repeated big-big join (e.g. positions ⋈ per-aircraft
enrichment both keyed on icao24) should not shuffle either side every
query. Writing both sides bucketed by the join key — the Spark analogue
of co-located MergeTree sharding — lets SortMergeJoin read matching
buckets directly: zero Exchange in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a bucketed managed table (requires a session catalog;
    works with the default in-memory catalog + local warehouse dir)."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner") -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
