"""Relational/dataflow operators (SURVEY.md §2) plus the large-scale
training-data pipeline operators (dedup, similarity, text, multimodal)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout(df: DataFrame) -> DataFrame:
    """Round-robin a (small) doc frame up to the session's parallelism
    before a per-row Arrow kernel. A small corpus often scans as ONE
    split (a single parquet file under maxPartitionBytes), which would
    serialize the whole kernel on one Python worker — exchange-based
    shapes get their parallelism for free from their shuffle. At scale
    the scan already has more splits than cores and this is a no-op,
    so no shuffle is ever ADDED by the kernel path (r15, guide §2.6)."""
    par = int(
        df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions",
            str(df.sparkSession.sparkContext.defaultParallelism),
        )
    )
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
