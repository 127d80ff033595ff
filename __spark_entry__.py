"""Driver contract for the spark-graft builder (PySpark target).

Thin views over :mod:`adsb_clickhouse_spark.queries.REGISTRY` — every
operator from SURVEY.md §2 (plus the training-data pipeline extensions)
is registered there with its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from adsb_clickhouse_spark import queries as _q

_q.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    "current positions" dashboard semantic (latest row per key within the
    freshness window — SURVEY.md §3.2) on the events table."""
    return _q.REGISTRY["adsb_latest_view_freshness"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in _q.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in _q.REGISTRY.items() if spec.oracle is not None
    }
