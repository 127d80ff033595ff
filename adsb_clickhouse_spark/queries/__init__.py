"""Query registry: every operator from SURVEY.md §2 (and the training-data
pipeline extensions) exposed as a named query over the driver's test tables,
each paired with a DuckDB-oracle SQL string where SQL-expressible.

``REGISTRY`` maps name → :class:`QuerySpec`. ``__spark_entry__.queries()``
and ``oracle_sql()`` are thin views over this registry.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None          # DuckDB SQL, None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which the pinned
    Spark (4.1.2) rejects outright unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set — with it, ``ts``
    arrives as long nanos and we floor-div to micros. The
    ``timestamp_ntz`` branch is forward-compat only: a future Spark that
    reads NANOS natively would surface TIMESTAMP_NTZ, and we cast it to
    session-TZ TIMESTAMP (pinned UTC in session.py, so the cast is a
    wall-clock no-op). If that branch ever activates, verify the reader
    FLOORS nanos to micros like DuckDB (a rounding reader would silently
    break sub-microsecond oracle parity) — see tests/test_cleanse.py.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all() -> None:
    """Import every query module so REGISTRY is fully populated."""
    for mod in (
        "relational",
        "relational2",
        "adsb",
        "dedup",
        "similarity",
        "text",
        "search",
        "multimodal",
    ):
        importlib.import_module(f"{__name__}.{mod}")
