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

    ``events.ts`` is written as parquet TIMESTAMP(NANOS) which Spark's
    vectorized reader rejects; read it as long nanos (legacy conf, safe to
    set at runtime) and floor to microseconds — exactly what DuckDB's
    micro-precision TIMESTAMP does, so oracle comparisons stay exact.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
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
        "multimodal",
    ):
        importlib.import_module(f"{__name__}.{mod}")
