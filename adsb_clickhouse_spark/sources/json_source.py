"""Newline-JSON sources — batch and streaming — with broken-message
tolerance.

The reference consumes topics as ``JSONEachRow`` with
``kafka_skip_broken_messages`` (manifests/adsb-clickhouse/
30-clickhouse-local.yaml.example:46-47): malformed lines are skipped, not
fatal. Spark equivalent: explicit raw schema + DROPMALFORMED mode (ST5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import SourceConfig
from ..schemas import raw_schema


def read_json_lines(spark: SparkSession, path: str, cfg: SourceConfig) -> DataFrame:
    """Batch read of newline-JSON with explicit schema; malformed lines are
    dropped (DROPMALFORMED == kafka_skip_broken_messages)."""
    return spark.read.schema(raw_schema(cfg)).option("mode", "DROPMALFORMED").json(path)


def stream_json_lines(spark: SparkSession, path: str, cfg: SourceConfig, *, max_files_per_trigger: int = 10) -> DataFrame:
    """File-based streaming source with the same contract — used for tests
    and as the non-Kafka deployment mode (drop JSON files into a dir)."""
    return (
        spark.readStream.schema(raw_schema(cfg))
        .option("mode", "DROPMALFORMED")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def parse_kafka_value(raw: DataFrame, cfg: SourceConfig) -> DataFrame:
    """Decode a Kafka `value` column of JSON bytes into the raw schema —
    the JSONEachRow step. Unparseable payloads yield a null struct and are
    filtered (kafka_skip_broken_messages semantics)."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), raw_schema(cfg)).alias("j")
    )
    return parsed.filter(F.col("j").isNotNull()).select("j.*")
