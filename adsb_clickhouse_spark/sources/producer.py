"""Row → JSON producer sink (SURVEY.md §2.1 S6).

The reference publishes scraper rows to Kafka as JSON with acks=1
(adsb-scraper/scraper.py:95-162). Spark equivalent:
``to_json(struct(*))`` — used for the Kafka writer when the connector
jar is present, and for JSON-lines drop directories otherwise (the
mode the tests and single-node deployments use)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_json_rows(df: DataFrame) -> DataFrame:
    """Serialize every row to a single JSON `value` column."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def write_json_dir(df: DataFrame, path: str) -> None:
    """JSON-lines drop-directory sink (the non-Kafka transport)."""
    df.write.mode("append").json(path)


def write_kafka(df: DataFrame, *, bootstrap_servers: str, topic: str) -> None:
    """Kafka producer sink; requires the spark-sql-kafka connector."""
    (
        to_json_rows(df)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )
