"""Multimodal-plumbing query: documents' text bytes stand in for media
payloads; the mapInPandas decode stage (Arrow binary batches) is verified
end-to-end against byte arithmetic the oracle reproduces in SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import FakeBackend, decode_media
from . import load_table, register


@register(
    "mm_decode_metadata",
    """
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           (ascii(substr(text, 1, 1)) * 7) % 512 AS width,
           (octet_length(encode(text)) * 13) % 512 AS height
    FROM documents
    ORDER BY media_id
    """,
    doc=(
        "Binary media column → mapInPandas decode (Arrow-batched, "
        "backend-pluggable; deterministic FakeBackend here, Pillow on a "
        "real cluster image). Oracle reproduces the fake decode in SQL, "
        "validating schema/batch plumbing end-to-end."
    ),
)
def mm_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
    )
    return decode_media(media, FakeBackend()).orderBy("media_id")
