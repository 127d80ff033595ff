"""Streaming document curation: the batch curation funnel
(operators/curation.py) run as a micro-batch ingest with CROSS-BATCH
exact dedup against an accumulated fingerprint store.

A batch curate_documents() call can only dedup within what it sees; a
training-data ingest keeps receiving the same boilerplate forever, so
the streaming form must remember every fingerprint it has ever kept.
Per micro-batch:

    scrub → policy filter (quality / language / PII) → within-batch
    exact dedup (keep lowest doc_id per fingerprint) → anti-join the
    fingerprint STORE (docs seen in any earlier batch) → append
    survivors to the curated table + their fingerprints to the store

Delivery semantics follow the MV cascade (streaming/pipeline.py): both
appends are batch-keyed ``batch_id=`` segment writes, and a replayed
batch first removes its own leftover segments — so a crash anywhere in
the body (including between the two appends) converges to exactly one
copy of the batch in BOTH tables. The store read excludes nothing: by
deleting this batch's leftovers before reading, a replay can never be
suppressed by its own crashed attempt's fingerprints.

Scale shape: the anti-join shuffles on the 16-byte fingerprint — the
store side is the accumulated KEPT set (post-dedup, so it grows with
unique content, not ingest volume), and at cluster scale the store is
bucketed on fingerprint so the per-batch join co-locates without
re-shuffling the store. The whole body is projections + one groupBy +
one anti-join; no Python on the hot path. Near-dedup (MinHash) stays a
periodic BATCH compaction over the curated table — banding against an
unbounded historical corpus per micro-batch would couple batch latency
to corpus size, which is the wrong half of the lambda split.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.curation import langid_signals, quality_signals
from ..operators.scrub import pii_scrub
from .pipeline import _checkpoint_run_id


def _clear_segment(path: str, seg: str) -> None:
    for leftover in glob.glob(os.path.join(path, f"batch_id={seg}")):
        shutil.rmtree(leftover, ignore_errors=True)


class CurationIngest:
    """Micro-batch curation funnel with a persistent dedup memory."""

    def __init__(
        self,
        base_dir: str,
        *,
        min_quality: float = 0.0,
        keep_langs: tuple[str, ...] | None = None,
        drop_pii_docs: bool = False,
        run_id: str | None = None,
        assign_splits: bool = False,
    ):
        self.curated_path = os.path.join(base_dir, "curated")
        self.fps_path = os.path.join(base_dir, "fingerprints")
        self.min_quality = min_quality
        self.keep_langs = keep_langs
        self.drop_pii_docs = drop_pii_docs
        self.run_id = run_id
        self.assign_splits = assign_splits

    def _seg(self, batch_id: int | None) -> str:
        if batch_id is None:
            return f"adhoc-{uuid.uuid4().hex[:12]}"
        return f"b{self.run_id}-{batch_id}" if self.run_id else f"b{batch_id}"

    # -- the funnel body (used by both batch and streaming) ---------------

    def process_batch(self, docs: DataFrame, batch_id: int | None = None) -> None:
        spark = docs.sparkSession
        seg = self._seg(batch_id)
        # replay safety FIRST: a crashed attempt's fingerprints must not
        # suppress this replay's own rows at the anti-join below
        _clear_segment(self.curated_path, seg)
        _clear_segment(self.fps_path, seg)

        scrubbed = pii_scrub(docs).withColumnRenamed("id", "doc_id")
        scored = (
            scrubbed.join(quality_signals(docs), "doc_id")
            .join(langid_signals(docs, lang_col=None), "doc_id")
        )
        cond = F.col("quality_score") >= self.min_quality
        if self.keep_langs is not None:
            cond = cond & F.col("predicted_lang").isin(list(self.keep_langs))
        if self.drop_pii_docs:
            cond = cond & ~F.col("has_pii")
        filtered = scored.filter(cond).withColumn(
            "fingerprint", F.md5(F.coalesce(F.col("clean_text"), F.lit("")))
        )
        # within-batch exact dedup: lowest doc_id represents each text
        # (semi-join on the (fingerprint, min doc_id) pairs — map-side
        # partial agg, and the same fingerprint shuffle the store
        # anti-join below reuses)
        batch_unique = filtered.join(
            filtered.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id")),
            ["fingerprint", "doc_id"],
            "left_semi",
        )
        # cross-batch: drop anything an earlier batch already kept
        store = self.read_fingerprints(spark)
        fresh = (
            batch_unique.join(store, "fingerprint", "left_anti")
            if store is not None
            else batch_unique
        )
        if self.assign_splits:
            # split = salted hash of the exact fingerprint — a pure
            # per-row function, so the assignment is identical to the
            # batch operator's exact mode AND stable across batches
            # (the same text always lands in the same split, no state)
            from ..functions.texttools import md5_long
            from ..operators.curation import SPLIT_SALT

            bucket = (
                md5_long(F.concat(F.lit(f"{SPLIT_SALT}|"), F.col("fingerprint")))
                % 10
            ).cast("int")
            fresh = fresh.withColumn("split_bucket", bucket).withColumn(
                "split",
                F.when(bucket < 8, "train")
                .when(bucket < 9, "val")
                .otherwise("test"),
            )
        fresh = fresh.persist()
        try:
            (
                fresh.withColumn("batch_id", F.lit(seg))
                .write.mode("append")
                .partitionBy("batch_id")
                .parquet(self.curated_path)
            )
            (
                fresh.select("fingerprint")
                .withColumn("batch_id", F.lit(seg))
                .write.mode("append")
                .partitionBy("batch_id")
                .parquet(self.fps_path)
            )
        finally:
            fresh.unpersist()

    # -- streaming entry --------------------------------------------------

    def start(self, doc_stream: DataFrame, checkpoint_dir: str) -> StreamingQuery:
        """Attach the funnel to an unbounded document stream; batch ids
        are scoped by the checkpoint's run id exactly like the MV
        cascade (streaming/pipeline.py module doc)."""
        self.run_id = _checkpoint_run_id(checkpoint_dir)
        return (
            doc_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    # -- query surface ----------------------------------------------------

    def curated(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.curated_path)

    def read_fingerprints(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.exists(self.fps_path):
            return None
        try:
            return spark.read.parquet(self.fps_path).select("fingerprint")
        except Exception:
            return None
