"""Streaming curation ingest (streaming/curation.py): cross-batch exact
dedup memory, replay idempotence, policy filters, and a readStream
smoke through the file-source twin."""

import pytest

from pyspark.sql import functions as F

from adsb_clickhouse_spark.streaming.curation import CurationIngest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_within_and_cross_batch_exact_dedup(spark, tmp_path):
    ing = CurationIngest(str(tmp_path), run_id="r1")
    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = "completely different content about spark query engines and shuffle plans"
    c = "a third document that only ever appears in the second batch of the feed"
    # batch 0: a, its in-batch dup, and b
    ing.process_batch(_docs(spark, [(0, a), (1, a), (2, b)]), batch_id=0)
    kept0 = {r["doc_id"] for r in ing.curated(spark).select("doc_id").collect()}
    assert kept0 == {0, 2}  # in-batch dup keeps the lowest id
    # batch 1: a again (cross-batch dup) plus new c
    ing.process_batch(_docs(spark, [(3, a), (4, c)]), batch_id=1)
    kept1 = {r["doc_id"] for r in ing.curated(spark).select("doc_id").collect()}
    assert kept1 == {0, 2, 4}  # 3 suppressed by the fingerprint store


def test_replayed_batch_is_idempotent(spark, tmp_path):
    ing = CurationIngest(str(tmp_path), run_id="r1")
    a = "some document text that is long enough to pass every default filter"
    b = "another document body with its own words and no duplication at all"
    ing.process_batch(_docs(spark, [(0, a)]), batch_id=0)
    ing.process_batch(_docs(spark, [(1, b)]), batch_id=1)
    # replay batch 1 (foreachBatch redelivery after a crash)
    ing.process_batch(_docs(spark, [(1, b)]), batch_id=1)
    rows = ing.curated(spark).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1]
    # the fingerprint store converged too: one fingerprint per kept doc
    fps = ing.read_fingerprints(spark)
    assert fps.count() == 2


def test_policy_filters_and_redaction(spark, tmp_path):
    ing = CurationIngest(str(tmp_path), min_quality=0.1, drop_pii_docs=True, run_id="r1")
    good = "the quick brown fox jumps over the lazy dog and keeps on running far"
    pii = "contact me at someone@example.com for all of the details of the plan"
    ing.process_batch(_docs(spark, [(0, good), (1, pii), (2, None)]), batch_id=0)
    out = ing.curated(spark)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept == {0}  # PII doc dropped by policy; NULL text scores 0
    # kept rows carry the redacted text column
    assert out.filter(F.col("clean_text").contains("@")).count() == 0


def test_streaming_smoke_file_source(spark, tmp_path):
    """End-to-end readStream → foreachBatch: two file drops, second
    re-sends an already-kept text; the curated table sees it once."""
    import json
    import os
    import time

    src = tmp_path / "in"
    src.mkdir()
    a = "streaming document alpha with enough words to be its own fingerprint"
    b = "streaming document beta carrying an entirely different body of text"
    with open(src / "drop1.json", "w") as f:
        f.write(json.dumps({"doc_id": 0, "text": a}) + "\n")

    ing = CurationIngest(str(tmp_path / "out"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = ing.start(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        with open(src / "drop2.json", "w") as f:
            f.write(json.dumps({"doc_id": 1, "text": a}) + "\n")
            f.write(json.dumps({"doc_id": 2, "text": b}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    kept = sorted(
        r["doc_id"] for r in ing.curated(spark).select("doc_id").collect()
    )
    assert kept == [0, 2]


def test_streaming_split_assignment_matches_batch_operator(spark, tmp_path):
    """With assign_splits=True every curated row carries a split that
    EQUALS the batch operator's exact-mode assignment for the same text
    — across different batches (the split is a pure function of the
    fingerprint, so streaming needs no state to stay consistent)."""
    from adsb_clickhouse_spark.operators.curation import dedup_aware_split
    from adsb_clickhouse_spark.streaming.curation import CurationIngest

    ing = CurationIngest(str(tmp_path / "cur"), assign_splits=True)
    rows1 = [(i, f"batch one document number {i} with words") for i in range(30)]
    rows2 = [(100 + i, f"batch two document number {i} and tail") for i in range(30)]
    ing.process_batch(
        spark.createDataFrame(rows1, "doc_id long, text string"), batch_id=0
    )
    ing.process_batch(
        spark.createDataFrame(rows2, "doc_id long, text string"), batch_id=1
    )
    out = ing.curated(spark)
    got = {r["doc_id"]: (r["split_bucket"], r["split"]) for r in out.collect()}
    assert len(got) == 60
    # batch-operator assignment over the SAME clean texts must agree
    ref_in = out.select("doc_id", F.col("clean_text").alias("text"))
    ref = {
        r["doc_id"]: (r["split_bucket"], r["split"])
        for r in dedup_aware_split(ref_in).collect()
    }
    assert got == ref
