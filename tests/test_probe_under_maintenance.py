"""Probes DURING maintenance (r13 verdict item 4): reader threads
hammer ``bm25_probe_stored`` + ``knn_probe_stored`` continuously while
the maintenance jobs fold generations underneath them — zero failed
probes, and every result consistent with either the pre- or post-fold
generation.

The thing under test is the reader grace window added this round
(plans/genstore.py::sweep_retired): a probe that resolved the OLD
generation pointer just before a fold's atomic swap used to race the
fold's immediate ``rmtree`` of that generation and its folded
segments — a torn-read window the old soak (which only probed BETWEEN
folds) never crossed. With retire-manifest GC, the superseded files
outlive the swap by ``GEN_GC_GRACE_S``, so the mid-scan probe finishes
against intact files while new probes resolve the new generation.
"""

from __future__ import annotations

import os
import threading
import time

import pytest

from adsb_clickhouse_spark.streaming.curation import CurationIngest

# r14 verdict item 4: wall-clock budgets (lease timeouts, join
# deadlines, the post-fold reader window) scale with SOAK_SLACK on
# contended boxes; correctness asserts (zero errors, consistent probe
# results) are never slackened.
SLACK = max(1.0, float(os.environ.get("SOAK_SLACK", "1")))


@pytest.fixture()
def store(spark, tmp_path):
    ing = CurationIngest(
        str(tmp_path),
        run_id="soak",
        text_index=True,
        vector_index=True,
        vector_n_lists=2,
        embed_dim=8,
    )
    yield ing


def _batch(spark, lo: int, n: int):
    from pyspark.sql import functions as F

    words = F.concat_ws(
        " ",
        F.lit("rivers bridges stone"),
        *[
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f"|w{j}")))
            for j in range(8)
        ],
    )
    return spark.range(lo, lo + n).select(
        F.col("id").alias("doc_id"), words.alias("text")
    )


def test_probes_survive_concurrent_folds(spark, store, tmp_path):
    ing = store
    ing.process_batch(_batch(spark, 0, 40), batch_id=0)

    errors: list[BaseException] = []
    probe_counts: list[int] = []
    stop = threading.Event()

    def reader() -> None:
        # the query terms exist in EVERY doc, so any consistent
        # generation view must return k results
        q = spark.createDataFrame(
            [(999, [0.3] * 8)], "vec_id long, embedding array<double>"
        )
        while not stop.is_set():
            try:
                n1 = ing.search(spark, "rivers bridges", k=3).count()
                n2 = ing.knn(spark, q, k=3, nprobe=2).count()
                probe_counts.append(n1 + n2)
                if n1 < 3 or n2 < 3:
                    errors.append(
                        AssertionError(f"short probe: bm25={n1} knn={n2}")
                    )
            except BaseException as exc:  # noqa: BLE001 — the soak records everything
                errors.append(exc)
                return

    threads = [threading.Thread(target=reader) for _ in range(2)]
    [t.start() for t in threads]
    try:
        # three maintenance rounds, each folding a fresh append while
        # the readers are mid-flight
        for round_no in range(1, 4):
            ing.process_batch(_batch(spark, round_no * 40, 40), batch_id=round_no)
            with ing.maintenance_lease(timeout_s=30.0 * SLACK) as lease:
                r1 = ing.compact_text_index(spark, lease=lease)
                r2 = ing.compact_vector_index(
                    spark, assume_quiesced=True, lease=lease
                )
            assert r1["folded_segments"] >= 1
            assert r2["folded_segments"] >= 1
        # let the readers cross the final post-fold state too —
        # DEADLINE-based, not a fixed sleep (r14 item 4): wait until
        # the reader threads have recorded enough iterations to prove
        # they ran against multiple store states, bounded by a
        # slack-scaled deadline instead of assuming probe speed
        deadline = time.monotonic() + 60.0 * SLACK
        while len(probe_counts) < 6 and time.monotonic() < deadline:
            if errors:
                break
            time.sleep(0.2)
    finally:
        stop.set()
        [t.join(timeout=120 * SLACK) for t in threads]

    assert not errors, errors[:3]
    # the readers actually ran against multiple store states
    assert len(probe_counts) >= 6


def test_batches_during_keyed_store_compaction(spark, tmp_path):
    """The OTHER concurrency the lambda split promises: micro-batches
    keep flowing while the keyed stores (fingerprints, band stores)
    compact underneath them. The committed-marker discipline keeps the
    folds off in-flight segments; the r14 retire-in-grace path keeps
    the folds' deletes off segments a concurrent batch's store probe
    resolved. Assertions: zero errors on either side, and exact-dup
    suppression is airtight across the whole interleaving."""
    import threading

    import hashlib

    ing = CurationIngest(str(tmp_path), run_id="soak2", text_near_dedup=True)

    def text(j: int) -> str:
        # pairwise-distinct word soup: unique under BOTH the exact
        # fingerprint and the shingle bands (a shared template would
        # make every doc a legitimate near-dup of doc 0)
        return " ".join(
            hashlib.md5(f"{j}|{w}".encode()).hexdigest() for w in range(12)
        )

    # batch i admits one fresh doc and re-sends EVERY prior doc as an
    # exact dup — any store torn-read during compaction that loses a
    # fingerprint re-admits a dup and the final count gives it away
    def batch(i: int):
        rows = [(j, text(j)) for j in range(i + 1)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    errors: list[BaseException] = []
    done = threading.Event()

    def maintainer() -> None:
        try:
            while not done.is_set():
                with ing.maintenance_lease(timeout_s=60.0 * SLACK) as lease:
                    ing.compact_fingerprints(spark, lease=lease)
                    ing.compact_text_bands(
                        spark, assume_quiesced=False, lease=lease
                    )
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    t = threading.Thread(target=maintainer)
    t.start()
    try:
        for i in range(8):
            ing.process_batch(batch(i), batch_id=i)
    except BaseException as exc:  # noqa: BLE001
        errors.append(exc)
    finally:
        done.set()
        t.join(timeout=300 * SLACK)
    try:
        assert not errors, errors[:3]
        kept = sorted(
            r["doc_id"]
            for r in ing.curated(spark).select("doc_id").collect()
        )
        # every doc admitted exactly once, no dup ever re-admitted
        assert kept == list(range(8)), kept
    finally:
        for tbl in (ing._store_table_name(), ing._text_band_table_name()):
            if tbl:
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_retirees_swept_only_after_grace(spark, store, tmp_path, monkeypatch):
    """The other half of the contract: retirees DO get deleted once the
    grace expires — the store does not grow one superseded generation
    per fold forever."""
    import os

    from adsb_clickhouse_spark.plans import genstore as G

    ing = store
    ing.process_batch(_batch(spark, 0, 20), batch_id=0)
    with ing.maintenance_lease(timeout_s=10.0) as lease:
        ing.compact_text_index(spark, lease=lease)
    gens = [
        e for e in os.listdir(ing.index_path) if e.startswith("gen-")
    ]
    assert len(gens) == 2  # bootstrap gen retired-in-grace + new gen
    # grace elapsed: the next fold's sweep removes the superseded one
    monkeypatch.setattr(G, "GEN_GC_GRACE_S", 0.0)
    ing.process_batch(_batch(spark, 20, 20), batch_id=1)
    with ing.maintenance_lease(timeout_s=10.0) as lease:
        ing.compact_text_index(spark, lease=lease)
    gens = [
        e for e in os.listdir(ing.index_path) if e.startswith("gen-")
    ]
    assert len(gens) == 1  # all retirees swept, only the pointed one
    # and the store still answers
    assert ing.search(spark, "rivers bridges", k=3).count() == 3
