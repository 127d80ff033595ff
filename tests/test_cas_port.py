"""The CAS StoreIO port end-to-end (r13 verdict item 1): a FULL
streaming-curation ingest + curate-maintain cycle — every store
lifecycle job — running with its commit metadata on conditional-put
primitives only.

Two guarantees proven here, beyond the per-method contract suite in
tests/test_storeio.py:

1. **No POSIX escape hatch**: ``os.rename``/``os.replace``/``os.link``
   are POISONED process-wide for any path under the store root for the
   duration of the cycle. Any engine code path that bypassed the seam
   (or any LocalStoreIO fallback that slipped through resolution)
   would blow up instead of silently relying on an atomic rename the
   target namespace doesn't have. Spark's JVM-side parquet I/O is
   untouched — that is the data plane, which a real deployment keeps
   on the object store via Hadoop's S3A layer.

2. **The catalog is the commit authority**: after the cycle, the
   pointer/marker/manifest records live in the CAS backend, not on
   disk — the on-disk tree holds only Spark-written payload.
"""

from __future__ import annotations

import os

import pytest

from adsb_clickhouse_spark.plans.storeio import (
    CASStoreIO,
    MemCASBackend,
    register_prefix,
    unregister_prefix,
)


@pytest.fixture()
def cas_base(tmp_path, monkeypatch):
    """A store root whose commit metadata resolves to a CAS StoreIO,
    with the POSIX atomic primitives poisoned under it."""
    base = str(tmp_path / "store")
    backend = MemCASBackend()
    register_prefix(base, CASStoreIO(backend))

    def _poison(fn, name):
        def wrapper(src, dst, *a, **k):
            if str(src).startswith(base) or str(dst).startswith(base):
                raise AssertionError(
                    f"POSIX {name}() on CAS-managed path: {src} -> {dst}"
                )
            return fn(src, dst, *a, **k)

        return wrapper

    monkeypatch.setattr(os, "rename", _poison(os.rename, "rename"))
    monkeypatch.setattr(os, "replace", _poison(os.replace, "replace"))
    monkeypatch.setattr(os, "link", _poison(os.link, "link"))
    yield base, backend
    unregister_prefix(base)


def _media_payloads():
    # four payloads: A/B/C distinct, Bp a near-copy of B (one byte off)
    A = bytes(range(64))
    B = bytes((x * 7) % 251 for x in range(64))
    Bp = bytes([B[0] ^ 1]) + B[1:]
    C = bytes((x * 13 + 5) % 251 for x in range(64))
    return A, B, Bp, C


def test_cas_port_full_curate_maintain_cycle(spark, cas_base):
    """register_prefix(<root>, CASStoreIO) + one all-stores ingest +
    the curate-maintain CLI (which takes the maintenance lease) + a
    post-maintenance batch probing every compacted store — the same
    cycle test_curate_maintain_cli_full_cycle runs on POSIX, with
    rename/replace/link impossible."""
    from adsb_clickhouse_spark.__main__ import main
    from adsb_clickhouse_spark.streaming.curation import CurationIngest

    base, backend = cas_base
    A, B, Bp, C = _media_payloads()
    ing = CurationIngest(
        base, run_id="r1",
        media_dedup=True, media_near_dedup=True, text_near_dedup=True,
        text_index=True, vector_index=True, vector_n_lists=2,
        host_col="host", host_links_col="out_links",
        host_trust_seeds=["seed"],
    )
    emb = [0.1, 0.2, 0.3, 0.4]
    rows = [
        (0, "rivers and stone bridges drawn over many winters", B,
         "seed", ["good1"], emb),
        (1, "register allocation and careful loop unrolling notes", C,
         "good1", [], [x * 2 for x in emb]),
        (2, "buy cheap pills now amazing deal click here", A,
         "spamA", ["spamB"], None),
    ]
    batch = spark.createDataFrame(
        rows,
        "doc_id long, text string, payload binary, host string, "
        "out_links array<string>, embedding array<double>",
    )
    ing.process_batch(batch, batch_id=0)
    rc = main([
        "curate-maintain", base,
        "--near-dedup", "--compact-index", "--compact-vectors",
        "--compact-bands", "--recompute-host-ranks",
        "--media-max-band-freq", "1000", "--text-max-band-freq", "1000",
        "--host-trust-seeds", "seed", "--assume-quiesced",
    ])
    assert rc == 0
    try:
        # every store answers from its COMPACTED generation
        assert ing.search(spark, "rivers bridges", k=3).count() >= 1
        q = spark.createDataFrame(
            [(9, [x * 1.01 for x in emb])],
            "vec_id long, embedding array<double>",
        )
        assert ing.knn(spark, q, k=2, nprobe=2).count() >= 1
        ing.process_batch(
            spark.createDataFrame(
                [(10, "perturbed resend of the winter artwork", Bp,
                  "good1", [], None),
                 (11, "post maintenance doc from the spam ring", C,
                  "spamB", ["spamA"], None)],
                "doc_id long, text string, payload binary, host string, "
                "out_links array<string>, embedding array<double>",
            ),
            batch_id=1,
        )
        kept = {
            r["doc_id"] for r in ing.curated(spark).select("doc_id").collect()
        }
        # 10: near-copy of kept media -> band store drops it
        # 11: spam-ring host (trustrank 0 in the stored generation) + its
        # media collides with doc 1's payload
        assert 10 not in kept and 11 not in kept
        assert {0, 1, 2} <= kept

        # the commit authority is the CATALOG: pointers/markers/laws are
        # backend entries, not files — the disk tree is payload-only
        keys = backend.list_prefix("p:")
        assert any(k.endswith("/_GEN") for k in keys), keys[:10]
        assert any("/_commits" in k for k in keys)
        assert not os.path.exists(os.path.join(base, "text_index", "_GEN"))
        assert not os.path.exists(
            os.path.join(base, "vector_index", "_GEN")
        )
    finally:
        for tbl in (ing._store_table_name(), ing._band_table_name(),
                    ing._text_band_table_name()):
            if tbl:
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_cas_port_replay_idempotence(spark, cas_base):
    """A foreachBatch re-delivery (the crash-replay contract) converges
    on the CAS namespace exactly as on POSIX: one copy of the batch,
    ledger counts stable."""
    from adsb_clickhouse_spark.streaming.curation import CurationIngest

    base, _backend = cas_base
    ing = CurationIngest(base, run_id="r1")
    a = "the quick brown fox jumps over the lazy dog " * 4
    b = "entirely different content about compilers and registers " * 4
    batch = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id long, text string"
    )
    ing.process_batch(batch, batch_id=0)
    n1 = ing.curated(spark).count()
    ing.process_batch(batch, batch_id=0)  # re-delivery
    assert ing.curated(spark).count() == n1
    # exact dup in a later batch is suppressed by the CAS-backed store
    ing.process_batch(
        spark.createDataFrame([(2, a)], "doc_id long, text string"),
        batch_id=1,
    )
    kept = {r["doc_id"] for r in ing.curated(spark).select("doc_id").collect()}
    assert kept == {0, 1}


def test_cas_cycle_moves_zero_payload_bytes_through_driver(
    spark, cas_base, monkeypatch
):
    """r14 verdict items 2+5: with the publish seam (in-place staging
    under a pending marker, commit = one marker delete) and the
    backend's server-side ``copy_object``, NO payload bytes cross the
    driver during ingest or maintenance — ``_copy_payloads`` (the
    driver-side GET+PUT tree copy) must be unreachable from the whole
    cycle."""
    from adsb_clickhouse_spark.plans.storeio import CASStoreIO
    from adsb_clickhouse_spark.streaming.curation import CurationIngest

    base, _backend = cas_base

    def forbidden(self, src, dst):
        raise AssertionError(
            f"driver-side payload copy on the per-batch path: {src} -> {dst}"
        )

    monkeypatch.setattr(CASStoreIO, "_copy_payloads", forbidden)
    ing = CurationIngest(
        base, run_id="r1", text_near_dedup=True,
        text_index=True, vector_index=True, vector_n_lists=2,
        embed_dim=8,
    )
    mk = lambda lo, n: spark.createDataFrame(  # noqa: E731
        [(j, f"doc {j} " + " ".join(f"w{j}x{w}" for w in range(10)))
         for j in range(lo, lo + n)],
        "doc_id long, text string",
    )
    ing.process_batch(mk(0, 30), batch_id=0)
    ing.process_batch(mk(30, 30), batch_id=1)
    with ing.maintenance_lease(timeout_s=30.0) as lease:
        ing.compact_fingerprints(spark, lease=lease)
        ing.compact_text_bands(spark, assume_quiesced=True, lease=lease)
        ing.compact_text_index(spark, lease=lease)
        ing.compact_vector_index(spark, assume_quiesced=True, lease=lease)
        ing.compact_curated(spark, assume_quiesced=True, lease=lease)
    # another batch after maintenance still appends copy-free
    ing.process_batch(mk(60, 10), batch_id=2)
    assert ing.curated(spark).count() == 70
    assert ing.search(spark, "doc w5x3", k=3).count() >= 1
    for tbl in (ing._store_table_name(), ing._text_band_table_name()):
        if tbl:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
