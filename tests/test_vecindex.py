"""Stored streaming vector index (operators/vecindex.py): generational
IVF layout lifecycle — bootstrap init, replay-safe segment appends,
partition-pruned exact-cosine probes, Lloyd-reclustering compaction,
orphan GC — plus its CurationIngest integration."""

import os
import random

import pytest

from pyspark.sql import functions as F

from adsb_clickhouse_spark.operators import vecindex as V


def _vec(seed, dim=8):
    r = random.Random(seed)
    return [r.uniform(-1.0, 1.0) for _ in range(dim)]


def _batch(spark, ids, seed_of, dim=8):
    return spark.createDataFrame(
        [(i, _vec(seed_of(i), dim=dim)) for i in ids],
        "vec_id long, embedding array<double>",
    )


def test_lifecycle_append_probe_compact_parity(spark, tmp_path):
    path = str(tmp_path / "vidx")
    info = V.init_vector_index(spark, path, dim=8, n_lists=4)
    assert not info["existed"]
    assert V.init_vector_index(spark, path, dim=8, n_lists=4)["existed"]
    V.append_vector_index(_batch(spark, range(50), lambda i: i), path, "b0")
    V.append_vector_index(
        _batch(spark, range(100, 150), lambda i: 1000 + i), path, "b1"
    )
    q = spark.createDataFrame(
        [(0, [x * 1.01 for x in _vec(7)])], "vec_id long, embedding array<double>"
    )
    # nprobe = all lists -> the probe is EXACT: planted near-copy wins
    res = V.knn_probe_stored(spark, path, q, k=3, nprobe=4).collect()
    assert res[0]["neighbor_id"] == 7 and res[0]["cos_sim"] == 1.0
    stats = V.compact_vector_index(spark, path)
    assert stats["folded_segments"] == 2
    # full-nprobe probes are invariant under compaction (same corpus,
    # same exact scoring — only the list partitioning moved)
    res2 = V.knn_probe_stored(spark, path, q, k=3, nprobe=4).collect()
    assert [(r["neighbor_id"], r["cos_sim"]) for r in res2] == [
        (r["neighbor_id"], r["cos_sim"]) for r in res
    ]
    # folded segments retired (reader grace window, r14): invisible to
    # the live-segment listing at once, physically GC'd once aged
    from adsb_clickhouse_spark.plans import genstore as G

    assert V._live_segments(path) == []
    G.sweep_retired(path, grace_s=0.0)
    assert not os.listdir(os.path.join(path, "segments"))
    assert len([e for e in os.listdir(path) if e.startswith("gen-")]) == 1


def test_replayed_segment_converges(spark, tmp_path):
    path = str(tmp_path / "vidx")
    V.init_vector_index(spark, path, dim=8, n_lists=4)
    b = _batch(spark, range(30), lambda i: i)
    V.append_vector_index(b, path, "b0")
    V.append_vector_index(b, path, "b0")  # redelivery: name-keyed overwrite
    q = spark.createDataFrame(
        [(999, _vec(11))], "vec_id long, embedding array<double>"
    )
    rows = V.knn_probe_stored(spark, path, q, k=30, nprobe=4).collect()
    ids = [r["neighbor_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 30  # no duplicate candidates


def test_probe_prunes_partitions(spark, tmp_path):
    """The list_id isin filter reaches the COMPACTED generation's scan
    as a PartitionFilter — probe cost is nprobe/n_lists of the corpus.
    Uncompacted segments are FLAT (batch-sized; directory pruning buys
    nothing there — r13 floor cut), so the same isin reaches their scan
    as a parquet PushedFilter on the sorted list_id column instead."""
    path = str(tmp_path / "vidx")
    V.init_vector_index(spark, path, dim=8, n_lists=8)
    V.append_vector_index(_batch(spark, range(200), lambda i: i), path, "b0")
    q = spark.createDataFrame(
        [(0, _vec(3))], "vec_id long, embedding array<double>"
    )
    # flat segment: the filter is pushed to the parquet scan
    df = V.knn_probe_stored(spark, path, q, k=3, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "list_id" in plan.split("PushedFilters")[1][:300]
    # compacted generation: the filter prunes whole list_id= directories
    V.compact_vector_index(spark, path)
    df2 = V.knn_probe_stored(spark, path, q, k=3, nprobe=2)
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan2
    assert "list_id" in plan2.split("PartitionFilters")[1][:300]


def test_compaction_relearns_quantizer_narrow_probe(spark, tmp_path):
    """Bootstrap seed centroids can't balance clustered data; after
    compaction the re-learned quantizer puts a planted cluster in one
    list, so a NARROW probe still finds a cluster mate."""
    path = str(tmp_path / "vidx")
    V.init_vector_index(spark, path, dim=8, n_lists=4)
    base = _vec(99)
    rows = [
        (i, [x + random.Random(i).uniform(-0.01, 0.01) for x in base])
        for i in range(20)
    ] + [(100 + i, _vec(500 + i)) for i in range(60)]
    V.append_vector_index(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        path,
        "b0",
    )
    V.compact_vector_index(spark, path, iters=4)
    q = spark.createDataFrame(
        [(0, [x * 1.005 for x in base])], "vec_id long, embedding array<double>"
    )
    res = V.knn_probe_stored(spark, path, q, k=3, nprobe=1).collect()
    assert res and res[0]["neighbor_id"] < 20  # a cluster mate, via 1 list


def test_orphan_generation_gc_and_failure_modes(spark, tmp_path):
    path = str(tmp_path / "vidx")
    V.init_vector_index(spark, path, dim=8, n_lists=4)
    V.append_vector_index(_batch(spark, range(10), lambda i: i), path, "b0")
    # a compaction that died before its pointer swap: fully-written but
    # unreferenced generation dir
    orphan = os.path.join(path, "gen-deadbeef")
    os.makedirs(orphan, exist_ok=True)
    V.compact_vector_index(spark, path)
    assert not os.path.isdir(orphan)
    # dangling pointer fails loudly at probe time
    with open(os.path.join(path, "_GEN"), "w") as fh:
        fh.write("gen-missing")
    q = spark.createDataFrame([(0, _vec(1))], "vec_id long, embedding array<double>")
    with pytest.raises(Exception):
        V.knn_probe_stored(spark, path, q, k=1).collect()
    # no index at all
    with pytest.raises(RuntimeError, match="no vector index"):
        V.append_vector_index(
            _batch(spark, range(2), lambda i: i), str(tmp_path / "nope"), "b0"
        )


def test_empty_index_and_zero_norm_query(spark, tmp_path):
    path = str(tmp_path / "vidx")
    V.init_vector_index(spark, path, dim=4, n_lists=2)
    q = spark.createDataFrame(
        [(0, [0.1, 0.2, 0.3, 0.4]), (1, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    assert V.knn_probe_stored(spark, path, q, k=3).count() == 0
    V.append_vector_index(
        spark.createDataFrame(
            [(i, _vec(i, dim=4)) for i in range(5)],
            "vec_id long, embedding array<double>",
        ),
        path,
        "b0",
    )
    got = V.knn_probe_stored(spark, path, q.filter("vec_id = 1"), k=3).count()
    assert got == 0  # zero-norm query excluded by the cosine contract


def test_curation_ingest_vector_index(spark, tmp_path):
    """The funnel's survivors become kNN-searchable; a dropped exact dup
    is NOT indexed; a replayed batch converges."""
    from adsb_clickhouse_spark.streaming.curation import CurationIngest

    ing = CurationIngest(str(tmp_path), run_id="r1", vector_index=True,
                         vector_n_lists=2)
    texts = [
        "alpha document about rivers and stone bridges in the valley",
        "alpha document about rivers and stone bridges in the valley",
        "gamma notes on compilers register allocation and loop unrolling",
    ]
    rows = [(i, texts[i], _vec(40 + (0 if i < 2 else 1))) for i in range(3)]
    batch = spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<double>"
    )
    ing.process_batch(batch, batch_id=0)
    ing.process_batch(batch, batch_id=0)  # foreachBatch redelivery
    q = spark.createDataFrame(
        [(9, [x * 1.01 for x in _vec(40)])], "vec_id long, embedding array<double>"
    )
    got = ing.knn(spark, q, k=5, nprobe=2).collect()
    ids = [r["neighbor_id"] for r in got]
    assert 0 in ids and 2 in ids  # survivors indexed
    assert 1 not in ids  # exact-dup loser never reached the index
    assert len(ids) == len(set(ids)) == 2
    assert ing.compact_vector_index(spark)["folded_segments"] == 1
    assert [r["neighbor_id"] for r in ing.knn(spark, q, k=5, nprobe=2).collect()] == ids

def test_empty_batch_append_is_noop_not_poison_pill(spark, tmp_path):
    """A batch whose vectors are all filtered out (NULL/zero-norm/empty)
    writes zero parquet files; the append must return n_vectors=0 rather
    than crash on the schema-less read-back — otherwise the exception
    fires before the streaming caller's commit marker and the batch is a
    deterministic replay poison pill."""
    path = str(tmp_path / "vidx")
    V.init_vector_index(spark, path, dim=4, n_lists=2)
    zero = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = V.append_vector_index(zero, path, "b0")
    assert out["n_vectors"] == 0
    # replay of the same empty segment converges too
    assert V.append_vector_index(zero, path, "b0")["n_vectors"] == 0
    empty = zero.filter("vec_id < 0")
    assert V.append_vector_index(empty, path, "b1")["n_vectors"] == 0
    # index stays probeable, real appends still work, compaction folds
    V.append_vector_index(_batch(spark, range(5), lambda i: i, dim=4), path, "b2")
    q = spark.createDataFrame([(9, _vec(2, dim=4))], "vec_id long, embedding array<double>")
    assert V.knn_probe_stored(spark, path, q, k=5, nprobe=2).count() == 5
    V.compact_vector_index(spark, path)
    assert V.knn_probe_stored(spark, path, q, k=5, nprobe=2).count() == 5


def test_stale_generation_segment_fully_probeable(spark, tmp_path):
    """A segment whose recorded generation differs from the probe-time
    generation (an append that raced a compaction snapshot) was assigned
    list_ids under the OLD centroids — pruning it would make its vectors
    permanently un-probeable. The probe must scan it in full: with
    nprobe=1 every indexed vector must still be reachable."""
    path = str(tmp_path / "vidx")
    V.init_vector_index(spark, path, dim=8, n_lists=8)
    V.append_vector_index(_batch(spark, range(40), lambda i: i), path, "b0")
    seg_dir = os.path.join(path, "segments", "b0")
    assert V._segment_gen(seg_dir) is not None
    # simulate the race: the pointer moved to a generation other than
    # the one that assigned this segment
    V._write_segment_gen(seg_dir, "gen-before-compaction")
    q = spark.createDataFrame([(999, _vec(3))], "vec_id long, embedding array<double>")
    rows = V.knn_probe_stored(spark, path, q, k=40, nprobe=1).collect()
    assert len(rows) == 40  # all 40, despite nprobe=1: no pruning on stale list_ids
    # a missing marker (crash between vectors write and marker) is
    # treated the same way
    os.remove(os.path.join(seg_dir, V._SEGMENT_GEN_MARKER))
    assert V.knn_probe_stored(spark, path, q, k=40, nprobe=1).count() == 40
    # the next compaction re-assigns under the new quantizer and the
    # narrow probe stays exact-complete via fresh list_ids
    V.compact_vector_index(spark, path)
    assert V.knn_probe_stored(spark, path, q, k=40, nprobe=8).count() == 40


def test_compaction_skips_uncommitted_segments(spark, tmp_path):
    """compact_vector_index under the caller's commit-marker predicate
    (the compact_fingerprints discipline): a segment the predicate
    rejects — an append whose job-commit may still be in flight — is
    neither folded nor deleted, stays probeable against the new
    generation, and folds once its marker lands (r10 advice)."""
    path = str(tmp_path / "vidx")
    V.init_vector_index(spark, path, dim=8, n_lists=4)
    V.append_vector_index(_batch(spark, range(20), lambda i: i), path, "b0")
    V.append_vector_index(
        _batch(spark, range(100, 120), lambda i: 1000 + i), path, "b1"
    )
    stats = V.compact_vector_index(spark, path, committed=lambda s: s == "b0")
    assert stats["folded_segments"] == 1
    assert stats["skipped_uncommitted"] == 1
    # the uncommitted segment's directory is untouched
    assert os.path.isdir(os.path.join(path, "segments", "b1"))
    # and its vectors are still reachable (stale-gen full scan path)
    q = spark.createDataFrame(
        [(0, [x * 1.01 for x in _vec(1105)])],
        "vec_id long, embedding array<double>",
    )
    res = V.knn_probe_stored(spark, path, q, k=1, nprobe=4).collect()
    assert res[0]["neighbor_id"] == 105 and res[0]["cos_sim"] == 1.0
    # nothing committed -> a no-op fold, not an empty new generation
    gen_before = V._gen_name(path)
    noop = V.compact_vector_index(spark, path, committed=lambda s: False)
    assert noop["folded_segments"] == 0 and noop["skipped_uncommitted"] == 1
    assert V._gen_name(path) == gen_before
    # marker lands -> the next fold takes it
    stats2 = V.compact_vector_index(spark, path, committed=lambda s: True)
    assert stats2["folded_segments"] == 1 and stats2["skipped_uncommitted"] == 0
    from adsb_clickhouse_spark.plans import genstore as G

    assert V._live_segments(path) == []
    G.sweep_retired(path, grace_s=0.0)
    assert not os.listdir(os.path.join(path, "segments"))
    assert V.knn_probe_stored(spark, path, q, k=1, nprobe=4).collect()[0][
        "neighbor_id"
    ] == 105


def test_append_centroid_cache_invalidated_by_compaction(spark, tmp_path):
    """The caller-owned centroid cache is generation-keyed: a
    compaction between appends swaps the generation, so the next append
    must re-read the NEW centroids (assigning under stale ones would
    mis-bucket the segment against the new quantizer's pruning)."""
    path = str(tmp_path / "vidx")
    V.init_vector_index(spark, path, dim=8, n_lists=4)
    cache: dict = {}
    V.append_vector_index(
        _batch(spark, range(30), lambda i: i), path, "b0",
        centroid_cache=cache,
    )
    gen0 = cache["gen"]
    assert gen0 is not None and "cent" in cache
    V.compact_vector_index(spark, path)
    V.append_vector_index(
        _batch(spark, range(30, 60), lambda i: i), path, "b1",
        centroid_cache=cache,
    )
    assert cache["gen"] != gen0  # re-read under the new generation
    q = spark.createDataFrame(
        [(999, _vec(45))], "vec_id long, embedding array<double>"
    )
    ids = {
        r["neighbor_id"]
        for r in V.knn_probe_stored(spark, path, q, k=60, nprobe=4).collect()
    }
    assert set(range(60)) <= ids  # both parts fully probeable
