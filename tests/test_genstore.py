"""The shared generational-store law (plans/genstore.py) tested ONCE:
pointer atomicity, transitive folded manifests, live-segment
resolution, and the law marker — the primitives every stored index
(text, vector, host ranks) and bucketed-table store (fingerprints,
band stores) is a thin configuration of. Pure filesystem tests, no
Spark session."""

import os

import pytest

from adsb_clickhouse_spark.plans import genstore as G


def test_pointer_bootstrap_swap_and_reread(tmp_path):
    path = str(tmp_path)
    assert G.gen_name(path) is None  # bootstrap: no pointer
    G.swap_pointer(path, "gen-aaaa")
    assert G.gen_name(path) == "gen-aaaa"
    G.swap_pointer(path, "gen-bbbb")
    assert G.gen_name(path) == "gen-bbbb"
    # no tmp litter left behind by the atomic replace
    assert [e for e in os.listdir(path) if e.startswith("_GEN.tmp")] == []
    # an empty pointer file reads as bootstrap, not as a '' generation
    with open(os.path.join(path, G.GEN_POINTER), "w") as fh:
        fh.write("")
    assert G.gen_name(path) is None


def test_folded_manifest_transitivity_and_live_segments(tmp_path):
    path = str(tmp_path)
    segs = os.path.join(path, "segments")
    for name in ("b0", "b1", "b2", "_marker_file"):
        os.makedirs(os.path.join(segs, name), exist_ok=True)
    # no generation yet: everything non-underscore is live
    assert G.live_segments(path) == ["b0", "b1", "b2"]
    # generation 1 folds b0
    g1 = os.path.join(path, "gen-1")
    os.makedirs(g1)
    G.write_manifest(g1, {"b0"})
    G.swap_pointer(path, "gen-1")
    assert G.live_segments(path) == ["b1", "b2"]
    # generation 2 folds b1 AND carries b0 forward (transitive) — even
    # though b0's directory delete "was interrupted" (still on disk),
    # it can never look live again
    g2 = os.path.join(path, "gen-2")
    os.makedirs(g2)
    G.write_manifest(g2, G.folded_set(path, "gen-1") | {"b1"})
    G.swap_pointer(path, "gen-2")
    assert G.folded_set(path, "gen-2") == {"b0", "b1"}
    assert G.live_segments(path) == ["b2"]
    # a generation with no manifest (or a missing gen) folds nothing
    assert G.folded_set(path, "gen-never-written") == set()
    assert G.folded_set(path, None) == set()


def test_snapshot_view_retries_across_concurrent_fold(tmp_path, monkeypatch):
    """A fold committing between the prober's pointer read and its
    segment listing must not hand back the pre-fold generation with
    the post-fold segment list (the folded rows would be in NEITHER
    part — the zero-result probe the probe-under-maintenance soak
    caught under load). snapshot_view re-reads the pointer after the
    listing and retries: simulate the worst interleave by swapping the
    pointer from inside the listing itself."""
    path = str(tmp_path)
    segs = os.path.join(path, "segments")
    for name in ("b0", "b1"):
        os.makedirs(os.path.join(segs, name), exist_ok=True)
    g1 = os.path.join(path, "gen-1")
    os.makedirs(g1)
    G.write_manifest(g1, set())
    G.swap_pointer(path, "gen-1")

    real_live = G.live_segments
    state = {"folds": 0}

    def racing_live(p, *, io=None, gen=G._UNSET):
        out = real_live(p, io=io, gen=gen)
        if state["folds"] == 0:  # the fold lands mid-read, exactly once
            g2 = os.path.join(path, "gen-2")
            os.makedirs(g2, exist_ok=True)
            G.write_manifest(g2, {"b0", "b1"})
            G.swap_pointer(path, "gen-2")
            state["folds"] = 1
        return out

    monkeypatch.setattr(G, "live_segments", racing_live)
    gen, live = G.snapshot_view(path)
    # the torn pair would have been ("gen-1", ["b0", "b1"]); the retry
    # must converge on the post-fold consistent view
    assert gen == "gen-2" and live == []
    # quiescent store: one pass, no retry, view matches the primitives
    monkeypatch.setattr(G, "live_segments", real_live)
    assert G.snapshot_view(path) == ("gen-2", [])


def test_enforce_law_records_then_guards(tmp_path):
    path = str(tmp_path / "store")
    G.enforce_law(path, "minhash|k=16|bands=4|w=3")  # first use: records
    G.enforce_law(path, "minhash|k=16|bands=4|w=3")  # same law: fine
    with pytest.raises(RuntimeError, match="written under law"):
        G.enforce_law(path, "minhash|k=32|bands=8|w=3")
    # the marker file holds exactly the recorded law, no tmp litter
    with open(os.path.join(path, G.LAW_MARKER)) as fh:
        assert fh.read() == "minhash|k=16|bands=4|w=3"
    assert [e for e in os.listdir(path) if ".tmp." in e] == []


def test_enforce_law_bootstrap_race_single_winner(tmp_path, monkeypatch):
    """Two concurrent first-users with DIFFERENT laws: exactly one law
    wins the bootstrap. Simulated by making the loser's initial marker
    read miss (as it would under a true race) while the winner's marker
    already exists — the exclusive os.link must then surface the
    winner's law and raise, where the old check-then-replace silently
    overwrote it."""
    import builtins

    path = str(tmp_path / "store")
    G.enforce_law(path, "minhash|k=32|bands=8|w=5")  # the winner

    mpath = os.path.join(path, G.LAW_MARKER)
    real_open = builtins.open
    state = {"missed": False}

    def racing_open(file, *a, **k):
        # the loser's first read finds no marker (race window), every
        # later open (including the re-read after the failed link) is real
        if not state["missed"] and file == mpath and not a and not k:
            state["missed"] = True
            raise OSError("simulated race: marker not yet visible")
        return real_open(file, *a, **k)

    monkeypatch.setattr(builtins, "open", racing_open)
    with pytest.raises(RuntimeError, match="minhash\\|k=32"):
        G.enforce_law(path, "minhash|k=16|bands=4|w=3")
    monkeypatch.undo()
    # the winner's law survived untouched, and no tmp litter remains
    with open(mpath) as fh:
        assert fh.read().strip() == "minhash|k=32|bands=8|w=5"
    assert [e for e in os.listdir(path) if ".tmp." in e] == []


def test_enforce_law_same_law_race_is_benign(tmp_path, monkeypatch):
    """Same race, same law on both sides: the loser re-reads the
    winner's identical marker and passes."""
    import builtins

    path = str(tmp_path / "store")
    law = "phash|bands=4"
    G.enforce_law(path, law)
    mpath = os.path.join(path, G.LAW_MARKER)
    real_open = builtins.open
    state = {"missed": False}

    def racing_open(file, *a, **k):
        if not state["missed"] and file == mpath and not a and not k:
            state["missed"] = True
            raise OSError("simulated race")
        return real_open(file, *a, **k)

    monkeypatch.setattr(builtins, "open", racing_open)
    G.enforce_law(path, law)  # must not raise


def test_fold_generation_stage_manifest_swap_gc(tmp_path):
    path = str(tmp_path)
    os.makedirs(os.path.join(path, "segments/seg-a"))
    os.makedirs(os.path.join(path, "segments/seg-b"))
    G.swap_pointer(path, "gen-old")
    os.makedirs(os.path.join(path, "gen-old"))
    # an orphan from a crashed prior fold
    os.makedirs(os.path.join(path, "gen-orphan"))
    G.gc_orphan_generations(path, "gen-old")
    assert not os.path.isdir(os.path.join(path, "gen-orphan"))

    built = {}

    def build(out):
        os.makedirs(out)
        with open(os.path.join(out, "data"), "w") as fh:
            fh.write("x")
        built["dir"] = out
        # the stage happens BEFORE the commit: old gen still pointed
        assert G.gen_name(path) == "gen-old"

    new_gen = G.fold_generation(
        path,
        build,
        folded={"seg-a", "seg-b"},
        gc_paths=[
            os.path.join(path, "segments/seg-a"),
            os.path.join(path, "segments/seg-b"),
            os.path.join(path, "gen-old"),
        ],
    )
    assert G.gen_name(path) == new_gen
    assert G.folded_set(path, new_gen) == {"seg-a", "seg-b"}
    # r14 (verdict item 4): retirees stay on disk for the reader grace
    # window — a probe that resolved gen-old just before the swap
    # finishes against intact files — but are already invisible: the
    # manifest excludes the folded segments and the pointer moved on
    assert os.path.isdir(os.path.join(path, "segments/seg-a"))
    assert os.path.isdir(os.path.join(path, "gen-old"))
    assert G.live_segments(path) == []
    # the orphan sweep honors the grace window too (gen-old is listed
    # in the pointed generation's retire manifest)
    G.gc_orphan_generations(path, new_gen)
    assert os.path.isdir(os.path.join(path, "gen-old"))
    # grace expired: the sweep deletes the retirees and prunes the manifest
    swept = G.sweep_retired(path, grace_s=0.0)
    assert sorted(os.path.basename(p) for p in swept) == [
        "gen-old", "seg-a", "seg-b",
    ]
    assert not os.path.isdir(os.path.join(path, "segments/seg-a"))
    assert not os.path.isdir(os.path.join(path, "gen-old"))
    assert G.sweep_retired(path, grace_s=0.0) == []  # manifest pruned


def test_fold_generation_no_manifest_mode(tmp_path):
    path = str(tmp_path)
    gen = G.fold_generation(
        path, lambda out: os.makedirs(out), manifest=False
    )
    assert G.gen_name(path) == gen
    assert not os.path.exists(os.path.join(path, gen, G.FOLDED_MANIFEST))


def test_fold_into_segment_atomic_rename_and_gc(tmp_path):
    path = str(tmp_path)
    os.makedirs(os.path.join(path, "batch_id=b0"))

    def build(out):
        os.makedirs(out)
        with open(os.path.join(out, "part"), "w") as fh:
            fh.write("rows")

    G.fold_into_segment(
        path,
        "batch_id=nearcompact-x",
        build,
        folded={"b0"},
        gc_paths=[os.path.join(path, "batch_id=b0")],
    )
    seg = os.path.join(path, "batch_id=nearcompact-x")
    assert os.path.exists(os.path.join(seg, "part"))
    with open(os.path.join(seg, G.FOLDED_MANIFEST)) as fh:
        assert fh.read().splitlines() == ["b0"]
    # the folded input survives its grace window (readers mid-scan),
    # invisible to the manifest-resolving live-entry list, then sweeps
    assert os.path.isdir(os.path.join(path, "batch_id=b0"))
    assert G.sweep_retired(path, grace_s=0.0, part_dir=seg) == [
        os.path.join(path, "batch_id=b0")
    ]
    assert not os.path.isdir(os.path.join(path, "batch_id=b0"))
    # staging fully cleaned
    assert [e for e in os.listdir(path) if e.startswith(".fold-staging")] == []


def test_swap_pointer_custom_marker(tmp_path):
    path = str(tmp_path)
    G.swap_pointer(path, "some_table_g1", marker="_STORE")
    with open(os.path.join(path, "_STORE")) as fh:
        assert fh.read() == "some_table_g1"
    assert G.gen_name(path) is None  # _GEN untouched


def test_fold_into_segment_cleans_staging_on_failure(tmp_path):
    """A crashed fold's .fold-staging.* leftovers are GC'd: by the
    finally on an in-process failure, and by the next fold's entry
    sweep when the process died outright (kill -9 has no finally)."""
    path = str(tmp_path)
    # a prior kill-9's leftover
    os.makedirs(os.path.join(path, ".fold-staging.deadbeef", "seg"))

    def boom(out):
        os.makedirs(out)
        raise RuntimeError("executor lost")

    with pytest.raises(RuntimeError, match="executor lost"):
        G.fold_into_segment(path, "batch_id=x", boom, folded=set())
    assert [e for e in os.listdir(path) if e.startswith(".fold-staging")] == []
    assert not os.path.exists(os.path.join(path, "batch_id=x"))


def test_enforce_law_what_names_the_store_kind(tmp_path):
    G.enforce_law(str(tmp_path), "hembed|dim=16", marker="_EMBED_LAW",
                  what="vector index embedding law")
    with pytest.raises(RuntimeError, match="vector index embedding law"):
        G.enforce_law(str(tmp_path), "hembed|dim=32", marker="_EMBED_LAW",
                      what="vector index embedding law")


def test_publish_segment_atomic_and_replay(tmp_path):
    """r14 (probe-under-maintenance soak): segment appends stage under a
    dot name and publish with one rename — no reader ever sees a
    half-written segment; a replay overwrites by name; an empty build
    publishes nothing."""
    path = str(tmp_path)
    seg_root = os.path.join(path, "segments")
    os.makedirs(seg_root)

    def build_v1(staging):
        os.makedirs(staging)
        with open(os.path.join(staging, "stats"), "w") as fh:
            fh.write("v1")
        # mid-build, nothing is visible as a segment
        assert G.live_segments(path) == []

    out = G.publish_segment(path, "b0", build_v1)
    assert out == os.path.join(seg_root, "b0")
    assert G.live_segments(path) == ["b0"]
    with open(os.path.join(seg_root, "b0", "stats")) as fh:
        assert fh.read() == "v1"
    # replay: name-keyed overwrite
    def build_v2(staging):
        os.makedirs(staging)
        with open(os.path.join(staging, "stats"), "w") as fh:
            fh.write("v2")

    G.publish_segment(path, "b0", build_v2)
    with open(os.path.join(seg_root, "b0", "stats")) as fh:
        assert fh.read() == "v2"
    assert G.live_segments(path) == ["b0"]
    # empty batch: build returns False -> nothing published
    assert G.publish_segment(path, "b1", lambda s: False) is None
    assert G.live_segments(path) == ["b0"]
    # no staging litter in any case
    assert [e for e in os.listdir(seg_root) if e.startswith(".staging-")] == []


def test_gc_stale_staging_age_gated(tmp_path):
    import time as _t

    path = str(tmp_path)
    seg_root = os.path.join(path, "segments")
    fresh = os.path.join(seg_root, ".staging-live-abc")
    dead = os.path.join(seg_root, ".staging-dead-def")
    os.makedirs(fresh)
    os.makedirs(dead)
    past = _t.time() - 7200
    os.utime(dead, (past, past))
    G.gc_stale_staging(path)
    assert os.path.isdir(fresh)       # a live append's staging survives
    assert not os.path.isdir(dead)    # a crashed writer's is GC'd
    # staging dirs are invisible to segment listings either way
    assert G.live_segments(path) == []
