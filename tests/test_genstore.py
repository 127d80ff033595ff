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
