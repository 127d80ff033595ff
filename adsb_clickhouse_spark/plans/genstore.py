"""Generational-store primitives — THE shared lifecycle law behind
every stored index and catalog in the engine.

Three physical layouts use these primitives, all with the same crash
discipline (build the new generation fully → ONE atomic pointer/rename
commit → GC, where every crash window leaves readers a harmless
superset and a re-run converges):

- **directory-generation stores** — ``gen-*/`` dirs + a ``_GEN``
  pointer file + name-keyed ``segments/`` appends + a transitive
  ``_FOLDED`` manifest inside each generation (text inverted index
  ``operators/search.py``, IVF vector index ``operators/vecindex.py``,
  host-rank dimension ``streaming/curation.py::recompute_host_ranks``);
- **bucketed-table stores** — ``batch_id=*`` parquet segments + a
  ``_STORE`` pointer naming a bucketed catalog table (fingerprint
  store, phash/text band stores —
  ``streaming/curation.py::_compact_keyed_store``);
- **manifest-fold tables** — ``_FOLDED`` manifests carried inside
  compact segments of the data table itself
  (``streaming/curation.py::compact_curated``).

Shared laws enforced here:

- ``swap_pointer``/``gen_name``: the pointer file is the ONLY commit
  record; it is written atomically (``StoreIO.write_atomic``), so
  readers see either the old or the new generation, never a torn one.
- ``folded_set``/``live_segments``: folded-segment manifests are
  TRANSITIVE — each compaction carries the prior manifest forward, so
  a folded segment whose directory delete was interrupted can never
  look live again (GC is pure cleanup, not correctness).
- ``enforce_law``: a store whose key space is a function of
  configuration (band counts, hash family, shingle width) records that
  law at first use and FAILS LOUDLY on mismatch — probing a store
  under a different law yields disjoint keys and silently re-admits
  every duplicate it remembers, the one failure mode a dedup memory
  must not have.
- committed-marker folding (the predicate callers pass to their
  compactors): only segments whose batch commit marker exists are
  folded or GC'd, so a fold can never half-read and delete a segment
  whose write is still in flight.

All metadata I/O goes through the :mod:`plans.storeio` seam (r12
verdict item 1): the atomicity contracts above are properties of the
``StoreIO`` implementation — POSIX by default, loud failure on object
stores whose namespaces don't have them.
"""

from __future__ import annotations

import os
import uuid

from .storeio import StoreIO, storeio_for

GEN_POINTER = "_GEN"
FOLDED_MANIFEST = "_FOLDED"
LAW_MARKER = "_BAND_LAW"


def gen_name(path: str, *, io: StoreIO | None = None) -> str | None:
    """The current generation named by the store's pointer file, or
    None in the bootstrap state (no pointer yet)."""
    io = io or storeio_for(path)
    try:
        name = io.read_text(os.path.join(path, GEN_POINTER)).strip()
        return name or None
    except OSError:
        return None


def swap_pointer(
    path: str, gen: str, *, marker: str = GEN_POINTER, io: StoreIO | None = None
) -> None:
    """Atomically repoint the store (``StoreIO.write_atomic``). This
    IS the commit — everything before it is invisible staging,
    everything after it is GC. ``marker`` lets bucketed-table stores
    reuse the same commit for their ``_STORE`` table pointer."""
    io = io or storeio_for(path)
    io.write_atomic(os.path.join(path, marker), gen)


def folded_set(
    path: str, gen: str | None, *, io: StoreIO | None = None
) -> set[str]:
    """Segment names the given generation has folded (transitive:
    each compaction carries the prior manifest forward, so a folded
    segment whose delete was interrupted can never look live again)."""
    if gen is None:
        return set()
    io = io or storeio_for(path)
    try:
        text = io.read_text(os.path.join(path, gen, FOLDED_MANIFEST))
        return {ln.strip() for ln in text.splitlines() if ln.strip()}
    except OSError:
        return set()


def write_manifest(
    gen_dir: str, folded: set[str], *, io: StoreIO | None = None
) -> None:
    """Record the (transitive) folded-segment set inside a generation
    directory, one name per line, sorted for diffability."""
    io = io or storeio_for(gen_dir)
    io.write_atomic(
        os.path.join(gen_dir, FOLDED_MANIFEST),
        "".join(f"{e}\n" for e in sorted(folded)),
    )


def live_segments(path: str, *, io: StoreIO | None = None) -> list[str]:
    """Named segment appends not yet folded by the current generation
    (underscore entries are markers, never segments)."""
    io = io or storeio_for(path)
    seg_root = os.path.join(path, "segments")
    if not io.isdir(seg_root):
        return []
    folded = folded_set(path, gen_name(path, io=io), io=io)
    return sorted(
        e
        for e in io.listdir(seg_root)
        if not e.startswith("_") and e not in folded
    )


def gc_orphan_generations(
    path: str, keep: str | None, *, io: StoreIO | None = None
) -> None:
    """Delete ``gen-*`` directories other than the pointed one — the
    leftovers of a compaction that crashed BEFORE its pointer swap.
    Safe under the single-concurrent-maintainer contract (probes only
    resolve the pointed generation, so an unpointed dir has no readers
    to race)."""
    io = io or storeio_for(path)
    if not io.isdir(path):
        return
    for e in io.listdir(path):
        if e.startswith("gen-") and e != keep:
            io.rmtree(os.path.join(path, e))


def fold_generation(
    path: str,
    build,
    *,
    folded: set[str] | None = None,
    gc_paths: tuple | list = (),
    manifest: bool = True,
    io: StoreIO | None = None,
) -> str:
    """THE generational fold loop (stage → manifest → swap → GC) every
    compactor shares — text index, vector index, host ranks are each
    one ``build`` callback plus this commit discipline.

    ``build(new_gen_dir)`` fully writes the new generation's content
    before returning (the stage). Then the transitive ``folded`` set is
    recorded inside the new generation (unless ``manifest=False`` for
    stores whose inputs live elsewhere and dedupe by value), the
    pointer swaps atomically (the commit), and only then are
    ``gc_paths`` — folded segment dirs, the superseded generation —
    deleted. Interruption at any point leaves a readable, correct
    store: before the swap the old generation is still pointed (the
    orphan new dir is GC'd by the next run); after it, a lagging GC
    only leaves supersets the manifest already excludes. Returns the
    new generation name."""
    io = io or storeio_for(path)
    new_gen = f"gen-{uuid.uuid4().hex[:8]}"
    out = os.path.join(path, new_gen)
    build(out)
    if manifest:
        io.makedirs(out)
        write_manifest(out, folded or set(), io=io)
    swap_pointer(path, new_gen, io=io)
    for p in gc_paths:
        io.rmtree(p)
    return new_gen


def fold_into_segment(
    dir_path: str,
    seg_entry: str,
    build,
    *,
    folded: set[str],
    gc_paths: tuple | list = (),
    io: StoreIO | None = None,
) -> None:
    """The fold loop's second commit flavor: for stores whose readers
    resolve SEGMENTS + manifests directly (no generation pointer — the
    curated table), the commit is one atomic directory rename of a
    fully staged segment into the store. ``build(staging_seg_dir)``
    writes the segment's content; the transitive ``folded`` manifest
    lands inside it BEFORE the rename, so from the commit instant
    readers exclude the folded inputs; ``gc_paths`` are deleted after
    (a crash mid-GC leaves dirs the manifest already excludes)."""
    io = io or storeio_for(dir_path)
    # GC staging leftovers of a prior CRASHED fold first (a finally
    # block can't cover kill -9): unpointed, unreferenced by any
    # reader, and safe under the single-concurrent-maintainer contract
    if io.isdir(dir_path):
        for e in io.listdir(dir_path):
            if e.startswith(".fold-staging."):
                io.rmtree(os.path.join(dir_path, e))
    staging = os.path.join(dir_path, f".fold-staging.{uuid.uuid4().hex[:8]}")
    out = os.path.join(staging, seg_entry)
    try:
        build(out)
        write_manifest(out, folded, io=io)
        io.rename(out, os.path.join(dir_path, seg_entry))
    finally:
        io.rmtree(staging)
    for p in gc_paths:
        io.rmtree(p)


def enforce_law(
    path: str,
    law: str,
    *,
    marker: str = LAW_MARKER,
    what: str = "band store",
    io: StoreIO | None = None,
) -> None:
    """Record ``law`` at the store's first use; raise on any later
    mismatch. The law string must be DERIVED from the same variables
    that shape the store's key space (never a frozen literal), so a
    configuration change shifts the law in lockstep with the keys it
    guards."""
    io = io or storeio_for(path)
    mpath = os.path.join(path, marker)
    try:
        existing = io.read_text(mpath).strip()
    except OSError:
        io.makedirs(path)
        # bootstrap must be EXCLUSIVE as well as atomic: a check-then-
        # replace let two concurrent first-users configured with
        # different laws both pass (each saw no marker; last replace
        # won), defeating the guard exactly when it matters (r11
        # advice). StoreIO.create_exclusive admits exactly one winner —
        # the loser reads back the winner's law and falls through to
        # the mismatch check.
        _won, existing = io.create_exclusive(mpath, law)
        existing = existing.strip()
    if existing != law:
        raise RuntimeError(
            f"{what} at {path} was written under law {existing!r} "
            f"but this ingest is configured with {law!r}; probing a "
            "mismatched key space would silently lose recall — "
            "rebuild the store or restore the original configuration"
        )
