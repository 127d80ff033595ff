"""Generational-store primitives — THE shared lifecycle law behind
every stored index and catalog in the engine.

Three physical layouts use these primitives, all with the same crash
discipline (build the new generation fully → ONE atomic ``os.replace``
pointer/rename commit → GC, where every crash window leaves readers a
harmless superset and a re-run converges):

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
  record; it is written tmp-then-``os.replace`` (atomic on POSIX), so
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
"""

from __future__ import annotations

import os
import uuid

GEN_POINTER = "_GEN"
FOLDED_MANIFEST = "_FOLDED"
LAW_MARKER = "_BAND_LAW"


def gen_name(path: str) -> str | None:
    """The current generation named by the store's pointer file, or
    None in the bootstrap state (no pointer yet)."""
    try:
        with open(os.path.join(path, GEN_POINTER)) as fh:
            name = fh.read().strip()
        return name or None
    except OSError:
        return None


def swap_pointer(path: str, gen: str, *, marker: str = GEN_POINTER) -> None:
    """Atomically repoint the store: tmp write + ``os.replace``. This
    IS the commit — everything before it is invisible staging,
    everything after it is GC. ``marker`` lets bucketed-table stores
    reuse the same commit for their ``_STORE`` table pointer."""
    ptr = os.path.join(path, marker)
    tmp = ptr + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        fh.write(gen)
    os.replace(tmp, ptr)


def folded_set(path: str, gen: str | None) -> set[str]:
    """Segment names the given generation has folded (transitive:
    each compaction carries the prior manifest forward, so a folded
    segment whose delete was interrupted can never look live again)."""
    if gen is None:
        return set()
    try:
        with open(os.path.join(path, gen, FOLDED_MANIFEST)) as fh:
            return {ln.strip() for ln in fh if ln.strip()}
    except OSError:
        return set()


def write_manifest(gen_dir: str, folded: set[str]) -> None:
    """Record the (transitive) folded-segment set inside a generation
    directory, one name per line, sorted for diffability."""
    with open(os.path.join(gen_dir, FOLDED_MANIFEST), "w") as fh:
        fh.write("".join(f"{e}\n" for e in sorted(folded)))


def live_segments(path: str) -> list[str]:
    """Named segment appends not yet folded by the current generation
    (underscore entries are markers, never segments)."""
    seg_root = os.path.join(path, "segments")
    if not os.path.isdir(seg_root):
        return []
    folded = folded_set(path, gen_name(path))
    return sorted(
        e
        for e in os.listdir(seg_root)
        if not e.startswith("_") and e not in folded
    )


def gc_orphan_generations(path: str, keep: str | None) -> None:
    """Delete ``gen-*`` directories other than the pointed one — the
    leftovers of a compaction that crashed BEFORE its pointer swap.
    Safe under the single-concurrent-maintainer contract (probes only
    resolve the pointed generation, so an unpointed dir has no readers
    to race)."""
    if not os.path.isdir(path):
        return
    import shutil

    for e in os.listdir(path):
        if e.startswith("gen-") and e != keep:
            shutil.rmtree(os.path.join(path, e), ignore_errors=True)


def fold_generation(
    path: str,
    build,
    *,
    folded: set[str] | None = None,
    gc_paths: tuple | list = (),
    manifest: bool = True,
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
    import shutil

    new_gen = f"gen-{uuid.uuid4().hex[:8]}"
    out = os.path.join(path, new_gen)
    build(out)
    if manifest:
        os.makedirs(out, exist_ok=True)
        write_manifest(out, folded or set())
    swap_pointer(path, new_gen)
    for p in gc_paths:
        shutil.rmtree(p, ignore_errors=True)
    return new_gen


def fold_into_segment(
    dir_path: str,
    seg_entry: str,
    build,
    *,
    folded: set[str],
    gc_paths: tuple | list = (),
) -> None:
    """The fold loop's second commit flavor: for stores whose readers
    resolve SEGMENTS + manifests directly (no generation pointer — the
    curated table), the commit is one atomic ``os.rename`` of a fully
    staged segment directory into the store. ``build(staging_seg_dir)``
    writes the segment's content; the transitive ``folded`` manifest
    lands inside it BEFORE the rename, so from the commit instant
    readers exclude the folded inputs; ``gc_paths`` are deleted after
    (a crash mid-GC leaves dirs the manifest already excludes)."""
    import shutil

    # GC staging leftovers of a prior CRASHED fold first (a finally
    # block can't cover kill -9): unpointed, unreferenced by any
    # reader, and safe under the single-concurrent-maintainer contract
    if os.path.isdir(dir_path):
        for e in os.listdir(dir_path):
            if e.startswith(".fold-staging."):
                shutil.rmtree(os.path.join(dir_path, e), ignore_errors=True)
    staging = os.path.join(dir_path, f".fold-staging.{uuid.uuid4().hex[:8]}")
    out = os.path.join(staging, seg_entry)
    try:
        build(out)
        write_manifest(out, folded)
        os.rename(out, os.path.join(dir_path, seg_entry))
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    for p in gc_paths:
        shutil.rmtree(p, ignore_errors=True)


def enforce_law(
    path: str, law: str, *, marker: str = LAW_MARKER, what: str = "band store"
) -> None:
    """Record ``law`` at the store's first use; raise on any later
    mismatch. The law string must be DERIVED from the same variables
    that shape the store's key space (never a frozen literal), so a
    configuration change shifts the law in lockstep with the keys it
    guards."""
    mpath = os.path.join(path, marker)
    try:
        with open(mpath) as fh:
            existing = fh.read().strip()
    except OSError:
        os.makedirs(path, exist_ok=True)
        # bootstrap must be EXCLUSIVE as well as atomic: a check-then-
        # replace let two concurrent first-users configured with
        # different laws both pass (each saw no marker; last replace
        # won), defeating the guard exactly when it matters (r11
        # advice). os.link refuses an existing target atomically, so
        # exactly one law can ever win the race — the loser re-reads
        # the winner's marker and falls through to the mismatch check.
        tmp = mpath + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(law)
        try:
            os.link(tmp, mpath)
            existing = law
        except FileExistsError:
            with open(mpath) as fh:
                existing = fh.read().strip()
        finally:
            os.unlink(tmp)
    if existing != law:
        raise RuntimeError(
            f"{what} at {path} was written under law {existing!r} "
            f"but this ingest is configured with {law!r}; probing a "
            "mismatched key space would silently lose recall — "
            "rebuild the store or restore the original configuration"
        )
