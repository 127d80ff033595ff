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


def swap_pointer(path: str, gen: str) -> None:
    """Atomically repoint the store: tmp write + ``os.replace``. This
    IS the commit — everything before it is invisible staging,
    everything after it is GC."""
    ptr = os.path.join(path, GEN_POINTER)
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


def enforce_law(path: str, law: str, *, marker: str = LAW_MARKER) -> None:
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
        tmp = mpath + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(law)
        os.replace(tmp, mpath)
        return
    if existing != law:
        raise RuntimeError(
            f"band store at {path} was written under law {existing!r} "
            f"but this ingest is configured with {law!r}; probing a "
            "mismatched key space would silently re-admit near-dups — "
            "rebuild the store or restore the original configuration"
        )
