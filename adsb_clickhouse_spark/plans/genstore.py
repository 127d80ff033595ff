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
import time
import uuid

from .storeio import StoreIO, storeio_for

GEN_POINTER = "_GEN"
FOLDED_MANIFEST = "_FOLDED"
LAW_MARKER = "_BAND_LAW"
RETIRE_MANIFEST = "_RETIRED_PATHS"
#: how long a superseded generation / folded segment stays on disk after
#: its fold commits — the reader grace window (r13 verdict item 4: a
#: probe that resolved the OLD pointer and is mid-scan when the fold
#: commits must finish against intact files; the old immediate rmtree
#: was a torn-read window). Mirrors plans/tables.STATE_GC_GRACE_S.
GEN_GC_GRACE_S = 300.0


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


_UNSET = object()


def live_segments(
    path: str, *, io: StoreIO | None = None, gen=_UNSET
) -> list[str]:
    """Named segment appends not yet folded by the current generation
    (underscore entries are markers, dot entries are in-flight append
    staging — never segments). ``gen`` pins the generation whose folded
    manifest masks the listing (callers holding a consistent view —
    :func:`snapshot_view`); by default the pointer is read here."""
    io = io or storeio_for(path)
    seg_root = os.path.join(path, "segments")
    if not io.isdir(seg_root):
        return []
    if gen is _UNSET:
        gen = gen_name(path, io=io)
    folded = folded_set(path, gen, io=io)
    return sorted(
        e
        for e in io.listdir(seg_root)
        if not e.startswith(("_", ".")) and e not in folded
    )


def snapshot_view(
    path: str, *, io: StoreIO | None = None
) -> tuple[str | None, list[str]]:
    """(generation, live segment names) as ONE consistent view — the
    prober-side read discipline.

    ``gen_name`` and ``live_segments`` are two separate metadata reads;
    a fold commit (pointer swap) landing BETWEEN them hands a prober
    the PRE-fold generation paired with the POST-fold segment list —
    the freshly folded segments' rows are in neither part, so the probe
    silently under-reads (worst case: the pre-fold generation is the
    empty bootstrap and the probe returns ZERO rows — the exact
    "short probe: knn=0" the probe-under-maintenance soak caught under
    heavy co-tenant load, where the window between the two reads
    stretches to seconds).

    Re-reading the pointer after the listing and retrying on change
    makes the pair linearizable: generation names are unique (uuid
    suffix, so no ABA), each generation's folded manifest is immutable
    once published, and the only segment-list mutation that can land
    inside an unchanged-pointer window is a new segment APPEND — which
    is disjoint new data, so observing or missing it are both
    consistent probe points. Folds are seconds apart by construction
    (single leased maintainer), so the retry converges immediately."""
    io = io or storeio_for(path)
    while True:
        gen = gen_name(path, io=io)
        segs = live_segments(path, io=io, gen=gen)
        if gen_name(path, io=io) == gen:
            return gen, segs


def publish_segment(
    path: str, segment: str, build, *, io: StoreIO | None = None
) -> str:
    """Atomic segment APPEND (r14, found by the probe-under-maintenance
    soak): ``build(staging_dir)`` writes the full segment content into
    a dot-prefixed staging name — invisible to ``live_segments`` and to
    Spark's own listing — and ONE atomic rename publishes it as
    ``segments/<segment>``. Probes therefore never see a segment whose
    postings/stats/marker files are still being written (the old
    in-place write exposed the directory from its first file: a
    concurrent probe unioning ``<part>/stats`` across live segments hit
    PATH_NOT_FOUND mid-append). Replays (name-keyed overwrite contract)
    rmtree the committed segment before the rename — a probe mid-scan
    of a segment being REPLAYED can fail transiently, but a replay only
    follows a crash, where the batch's commit marker never landed.
    Crashed staging dirs are GC'd by ``gc_stale_staging`` at the next
    compaction. ``build`` returning ``False`` skips the publish (an
    empty batch: nothing becomes visible at all — cleaner than the old
    in-place _SUCCESS-only directory every reader had to special-case).
    Returns the committed segment path, or None when skipped.

    r14 verdict item 2: the stage+commit goes through the StoreIO
    publish seam (``begin_publish``/``commit_publish``) instead of a
    literal directory rename — identical dot-staging + atomic-rename
    protocol on POSIX, but a CAS namespace stages IN PLACE under a
    pending marker and commits by one marker delete, so no payload
    ever moves through the driver on the per-batch path."""
    io = io or storeio_for(path)
    seg_root = os.path.join(path, "segments")
    final = os.path.join(seg_root, segment)
    overwrite = io.exists(final)  # replay (name-keyed overwrite contract)
    staging = io.begin_publish(final, overwrite=overwrite)
    try:
        if build(staging) is False:
            io.abort_publish(final, staging)
            return None
        io.commit_publish(final, staging, overwrite=overwrite)
    except BaseException:
        io.abort_publish(final, staging)
        raise
    return final


def gc_stale_staging(
    path: str, *, max_age_s: float = 3600.0, io: StoreIO | None = None
) -> None:
    """Delete ``.staging-*`` leftovers of CRASHED appends under
    ``segments/``. Age-gated (like the marker tmp sweep): a live
    append's staging dir is at most seconds old, so anything older
    than ``max_age_s`` belongs to a dead writer. Run from the
    compactors (single-maintainer slot)."""
    io = io or storeio_for(path)
    seg_root = os.path.join(path, "segments")
    if not io.isdir(seg_root):
        return
    now = time.time()
    for e in io.listdir(seg_root):
        if not e.startswith(".staging-"):
            continue
        full = os.path.join(seg_root, e)
        try:
            if now - io.mtime(full) > max_age_s:
                io.rmtree(full)
        except OSError:
            pass  # vanished under us (its append just published)


def read_retire_manifest(gen_dir: str, io: StoreIO) -> list[tuple[float, str]]:
    """``(retired_at_epoch, path)`` entries of a part's retire
    manifest; empty when absent (pre-grace-window stores, bootstrap
    generations)."""
    try:
        text = io.read_text(os.path.join(gen_dir, RETIRE_MANIFEST))
    except OSError:
        return []
    out: list[tuple[float, str]] = []
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln:
            continue
        ts, p = ln.split("|", 1)
        out.append((float(ts), p))
    return out


def write_retire_manifest(
    gen_dir: str, entries: list[tuple[float, str]], io: StoreIO
) -> None:
    io.write_atomic(
        os.path.join(gen_dir, RETIRE_MANIFEST),
        "".join(f"{ts!r}|{p}\n" for ts, p in entries),
    )


def sweep_retired(
    path: str,
    *,
    grace_s: float | None = None,
    io: StoreIO | None = None,
    part_dir: str | None = None,
) -> list[str]:
    """Delete retire-manifest entries older than the grace window and
    rewrite the manifest without them (r13 verdict item 4 — the reader
    grace window). Only entries of the POINTED generation (or of the
    explicitly named committed ``part_dir``) are eligible: their
    presence in a committed part PROVES the fold that superseded those
    paths committed, so no new reader can resolve them — only a probe
    already mid-scan, which the grace period protects. Returns the
    deleted paths."""
    io = io or storeio_for(path)
    if part_dir is None:
        gen = gen_name(path, io=io)
        if gen is None:
            return []
        part_dir = os.path.join(path, gen)
    entries = read_retire_manifest(part_dir, io)
    if not entries:
        return []
    grace = GEN_GC_GRACE_S if grace_s is None else grace_s
    now = time.time()
    keep: list[tuple[float, str]] = []
    swept: list[str] = []
    for ts, p in entries:
        if now - ts > grace:
            io.rmtree(p)
            swept.append(p)
        else:
            keep.append((ts, p))
    if swept:
        write_retire_manifest(part_dir, keep, io)
    return swept


def gc_orphan_generations(
    path: str, keep: str | None, *, io: StoreIO | None = None
) -> None:
    """Delete ``gen-*`` directories other than the pointed one — the
    leftovers of a compaction that crashed BEFORE its pointer swap.
    Safe under the single-concurrent-maintainer contract (probes only
    resolve the pointed generation, so an unpointed dir has no readers
    to race) — EXCEPT superseded generations inside their reader grace
    window, which the pointed generation's retire manifest lists and
    this sweep therefore skips (r13 verdict item 4: a probe that
    resolved the old pointer just before the swap must finish its scan
    against intact files; ``sweep_retired`` deletes them once the
    grace expires)."""
    io = io or storeio_for(path)
    if not io.isdir(path):
        return
    graced: set[str] = set()
    gen = keep if keep is not None else gen_name(path, io=io)
    if gen is not None:
        graced = {
            p for _ts, p in read_retire_manifest(os.path.join(path, gen), io)
        }
    for e in io.listdir(path):
        full = os.path.join(path, e)
        if e.startswith("gen-") and e != keep and full not in graced:
            io.rmtree(full)


def fold_generation(
    path: str,
    build,
    *,
    folded: set[str] | None = None,
    gc_paths: tuple | list = (),
    manifest: bool = True,
    io: StoreIO | None = None,
    grace_s: float | None = None,
) -> str:
    """THE generational fold loop (stage → manifest → swap → deferred
    GC) every compactor shares — text index, vector index, host ranks
    are each one ``build`` callback plus this commit discipline.

    ``build(new_gen_dir)`` fully writes the new generation's content
    before returning (the stage). Then the transitive ``folded`` set is
    recorded inside the new generation (unless ``manifest=False`` for
    stores whose inputs live elsewhere and dedupe by value), the
    pointer swaps atomically (the commit), and ``gc_paths`` — folded
    segment dirs, the superseded generation — are RETIRED, not
    deleted: they are appended (with the prior generation's unswept
    retirees carried forward) to the new generation's retire manifest,
    and ``sweep_retired`` deletes them only once their entry is older
    than the grace window (r13 verdict item 4 — a probe that resolved
    the OLD pointer just before the swap finishes its scan against
    intact files; new probes resolve the new pointer and the folded
    manifest already excludes the retirees). Interruption at any point
    leaves a readable, correct store: before the swap the old
    generation is still pointed (the orphan new dir is GC'd by the
    next run, which skips grace-window retirees); after it, the
    retirees are harmless supersets the manifest already excludes.
    Returns the new generation name."""
    io = io or storeio_for(path)
    new_gen = f"gen-{uuid.uuid4().hex[:8]}"
    out = os.path.join(path, new_gen)
    build(out)
    io.makedirs(out)  # no-op when build wrote content (exist_ok)
    if manifest:
        write_manifest(out, folded or set(), io=io)
    old_gen = gen_name(path, io=io)
    inherited = (
        read_retire_manifest(os.path.join(path, old_gen), io)
        if old_gen is not None
        else []
    )
    now = time.time()
    write_retire_manifest(
        out, inherited + [(now, p) for p in gc_paths], io
    )
    swap_pointer(path, new_gen, io=io)
    sweep_retired(path, grace_s=grace_s, io=io)
    return new_gen


def fold_into_segment(
    dir_path: str,
    seg_entry: str,
    build,
    *,
    folded: set[str],
    gc_paths: tuple | list = (),
    io: StoreIO | None = None,
    grace_s: float | None = None,
) -> None:
    """The fold loop's second commit flavor: for stores whose readers
    resolve SEGMENTS + manifests directly (no generation pointer — the
    curated table), the commit is one atomic directory rename of a
    fully staged segment into the store. ``build(staging_seg_dir)``
    writes the segment's content; the transitive ``folded`` manifest
    lands inside it BEFORE the rename, so from the commit instant
    readers exclude the folded inputs; ``gc_paths`` are RETIRED after
    (recorded in the committed segment's retire manifest, inheriting
    the unswept retirees of the inputs being folded) and deleted by
    ``sweep_retired`` once older than the grace window — a reader that
    resolved the live-entry list just before the commit finishes its
    scan against intact files (r13 verdict item 4)."""
    io = io or storeio_for(dir_path)
    # GC staging leftovers of a prior CRASHED fold first (a finally
    # block can't cover kill -9): unpointed, unreferenced by any
    # reader, and safe under the single-concurrent-maintainer contract.
    # Two generations of staging names: the pre-seam `.fold-staging.*`
    # and the publish seam's `.staging-*` (CAS stages in place under a
    # pending marker instead — begin_publish GCs its own garbage).
    if io.isdir(dir_path):
        for e in io.listdir(dir_path):
            if e.startswith((".fold-staging.", ".staging-")):
                io.rmtree(os.path.join(dir_path, e))
    # inherit the unswept retirees of the inputs this fold consumes
    # (their manifests die with them when the grace window closes)
    inherited: list[tuple[float, str]] = []
    for p in gc_paths:
        inherited += read_retire_manifest(p, io)
    committed = os.path.join(dir_path, seg_entry)
    staging = io.begin_publish(committed)
    try:
        build(staging)
        write_manifest(staging, folded, io=io)
        now = time.time()
        write_retire_manifest(
            staging, inherited + [(now, p) for p in gc_paths], io
        )
        io.commit_publish(committed, staging)
    except BaseException:
        io.abort_publish(committed, staging)
        raise
    sweep_retired(dir_path, grace_s=grace_s, io=io, part_dir=committed)


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
