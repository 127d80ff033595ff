"""The commit-metadata I/O seam under every store (r12 verdict item 1).

Every pointer/marker/manifest/law commit in the engine — the generational
stores (plans/genstore.py), the batch commit markers and fold manifests
(streaming/curation.py), the state snapshot pointer and writer lock
(plans/tables.py), the checkpoint run-id (streaming/pipeline.py) — is a
handful of tiny-file operations whose ATOMICITY carries the engine's
crash-safety proofs:

- ``write_atomic``: tmp write + rename — readers see the old or the new
  content, never a torn one (the pointer-swap commit);
- ``create_exclusive``: exactly one concurrent creator wins, the loser
  reads the winner's content (law bootstrap, writer lock, run-id);
- ``rename``: one atomic directory publish (the staged-segment commit).

These primitives exist on POSIX (``os.replace``, ``os.link``/``O_EXCL``,
``os.rename``) but NOT on the object stores a 100 TB deployment reads
its data from: S3 "rename" is copy+delete, there are no hard links, and
list-after-write was only recently consistent. Running the rename-based
commit protocol against such a store wouldn't fail — it would silently
void every crash-safety argument. So the seam is explicit:

- :class:`LocalStoreIO` is the default and the only data-path-capable
  implementation today (the sandbox and any shared-POSIX cluster:
  NFS, Lustre, GPFS, a FUSE mount with POSIX rename semantics);
- :func:`storeio_for` raises LOUDLY on ``s3://``/``hdfs://``/``abfs://``
  (etc.) store paths, naming the contract a port must satisfy — an
  object-store implementation needs a compare-and-swap primitive
  (DynamoDB/etcd/ZooKeeper conditional put, or S3 conditional writes)
  behind the same five-method surface, which is exactly the role
  ClickHouse Keeper plays for the reference's EKS deployment
  (manifests/adsb-clickhouse/30-clickhouse-eks.yaml.example);
- :class:`MemStoreIO` is the in-process fake the contract tests run
  against (register it under a scheme with :func:`register_scheme`),
  proving the callers depend only on the interface semantics, not on
  the POSIX filesystem behind it.

Data-plane I/O (parquet segment reads/writes) is NOT behind this seam —
Spark's own Hadoop filesystem layer already abstracts that correctly;
only the driver-side commit metadata needed a home.
"""

from __future__ import annotations

import glob as _glob
import os
import re
import shutil
import threading
import time
import uuid

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://")

# schemes we KNOW name object stores / DFS without the POSIX primitives
# the commit protocol requires — the loud-guard list
_REMOTE_SCHEMES = frozenset(
    {
        "s3", "s3a", "s3n", "hdfs", "abfs", "abfss", "adl", "gs", "gcs",
        "wasb", "wasbs", "oss", "cos", "cosn", "obs", "swift", "viewfs",
        "o3fs", "ofs",
    }
)


class StoreIO:
    """Commit-metadata primitives every store path goes through.

    Implementations must honor the atomicity contracts in the module
    docstring; everything else (listing, existence, deletes) is plain
    namespace bookkeeping.
    """

    def read_text(self, path: str) -> str:
        """Contents of a small text file; raises ``OSError`` if absent."""
        raise NotImplementedError

    def write_atomic(self, path: str, text: str) -> None:
        """Publish ``text`` at ``path`` atomically (readers see the old
        content or the new, never a torn intermediate)."""
        raise NotImplementedError

    def create_exclusive(self, path: str, text: str) -> tuple[bool, str]:
        """Atomically create ``path`` with ``text`` iff it does not
        exist. Returns ``(True, text)`` if this caller won the create,
        else ``(False, existing_content)`` — exactly one concurrent
        creator can ever win."""
        raise NotImplementedError

    def unlink(self, path: str) -> None:
        """Remove a file; raises ``OSError`` if absent."""
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        """Immediate child names; raises ``OSError`` if absent."""
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        """mkdir -p (exist_ok)."""
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        """Recursive delete, ignore_errors semantics (pure GC calls)."""
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        """Atomic rename of a file or a whole directory tree; ``dst``
        must not already exist for directories (the staged-segment
        publish)."""
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        """Modification time (seconds); raises ``OSError`` if absent."""
        raise NotImplementedError

    def touch(self, path: str) -> None:
        """Refresh an existing file's mtime (lease heartbeats); raises
        ``OSError`` if absent."""
        raise NotImplementedError

    def stat_token(self, path: str):
        """An opaque token that changes whenever the file's content
        may have changed — cache-invalidation key (finer than a float
        mtime: coarse-granularity filesystems can tick twice in one
        timestamp; (mtime_ns, size) closes that window — r12 advice)."""
        raise NotImplementedError

    def glob(self, pattern: str) -> list[str]:
        """Paths matching a glob pattern (replay leftover sweeps)."""
        raise NotImplementedError

    def has_files(self, path: str, suffix: str) -> bool:
        """True iff the tree under ``path`` holds a file ending in
        ``suffix`` (guards reads of possibly-empty segment writes)."""
        raise NotImplementedError


class LocalStoreIO(StoreIO):
    """POSIX implementation — the current default everywhere.

    Atomicity provided by the filesystem: ``os.replace`` (write_atomic),
    tmp + ``os.link`` (create_exclusive — link refuses an existing
    target atomically, so exactly one creator wins and the content is
    fully written before it becomes visible), ``os.rename`` (rename).
    """

    def read_text(self, path: str) -> str:
        # bare open(path) on purpose: the enforce_law race tests simulate
        # a visibility race by intercepting exactly this call shape
        with open(path) as fh:
            return fh.read()

    def write_atomic(self, path: str, text: str) -> None:
        tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)

    def create_exclusive(self, path: str, text: str) -> tuple[bool, str]:
        tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(text)
        try:
            while True:
                try:
                    os.link(tmp, path)
                    return True, text
                except FileExistsError:
                    try:
                        return False, self.read_text(path)
                    except FileNotFoundError:
                        # the existing file vanished between the failed
                        # link and our read (a lock holder releasing) —
                        # retry the exclusive create rather than crash
                        # the contender (r13 review)
                        continue
        finally:
            os.unlink(tmp)

    def unlink(self, path: str) -> None:
        os.unlink(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def touch(self, path: str) -> None:
        os.utime(path, None)

    def stat_token(self, path: str):
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)

    def glob(self, pattern: str) -> list[str]:
        return _glob.glob(pattern)

    def has_files(self, path: str, suffix: str) -> bool:
        if not os.path.isdir(path):
            return False
        for _sub, _dirs, files in os.walk(path):
            if any(f.endswith(suffix) for f in files):
                return True
        return False


class MemStoreIO(StoreIO):
    """In-memory fake for contract tests — same atomicity semantics
    (a per-instance lock makes every namespace mutation one indivisible
    step, which is exactly what the POSIX primitives guarantee), zero
    filesystem. Register under a scheme (``mem://``) so the production
    call sites resolve it through :func:`storeio_for` unchanged."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._files: dict[str, str] = {}
        self._dirs: set[str] = set()
        self._meta: dict[str, tuple[float, int]] = {}  # path -> (mtime, seq)
        self._seq = 0

    @staticmethod
    def _norm(path: str) -> str:
        return path.rstrip("/")

    def _touch(self, path: str) -> None:
        self._seq += 1
        self._meta[path] = (time.time(), self._seq)

    def _add_parents(self, path: str) -> None:
        parent = path.rsplit("/", 1)[0]
        while parent and not parent.endswith(":/"):
            self._dirs.add(parent)
            if "/" not in parent:
                break
            parent = parent.rsplit("/", 1)[0]

    # -- reads ----------------------------------------------------------
    def read_text(self, path: str) -> str:
        path = self._norm(path)
        with self._lock:
            if path not in self._files:
                raise FileNotFoundError(path)
            return self._files[path]

    def listdir(self, path: str) -> list[str]:
        path = self._norm(path)
        with self._lock:
            if path not in self._dirs:
                raise FileNotFoundError(path)
            prefix = path + "/"
            out = set()
            for p in list(self._files) + list(self._dirs):
                if p.startswith(prefix):
                    out.add(p[len(prefix):].split("/", 1)[0])
            return sorted(out)

    def isdir(self, path: str) -> bool:
        with self._lock:
            return self._norm(path) in self._dirs

    def exists(self, path: str) -> bool:
        path = self._norm(path)
        with self._lock:
            return path in self._files or path in self._dirs

    def mtime(self, path: str) -> float:
        path = self._norm(path)
        with self._lock:
            if path not in self._meta:
                raise FileNotFoundError(path)
            return self._meta[path][0]

    def touch(self, path: str) -> None:
        path = self._norm(path)
        with self._lock:
            if path not in self._meta:
                raise FileNotFoundError(path)
            self._touch(path)

    def stat_token(self, path: str):
        path = self._norm(path)
        with self._lock:
            if path not in self._meta:
                raise FileNotFoundError(path)
            return self._meta[path]

    @staticmethod
    def _glob_regex(pattern: str):
        # glob semantics, not fnmatch: '*'/'?' never cross a '/'
        # (fnmatch's '*' is '.*', which made patterns like
        # 'scrape_date=*/batch_id=b0' match nested paths LocalStoreIO's
        # glob.glob would never return — r13 review)
        out = []
        for ch in pattern:
            if ch == "*":
                out.append("[^/]*")
            elif ch == "?":
                out.append("[^/]")
            else:
                out.append(re.escape(ch))
        return re.compile("^" + "".join(out) + "$")

    def glob(self, pattern: str) -> list[str]:
        rx = self._glob_regex(self._norm(pattern))
        with self._lock:
            names = set(self._files) | set(self._dirs)
            return sorted(p for p in names if rx.match(p))

    def has_files(self, path: str, suffix: str) -> bool:
        prefix = self._norm(path) + "/"
        with self._lock:
            return any(
                p.startswith(prefix) and p.endswith(suffix)
                for p in self._files
            )

    # -- writes ---------------------------------------------------------
    def write_atomic(self, path: str, text: str) -> None:
        path = self._norm(path)
        with self._lock:
            self._add_parents(path)
            self._files[path] = text
            self._touch(path)

    def create_exclusive(self, path: str, text: str) -> tuple[bool, str]:
        path = self._norm(path)
        with self._lock:
            if path in self._files:
                return False, self._files[path]
            self._add_parents(path)
            self._files[path] = text
            self._touch(path)
            return True, text

    def unlink(self, path: str) -> None:
        path = self._norm(path)
        with self._lock:
            if path not in self._files:
                raise FileNotFoundError(path)
            del self._files[path]
            self._meta.pop(path, None)

    def makedirs(self, path: str) -> None:
        path = self._norm(path)
        with self._lock:
            self._dirs.add(path)
            self._add_parents(path)
            self._touch(path)

    def rmtree(self, path: str) -> None:
        path = self._norm(path)
        prefix = path + "/"
        with self._lock:
            for p in [k for k in self._files if k == path or k.startswith(prefix)]:
                del self._files[p]
                self._meta.pop(p, None)
            for d in [k for k in self._dirs if k == path or k.startswith(prefix)]:
                self._dirs.discard(d)
                # dir meta must die with the dir, or mtime()/stat_token()
                # keep answering for deleted paths — diverging from the
                # POSIX implementation's OSError (r13 review)
                self._meta.pop(d, None)

    def rename(self, src: str, dst: str) -> None:
        src, dst = self._norm(src), self._norm(dst)
        sp = src + "/"
        with self._lock:
            if src not in self._files and src not in self._dirs:
                raise FileNotFoundError(src)
            if src in self._dirs and (dst in self._dirs or dst in self._files):
                raise OSError(f"rename target exists: {dst}")
            self._add_parents(dst)
            if src in self._files:
                self._files[dst] = self._files.pop(src)
                self._meta[dst] = self._meta.pop(src)
                self._touch(dst)
                return
            for p in [k for k in self._files if k.startswith(sp)]:
                self._files[dst + p[len(src):]] = self._files.pop(p)
                self._meta[dst + p[len(src):]] = self._meta.pop(p)
            for d in [k for k in self._dirs if k == src or k.startswith(sp)]:
                self._dirs.discard(d)
                self._dirs.add(dst + d[len(src):])
                meta = self._meta.pop(d, None)
                if meta is not None:
                    self._meta[dst + d[len(src):]] = meta
            self._touch(dst)


_LOCAL = LocalStoreIO()
_SCHEMES: dict[str, StoreIO] = {}


def register_scheme(scheme: str, io: StoreIO) -> None:
    """Bind a URI scheme to a StoreIO implementation (tests register
    ``mem``; a real object-store port would register ``s3`` with a
    CAS-backed implementation and thereby lift the guard)."""
    _SCHEMES[scheme.lower()] = io


def unregister_scheme(scheme: str) -> None:
    _SCHEMES.pop(scheme.lower(), None)


def storeio_for(path: str) -> StoreIO:
    """Resolve the StoreIO for a store path. Plain paths (the POSIX
    default) get :class:`LocalStoreIO`; a registered scheme gets its
    implementation; any OTHER scheme raises — loudly, naming the
    portability contract — instead of silently running rename-based
    commits on a filesystem that has no atomic rename."""
    m = _SCHEME_RE.match(path)
    if m is None:
        return _LOCAL
    scheme = m.group(1).lower()
    if scheme in _SCHEMES:
        return _SCHEMES[scheme]
    if scheme in _REMOTE_SCHEMES:
        raise RuntimeError(
            f"store path {path!r} is on {scheme}://, which has no atomic "
            "rename / exclusive-create / hard-link primitives — the "
            "commit-metadata protocol (pointer swaps, commit markers, "
            "law bootstrap) would run without its atomicity guarantees "
            "and every crash-safety proof would be void. Register a "
            "StoreIO implementation backed by a compare-and-swap "
            "primitive (e.g. DynamoDB/etcd/ZooKeeper conditional put) "
            "via plans.storeio.register_scheme, or keep store metadata "
            "on a shared POSIX filesystem. Data-plane parquet paths are "
            "unaffected — only store METADATA needs this contract."
        )
    raise RuntimeError(
        f"store path {path!r} has unrecognized scheme {scheme}://; pass a "
        "plain filesystem path, or register a StoreIO implementation for "
        "the scheme via plans.storeio.register_scheme"
    )
