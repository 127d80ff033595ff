"""History + current-state table management on plain Parquet.

Reproduces the reference's storage engines with Spark-native layout:

- **History** (S2) — `ReplicatedMergeTree PARTITION BY toYYYYMMDD(scrape_time)
  ORDER BY (icao24, scrape_time) TTL ...` (schema/schema-local.sql:183-187)
  → Parquet `partitionBy("scrape_date")` + `sortWithinPartitions(key, ts)`
  so row-group min/max stats give the same data skipping the sparse
  primary index gives ClickHouse. At 100 TB: date partitions prune
  time-range queries; the within-file sort on (icao24, scrape_time) keeps
  per-aircraft scans to a few row groups.
- **Current state** (S3) — `ReplacingMergeTree(scrape_time) ORDER BY icao24
  TTL 1 HOUR` (schema/schema-local.sql:370-372) → keyed upsert: merge the
  incoming batch with existing state via `latest_per_key`, atomically
  swap. State is bounded by live-key count (~12k aircraft), so this stays
  a small single-digit-MB table regardless of ingest volume.
- **TTL** (§4) — scheduled partition drops, matching
  `ttl_only_drop_parts=1`: whole `scrape_date=` directories are removed,
  never row-level rewrites.

Delta Lake would supply MERGE/txn log; it is not in this image, so state
commits use a **versioned-directory + pointer-file** scheme (the same
shape as a Delta/Iceberg snapshot commit, minus the JVM txn log):

- each upsert writes a complete new snapshot under ``<path>/v_<uuid>/``,
  then atomically repoints ``<path>/_CURRENT`` (write-temp + rename);
- readers resolve the pointer and scan that snapshot — there is never a
  window where the state directory is absent, and a snapshot a
  registered temp view is still scanning survives until GC;
- non-current snapshots are GC'd only after ``STATE_GC_GRACE_S``
  (readers re-registering views within the grace period never lose
  files);
- concurrent upserts (one IngestPipeline per source, all feeding
  combined/state) are serialized by an ``O_EXCL`` writer lock.

The interface is sink-agnostic — swapping in a Delta-backed
implementation (MERGE INTO + time travel) changes only this module.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from datetime import date, datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.latest import latest_per_key

PARTITION_COL = "scrape_date"
_POINTER = "_CURRENT"
STATE_GC_GRACE_S = 300.0  # keep superseded snapshots this long for readers
_LOCK_TIMEOUT_S = 120.0


def with_partition_col(df: DataFrame, ts: str = "scrape_time") -> DataFrame:
    """Day partition key — toYYYYMMDD(scrape_time) (schema-local.sql:184)."""
    return df.withColumn(PARTITION_COL, F.to_date(F.col(ts)))


def append_history(
    df: DataFrame,
    path: str,
    *,
    key: str = "icao24",
    ts: str = "scrape_time",
    batch_id: int | str | None = None,
) -> None:
    """S2: day-partitioned, key-ordered columnar append.

    Layout: ``<path>/batch_id=<b>/scrape_date=<d>/*.parquet``. Each
    micro-batch owns its own ``batch_id=`` directory and is written with
    OVERWRITE semantics, so a foreachBatch re-delivery (crash anywhere in
    the cascade, including mid-append) simply rewrites the same directory
    — exactly-once history counts with no commit-marker race. Ad-hoc
    batch ingests (``batch_id=None``) get a fresh uuid directory, i.e.
    plain append. Both ``batch_id`` and ``scrape_date`` surface as
    partition columns; filters on ``scrape_date`` still prune directories
    (tests/test_plans.py pins the pruned scan)."""
    seg = f"b{batch_id}" if batch_id is not None else f"adhoc-{uuid.uuid4().hex[:12]}"
    (
        with_partition_col(df, ts)
        .sortWithinPartitions(PARTITION_COL, key, ts)
        .write.mode("overwrite")
        .partitionBy(PARTITION_COL)
        .parquet(os.path.join(path, f"batch_id={seg}"))
    )


def read_history(
    spark: SparkSession,
    path: str,
    *,
    dedupe: bool = False,
    key: str = "icao24",
    ts: str = "scrape_time",
) -> DataFrame:
    """History scan (the ``batch_id`` layout column is dropped — it is a
    sink implementation detail). Batch-keyed overwrite writes make replays
    idempotent, so counts are exact without ``dedupe``; the flag is kept
    for reading pre-exactly-once layouts and cross-pipeline merges."""
    df = spark.read.parquet(path)
    if "batch_id" in df.columns:
        df = df.drop("batch_id")
    if dedupe:
        subset = [c for c in (key, ts, "ingestion_time") if c in df.columns]
        df = df.dropDuplicates(subset)
    return df


def _atomic_swap(src: str, dst: str) -> None:
    """Replace dst dir with src dir; POSIX rename is atomic per entry.
    Used by partition compaction (single-writer maintenance job); state
    commits use the snapshot+pointer protocol instead."""
    tmp_old = dst + "." + uuid.uuid4().hex
    if os.path.exists(dst):
        os.rename(dst, tmp_old)
    os.rename(src, dst)
    if os.path.exists(tmp_old):
        shutil.rmtree(tmp_old)


class _WriterLock:
    """Single-writer serialization for state commits: all four per-source
    IngestPipelines upsert the shared combined/state table, so commits
    must not interleave (ADVICE r1: concurrent read-merge-overwrite can
    drop prior state). ``O_CREAT|O_EXCL`` is atomic on POSIX and on
    object-store-backed FUSE mounts; stale locks (crashed writer) are
    broken after the timeout."""

    def __init__(self, path: str, timeout_s: float = _LOCK_TIMEOUT_S):
        self.lock_path = os.path.join(path, ".writer_lock")
        self.timeout_s = timeout_s

    def __enter__(self):
        deadline = time.monotonic() + self.timeout_s
        while True:
            try:
                fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return self
            except FileExistsError:
                if time.monotonic() > deadline:
                    try:  # stale lock from a crashed writer — break it
                        age = time.time() - os.path.getmtime(self.lock_path)
                    except OSError:
                        continue
                    if age > max(self.timeout_s * 10, 300.0):
                        os.unlink(self.lock_path)
                        continue
                    raise TimeoutError(f"writer lock held: {self.lock_path}")
                time.sleep(0.05)

    def __exit__(self, *exc):
        try:
            os.unlink(self.lock_path)
        except OSError:
            pass
        return False


def _current_version(path: str) -> str | None:
    try:
        with open(os.path.join(path, _POINTER)) as fh:
            v = fh.read().strip()
        return v or None
    except OSError:
        return None


def _current_snapshot_dir(path: str) -> str | None:
    v = _current_version(path)
    return os.path.join(path, v) if v else None


def _commit_pointer(path: str, version: str) -> None:
    tmp = os.path.join(path, f".{_POINTER}.{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        fh.write(version)
    os.replace(tmp, os.path.join(path, _POINTER))  # atomic on POSIX


def _gc_snapshots(path: str, keep: str, grace_s: float) -> None:
    """Remove superseded snapshots older than the grace period — readers
    holding the old pointer (registered temp views) keep working until
    then; after an upsert, long-lived views should be re-registered."""
    cutoff = time.time() - grace_s
    for entry in os.listdir(path):
        if not entry.startswith("v_") or entry == keep:
            continue
        full = os.path.join(path, entry)
        try:
            if os.path.getmtime(full) < cutoff:
                shutil.rmtree(full)
        except OSError:
            pass  # another GC won the race


def upsert_state(
    batch: DataFrame,
    path: str,
    *,
    key: str = "icao24",
    version: str = "scrape_time",
    ttl: str | None = "1 hour",
    now: datetime | None = None,
    gc_grace_s: float = STATE_GC_GRACE_S,
) -> None:
    """S3: ReplacingMergeTree semantics — newest `version` per `key` wins,
    an older late arrival never displaces newer state (SURVEY §2.9 ST2);
    keys whose state is older than `ttl` expire (schema-local.sql:372).

    Equivalent to Delta ``MERGE WHEN MATCHED AND b.v >= s.v THEN UPDATE``.
    Idempotent: re-applying the same batch is a no-op. Commits are
    versioned-snapshot + pointer swaps under a writer lock (module
    docstring) — readers never observe a missing or half-written state
    dir, and concurrent per-source pipelines serialize instead of
    clobbering each other.
    """
    spark = batch.sparkSession
    os.makedirs(path, exist_ok=True)
    with _WriterLock(path):
        cur = _current_snapshot_dir(path)
        candidates = batch
        if cur is not None:
            candidates = spark.read.parquet(cur).unionByName(batch)
        merged = latest_per_key(candidates, key=key, version=version)
        if ttl is not None:
            now_col = F.lit(now).cast("timestamp") if now else F.current_timestamp()
            merged = merged.filter(F.col(version) > now_col - F.expr(f"INTERVAL {ttl}"))
        new_version = "v_" + uuid.uuid4().hex
        snap = os.path.join(path, new_version)
        # state is bounded by live-key count — coalesce to avoid file sprawl
        merged.coalesce(4).write.mode("overwrite").parquet(snap)
        _commit_pointer(path, new_version)
        _gc_snapshots(path, keep=new_version, grace_s=gc_grace_s)


def read_state(spark: SparkSession, path: str) -> DataFrame:
    """Resolve the current snapshot pointer and scan it. Falls back to
    reading `path` directly for pre-versioned layouts (and to surface the
    standard missing-table error when nothing was ever committed)."""
    snap = _current_snapshot_dir(path)
    return spark.read.parquet(snap if snap else path)


def expire_history(
    spark: SparkSession, path: str, *, ttl_days: int, now: date | None = None
) -> list[str]:
    """TTL maintenance: drop whole day-partitions older than the retention
    window — `TTL scrape_time + INTERVAL n ... SETTINGS ttl_only_drop_parts=1`
    (schema/schema-local.sql:186-187). Never rewrites surviving data."""
    cutoff = (now or datetime.utcnow().date()) - timedelta(days=ttl_days)
    dropped = []
    if not os.path.isdir(path):
        return dropped
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(PARTITION_COL + "="):
            continue
        part_date = date.fromisoformat(entry.split("=", 1)[1])
        if part_date < cutoff:
            shutil.rmtree(os.path.join(path, entry))
            dropped.append(entry)
    return dropped


def compact_partition(spark: SparkSession, path: str, partition: str, *, key: str = "icao24", ts: str = "scrape_time", target_files: int = 1) -> None:
    """OPTIMIZE analogue: rewrite one day-partition into `target_files`
    key-sorted files (ClickHouse background merges keep parts sorted and
    few; we do it as an explicit maintenance call)."""
    part_path = os.path.join(path, partition)
    df = spark.read.parquet(part_path)
    tmp = part_path + ".staging." + uuid.uuid4().hex
    df.repartition(target_files).sortWithinPartitions(key, ts).write.mode(
        "overwrite"
    ).parquet(tmp)
    _atomic_swap(tmp, part_path)
