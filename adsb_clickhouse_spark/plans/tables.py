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

Delta Lake would supply MERGE/txn log; it is not in this image, so the
swap uses an atomic directory rename. The interface is sink-agnostic —
swapping in a Delta-backed implementation changes only this module.
"""

from __future__ import annotations

import os
import shutil
import uuid
from datetime import date, datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.latest import latest_per_key

PARTITION_COL = "scrape_date"


def with_partition_col(df: DataFrame, ts: str = "scrape_time") -> DataFrame:
    """Day partition key — toYYYYMMDD(scrape_time) (schema-local.sql:184)."""
    return df.withColumn(PARTITION_COL, F.to_date(F.col(ts)))


def append_history(df: DataFrame, path: str, *, key: str = "icao24", ts: str = "scrape_time") -> None:
    """S2: day-partitioned, key-ordered columnar append."""
    (
        with_partition_col(df, ts)
        .sortWithinPartitions(PARTITION_COL, key, ts)
        .write.mode("append")
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )


def read_history(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _atomic_swap(src: str, dst: str) -> None:
    """Replace dst dir with src dir; POSIX rename is atomic per entry."""
    tmp_old = dst + "." + uuid.uuid4().hex
    if os.path.exists(dst):
        os.rename(dst, tmp_old)
    os.rename(src, dst)
    if os.path.exists(tmp_old):
        shutil.rmtree(tmp_old)


def upsert_state(
    batch: DataFrame,
    path: str,
    *,
    key: str = "icao24",
    version: str = "scrape_time",
    ttl: str | None = "1 hour",
    now: datetime | None = None,
) -> None:
    """S3: ReplacingMergeTree semantics — newest `version` per `key` wins,
    an older late arrival never displaces newer state (SURVEY §2.9 ST2);
    keys whose state is older than `ttl` expire (schema-local.sql:372).

    Equivalent to Delta ``MERGE WHEN MATCHED AND b.v >= s.v THEN UPDATE``.
    Idempotent: re-applying the same batch is a no-op, which is what makes
    the streaming foreachBatch cascade exactly-once under retries.
    """
    spark = batch.sparkSession
    candidates = batch
    if os.path.exists(path):
        current = spark.read.parquet(path)
        candidates = current.unionByName(batch)
    merged = latest_per_key(candidates, key=key, version=version)
    if ttl is not None:
        now_col = F.lit(now).cast("timestamp") if now else F.current_timestamp()
        merged = merged.filter(F.col(version) > now_col - F.expr(f"INTERVAL {ttl}"))
    tmp = path + ".staging." + uuid.uuid4().hex
    # state is bounded by live-key count — coalesce to avoid file sprawl
    merged.coalesce(4).write.mode("overwrite").parquet(tmp)
    _atomic_swap(tmp, path)


def read_state(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


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
