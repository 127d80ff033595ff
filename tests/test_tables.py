"""History/state table management (SURVEY §2.1 S2/S3, §4 TTL)."""

from __future__ import annotations

import os
from datetime import date, datetime, timedelta

from pyspark.sql import functions as F

from adsb_clickhouse_spark.plans import tables

NOW = datetime(2026, 1, 15, 12, 0, 0)


def _df(spark, rows):
    return spark.createDataFrame(rows, "icao24 string, scrape_time timestamp, v int")


def test_history_day_partitioned(spark, tmp_base):
    path = os.path.join(tmp_base, "hist")
    rows = [
        ("a", NOW, 1),
        ("a", NOW - timedelta(days=1), 2),
        ("b", NOW - timedelta(days=40), 3),
    ]
    tables.append_history(_df(spark, rows), path)
    parts = sorted(e for e in os.listdir(path) if e.startswith("scrape_date="))
    assert parts == [
        "scrape_date=2025-12-06",
        "scrape_date=2026-01-14",
        "scrape_date=2026-01-15",
    ]
    # partition pruning: a date filter must not scan all partitions
    df = tables.read_history(spark, path).filter(F.col("scrape_date") == "2026-01-15")
    assert df.count() == 1


def test_history_ttl_drops_whole_partitions(spark, tmp_base):
    path = os.path.join(tmp_base, "hist")
    rows = [("a", NOW, 1), ("b", NOW - timedelta(days=40), 2)]
    tables.append_history(_df(spark, rows), path)
    dropped = tables.expire_history(spark, path, ttl_days=30, now=date(2026, 1, 15))
    assert dropped == ["scrape_date=2025-12-06"]
    assert tables.read_history(spark, path).count() == 1


def test_state_upsert_replacing_semantics(spark, tmp_base):
    path = os.path.join(tmp_base, "state")
    tables.upsert_state(_df(spark, [("a", NOW - timedelta(minutes=5), 1)]), path, ttl="1 hour", now=NOW)
    # newer row replaces
    tables.upsert_state(_df(spark, [("a", NOW, 2)]), path, ttl="1 hour", now=NOW)
    # late (older) row must NOT displace — ST2 argmax semantics
    tables.upsert_state(_df(spark, [("a", NOW - timedelta(minutes=1), 3)]), path, ttl="1 hour", now=NOW)
    out = tables.read_state(spark, path).collect()
    assert len(out) == 1 and out[0]["v"] == 2


def test_state_upsert_idempotent(spark, tmp_base):
    """Re-applying a batch (retried micro-batch) converges — exactly-once."""
    path = os.path.join(tmp_base, "state")
    batch = _df(spark, [("a", NOW, 1), ("b", NOW, 2)])
    tables.upsert_state(batch, path, ttl="1 hour", now=NOW)
    before = sorted(map(tuple, tables.read_state(spark, path).collect()))
    tables.upsert_state(batch, path, ttl="1 hour", now=NOW)
    after = sorted(map(tuple, tables.read_state(spark, path).collect()))
    assert before == after


def test_state_ttl_expires_old_keys(spark, tmp_base):
    path = os.path.join(tmp_base, "state")
    tables.upsert_state(
        _df(spark, [("live", NOW, 1), ("gone", NOW - timedelta(hours=2), 2)]),
        path, ttl="1 hour", now=NOW,
    )
    out = tables.read_state(spark, path).collect()
    assert [r["icao24"] for r in out] == ["live"]


def test_state_commit_is_versioned_snapshot_plus_pointer(spark, tmp_base):
    """The commit protocol: every upsert writes a new v_* snapshot and
    repoints _CURRENT; superseded snapshots survive the GC grace period so
    a reader holding the old pointer never loses files mid-scan."""
    path = os.path.join(tmp_base, "state")
    tables.upsert_state(_df(spark, [("a", NOW, 1)]), path, ttl=None, now=NOW)
    old_snap = tables._current_snapshot_dir(path)
    # a long-lived reader (registered view) resolves the current snapshot
    old_reader = spark.read.parquet(old_snap)
    tables.upsert_state(_df(spark, [("a", NOW + timedelta(minutes=1), 2)]), path, ttl=None, now=NOW)
    new_snap = tables._current_snapshot_dir(path)
    assert new_snap != old_snap
    # new readers see the new state; the old snapshot is still scannable
    assert tables.read_state(spark, path).collect()[0]["v"] == 2
    assert old_reader.collect()[0]["v"] == 1
    assert os.path.isdir(old_snap)  # within GC grace
    snaps = [e for e in os.listdir(path) if e.startswith("v_")]
    assert len(snaps) == 2
    # zero-grace GC removes the superseded snapshot on the next commit
    tables.upsert_state(
        _df(spark, [("a", NOW + timedelta(minutes=2), 3)]), path, ttl=None, now=NOW,
        gc_grace_s=0.0,
    )
    snaps = [e for e in os.listdir(path) if e.startswith("v_")]
    assert len(snaps) == 1


def test_state_writer_lock_serializes(tmp_base):
    path = os.path.join(tmp_base, "state")
    os.makedirs(path, exist_ok=True)
    import pytest

    with tables._WriterLock(path, timeout_s=0.2):
        with pytest.raises(TimeoutError):
            with tables._WriterLock(path, timeout_s=0.2):
                pass
    # released — can acquire again
    with tables._WriterLock(path, timeout_s=0.2):
        pass


def test_compact_partition(spark, tmp_base):
    path = os.path.join(tmp_base, "hist")
    for i in range(3):
        tables.append_history(_df(spark, [("a", NOW, i)]), path)
    part = "scrape_date=2026-01-15"
    n_files = len([f for f in os.listdir(os.path.join(path, part)) if f.endswith(".parquet")])
    assert n_files >= 3
    tables.compact_partition(spark, path, part, target_files=1)
    n_files = len([f for f in os.listdir(os.path.join(path, part)) if f.endswith(".parquet")])
    assert n_files == 1
    assert tables.read_history(spark, path).count() == 3
