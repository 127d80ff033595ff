"""Long all-stores soak with maintenance under fire (r11 verdict item 7).

100+ micro-batches through the all-stores curation funnel (exact
fingerprints, text+media band stores, text index, vector index via the
hashed embedder, host edges, observability), with:

- a full ``curate-maintain`` cycle every ``maintain_every`` batches,
- a CRASHED maintenance injected at the second cycle: an orphan
  ``gen-*`` staged-but-never-swapped directory is planted in the vector
  index (the crash-before-pointer-swap window) and the next maintain
  must GC it and converge,
- a batch KILL/REPLAY injected mid-run: a committed batch's marker is
  deleted and the batch reprocessed (the crash-before-marker
  redelivery), after which the ledger must be unchanged — one stats row
  per batch, identical admitted totals, identical curated rows.

Assertions printed as a JSON verdict (exit 1 on any violation):

- FLAT latency: median of the last 10 batches ≤ 2× the median of
  batches 5-15 (growth with store size is the failure mode; local
  scatter is why it's a 2× bound, the soak test pins 3× at 10 batches),
- LEDGER continuity: Σ admitted − Σ near-compaction drops == curated
  row count, and exactly one ingest_log row per batch,
- BOUNDED stores: after the final maintain, no store's live-segment
  count exceeds ``maintain_every`` + slack (ingest_report's alarm).

Usage: python tools/soak_streaming_curation.py [n_batches] [per_batch]
Defaults: 100 batches × 100 docs. Prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")


def _words(seed: str, n: int = 18) -> list:
    return [
        "w" + hashlib.md5(f"{seed}|{p}".encode()).hexdigest()[:6]
        for p in range(n)
    ]


def _payload(i: int) -> bytes:
    out = b""
    j = 0
    while len(out) < 640:
        out += hashlib.md5(f"soak|{i}|{j}".encode()).digest()
        j += 1
    return out[:640]


def _mk_batch(spark, b: int, per: int):
    rows = []
    for k in range(per):
        i = b * per + k
        h = (k if b == 0 and k < 8 else i) % 7
        if b == 0 and k < 8:  # planted base texts + payloads
            rows.append((i, " ".join(_words(f"base|{k}")), _payload(k),
                         f"h{h}", [f"h{(h + 1) % 7}"]))
        elif b > 0 and k < 4:  # exact resends of batch-0 bases
            h = k % 7
            rows.append((i, " ".join(_words(f"base|{k}")), _payload(k),
                         f"h{h}", [f"h{(h + 1) % 7}"]))
        elif b > 0 and k < 8:  # the SAME near-copy text every batch
            w = _words(f"base|{k}")
            w[9] = "changed"
            h = k % 7
            rows.append((i, " ".join(w), _payload(1000 + i),
                         f"h{h}", [f"h{(h + 1) % 7}"]))
        else:
            rows.append((i, " ".join(_words(f"uniq|{i}")),
                         _payload(1000 + i), f"h{h}", [f"h{(h + 1) % 7}"]))
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, payload binary, host string, "
        "out_links array<string>",
    )


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    maintain_every = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from adsb_clickhouse_spark.__main__ import main as cli
    from adsb_clickhouse_spark.session import get_spark
    from adsb_clickhouse_spark.streaming.curation import CurationIngest

    spark = get_spark("curation-soak")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="soak_")
    ing = CurationIngest(
        base, run_id="soak",
        media_dedup=True, media_near_dedup=True, text_near_dedup=True,
        text_index=True, vector_index=True, embed_dim=16, vector_n_lists=4,
        host_col="host", host_links_col="out_links",
        host_trust_seeds=["h0"],
    )
    maintain_args = [
        "curate-maintain", base,
        "--compact-index", "--compact-vectors", "--compact-bands",
        "--recompute-host-ranks", "--host-trust-seeds", "h0",
        "--host-rank-iterations", "8", "--fold-ingest-log",
        "--buckets", "4",
    ]
    lat: list[float] = []
    maintain_secs: list[float] = []
    compaction_drops = 0
    violations: list[str] = []
    replay_done = False
    try:
        for b in range(n_batches):
            t0 = time.perf_counter()
            ing.process_batch(_mk_batch(spark, b, per), batch_id=b)
            lat.append(round(time.perf_counter() - t0, 2))

            if b > 0 and (b + 1) % maintain_every == 0:
                if (b + 1) == 2 * maintain_every:
                    # CRASHED-MAINTENANCE injection: a fold that staged
                    # its new generation but died before the pointer
                    # swap leaves an orphan gen-* dir; the next maintain
                    # must GC it, not resurrect or trip over it
                    orphan = os.path.join(
                        ing.vector_index_path, "gen-deadbeefcrash"
                    )
                    os.makedirs(os.path.join(orphan, "vectors"), exist_ok=True)
                pre = ing.curated(spark).count()
                t0 = time.perf_counter()
                rc = cli(maintain_args + ["--near-dedup"])
                maintain_secs.append(round(time.perf_counter() - t0, 1))
                if rc != 0:
                    violations.append(f"maintain rc={rc} at batch {b}")
                compaction_drops += pre - ing.curated(spark).count()
                if os.path.isdir(
                    os.path.join(ing.vector_index_path, "gen-deadbeefcrash")
                ):
                    violations.append("orphan generation not GC'd")

            if b == n_batches // 2 and not replay_done:
                # KILL/REPLAY injection: crash-before-marker redelivery
                # of the batch just committed — the ledger must converge
                admitted_pre = ing.ingest_report(spark)["admitted"]
                rows_pre = ing.curated(spark).count()
                os.remove(ing._marker(f"bsoak-{b}"))
                ing.process_batch(_mk_batch(spark, b, per), batch_id=b)
                rep = ing.ingest_report(spark)
                if rep["admitted"] != admitted_pre:
                    violations.append(
                        f"replay changed admitted: {admitted_pre} -> {rep['admitted']}"
                    )
                if ing.curated(spark).count() != rows_pre:
                    violations.append("replay changed curated rows")
                replay_done = True

        # final maintain so the bounded-store check sees steady state
        rc = cli(maintain_args)
        if rc != 0:
            violations.append(f"final maintain rc={rc}")

        rep = ing.ingest_report(spark, max_live_segments=maintain_every + 5)
        n_curated = ing.curated(spark).count()
        early = statistics.median(lat[5:15])
        late = statistics.median(lat[-10:])
        if late > 2.0 * early:
            violations.append(f"latency grew {early} -> {late}")
        if rep["n_batches"] != n_batches:
            violations.append(f"ledger rows {rep['n_batches']} != {n_batches}")
        if rep["admitted"] - compaction_drops != n_curated:
            violations.append(
                f"ledger mismatch: admitted {rep['admitted']} - "
                f"compaction {compaction_drops} != curated {n_curated}"
            )
        if rep["segment_alarms"]:
            violations.append(f"segment alarms: {rep['segment_alarms']}")

        out = {
            "n_batches": n_batches,
            "per_batch_docs": per,
            "latency_first": lat[0],
            "latency_early_median": early,
            "latency_late_median": late,
            "latency_max": max(lat),
            "maintain_secs": maintain_secs,
            "admitted_total": rep["admitted"],
            "compaction_drops": compaction_drops,
            "curated_rows": n_curated,
            "live_segments": rep["live_segments"],
            "violations": violations,
        }
        print(json.dumps(out))
        return 1 if violations else 0
    finally:
        for tbl in (ing._store_table_name(), ing._band_table_name(),
                    ing._text_band_table_name()):
            if tbl:
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
