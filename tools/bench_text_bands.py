"""Scale probe for the streaming TEXT near-dedup band store
(streaming/curation.py, text_near_dedup=True): per-batch latency must
stay flat as the stored corpus grows — the probe is one equi-join on the
single bkey long (bucketed on exactly that key after compaction) plus a
signature-agreement verify that never touches corpus text.

Setup: N synthetic ~31-token documents are shingled/minhashed (one
corpus pass) and their (bkey, sig) band rows written as ``n_segments``
committed ``batch_id=`` segments. The probe pushes the SAME 5k-doc
batch (2% planted near-copies of stored docs — one token swapped, true
Jaccard ≈ 0.81 over w=3 shingles) through the full funnel three ways:
empty store, raw segments, compacted bkey-bucketed table.

Expected suppression is the LSH S-CURVE, not 100%: with k=16, b=4,
r=4, P[≥1 shared band] = 1 − (1 − J⁴)⁴ ≈ 0.90 at J = 0.81 (measured:
exactly 90/100) — the same recall law as the batch operator's banding;
the signature-agreement verify at k=16 is not the binding factor
(Binomial(16, 0.81) < 8 has ~1e-3 tail). Asserted ≥ 80/100.

Usage: python tools/bench_text_bands.py [n_docs] [n_segments]
Defaults: 300_000 docs over 50 segments. Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

N_BATCH = 5_000
N_PLANTED = 100

VOCAB = ["river", "bridge", "stone", "market", "compiler", "register",
         "harbor", "tide", "ferry", "meadow", "falcon", "granite",
         "loom", "copper", "ledger", "orchard", "cider", "quarry",
         "signal", "anchor", "barrel", "spindle", "mortar", "lantern"]


def _texts_df(spark, lo: int, n: int, *, copy_of=None):
    def gen(it):
        import hashlib

        import pandas as pd

        for pdf in it:
            texts = []
            for did in pdf["id"]:
                src = copy_of(int(did)) if copy_of else None
                seed = src if src is not None else int(did)
                # md5-mixed token stream: genuinely independent token
                # sequences across seeds AND positions (a structured
                # arithmetic mix measured 5.7% of random pairs at
                # J >= 0.5 — doubled tokens collapse the shingle space),
                # so the ONLY near-dups in play are the planted ones
                toks = [
                    VOCAB[
                        int(
                            hashlib.md5(f"{seed}|{j}".encode()).hexdigest()[:8],
                            16,
                        ) % len(VOCAB)
                    ]
                    for j in range(30)
                ]
                toks.append(f"rare{seed % 50_000}")
                if src is not None:
                    toks[7] = "swapped"  # one-token perturbation
                texts.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": pdf["id"], "text": texts})

    return spark.range(lo, lo + n).repartition(32).mapInPandas(
        gen, "doc_id long, text string"
    )


def main() -> int:
    # --k32: the tighter operating point (k=32/bands=8 — steeper LSH
    # S-curve, double the signature/band volume); default is the
    # r10 law (k=16/bands=4)
    k32 = "--k32" in sys.argv[1:]
    argv = [a for a in sys.argv[1:] if a != "--k32"]
    K, BANDS = (32, 8) if k32 else (16, 4)
    n_docs = int(argv[0]) if argv else 300_000
    n_segments = int(argv[1]) if len(argv) > 1 else 50

    from pyspark.sql import functions as F

    from adsb_clickhouse_spark.operators.dedup import minhash_band_rows
    from adsb_clickhouse_spark.session import get_spark
    from adsb_clickhouse_spark.streaming.curation import CurationIngest

    spark = get_spark("bench-text-bands")
    spark.sparkContext.setLogLevel("ERROR")

    def copy_of(did: int):
        k = did - 2_000_000
        return 1_000_000 + k if 0 <= k < N_PLANTED else None

    batch = _texts_df(spark, 2_000_000, N_BATCH, copy_of=copy_of).localCheckpoint(
        eager=True
    )
    batch.count()

    seed_bands = minhash_band_rows(
        _texts_df(spark, 1_000_000, n_docs), id_col="doc_id", k=K, bands=BANDS
    ).select(
        "bkey", "sig", (F.col("id") % n_segments).cast("string").alias("__seg")
    )

    walls, out = {}, {}

    def _run(tag: str, seed: bool, compact: bool) -> None:
        base = tempfile.mkdtemp(prefix=f"textbands_{tag}_")
        try:
            ing = CurationIngest(
                base, run_id="p", text_near_dedup=True,
                text_minhash_k=K, text_bands=BANDS,
            )
            if seed:
                (
                    seed_bands.withColumn(
                        "batch_id", F.concat(F.lit("seed-"), F.col("__seg"))
                    )
                    .drop("__seg")
                    .write.mode("overwrite")
                    .partitionBy("batch_id")
                    .parquet(ing.text_bands_path)
                )
                for i in range(n_segments):
                    ing._write_marker(f"seed-{i}")
            if compact:
                stats = ing.compact_text_bands(spark)
                assert stats["folded_segments"] == n_segments, stats
            t0 = time.time()
            ing.process_batch(batch, batch_id=0)
            walls[tag] = round(time.time() - t0, 1)
            kept = ing.curated(spark).count()
            out[f"kept_{tag}"] = kept
            if seed:
                suppressed = N_BATCH - kept
                # LSH S-curve recall ≈ 0.90 at the planted J (see module doc)
                assert suppressed >= int(N_PLANTED * 0.8), (tag, suppressed)
            else:
                assert kept == N_BATCH, (tag, kept)
            tbl = ing._text_band_table_name()
            if tbl:
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        finally:
            shutil.rmtree(base, ignore_errors=True)

    _run("empty", seed=False, compact=False)
    _run("segments", seed=True, compact=False)
    _run("compacted", seed=True, compact=True)

    print(json.dumps({
        "n_docs_stored": n_docs,
        "n_segments": n_segments,
        "minhash_k": K,
        "bands": BANDS,
        "batch_docs": N_BATCH,
        "planted_near_copies": N_PLANTED,
        "batch_sec_empty_store": walls["empty"],
        "batch_sec_segment_store": walls["segments"],
        "batch_sec_compacted_store": walls["compacted"],
        **out,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
