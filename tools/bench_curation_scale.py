"""Scale probe for the composed curation pipeline
(operators/curation.py::curate_documents): N synthetic documents with
planted near/exact duplicates (the bench_dedup_scale corpus, which the
MinHash stage's planted-recall numbers are calibrated on) pushed through
the full funnel — scrub → langid → quality → near-dedup → pack — with
end-to-end wall time and per-stage counts.

With ``--full`` the round-6 stages run too: domain-mixture rebalance
over a synthetic skewed source column (90/9/1% web/books/wiki),
duplicated-substring excision of the survivors (k=8), and leakage-free
split assignment keyed on the near-dup components (one survivor per
component by construction — the no-straddling invariant itself is
pinned by tests/test_curation.py); the probe reports split sizes and
total excised tokens.

With ``--gates`` the round-7 CCNet perplexity gate runs inside the
funnel instead: 2% of docs are rewritten as fluent-looking junk from
an alien vocabulary (they PASS the heuristic quality gates), a 1%
clean sample acts as the LM reference corpus, and the probe reports
how many junk docs survive the lm_bucket filter (should be ~0: every
alien bigram is unseen, so junk ties at the uniform-score maximum and
the strict-threshold rule sinks it to tail).

With ``--media`` (round 9) every doc carries a 640-byte binary payload:
1% are byte-exact copies of their neighbor's payload, 1% are perceptual
near-copies (first block forced to 0xFF — blockhash hamming <= 3 against
the original, verified at generation scale in tests), the rest unique
random bytes. The funnel runs with ``media_col='payload'`` and the probe
reports how many planted media copies the component graph collapsed
(expected: all of them) and the end-to-end wall time with the media
stage on.

With ``--graph`` (round 10) every doc gets a host (10k hosts, power-law
doc counts) and an out-link list over the host universe; 2% of hosts
form a spam ring linking only each other, unreachable from the 50
vetted trust seeds. The funnel runs with the domain-reputation stage on
the clock — host-edge derivation, one pagerank_multi propagation
(PageRank + TrustRank, 5 iterations), broadcast rank join, trust gate —
and the probe reports how many spam-host docs survive (expected 0) and
the end-to-end wall with the graph stage on.

Usage: python tools/bench_curation_scale.py [n_docs] [--full|--gates|--media|--graph]
Prints one JSON line; headline numbers live in README's measured scale
behavior table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    flags = ("--full", "--gates", "--media", "--graph", "--no-fuse")
    args = [a for a in sys.argv[1:] if a not in flags]
    full = "--full" in sys.argv[1:]
    no_fuse = "--no-fuse" in sys.argv[1:]  # A/B: the pre-r11 self-join idiom
    gates = "--gates" in sys.argv[1:]
    media = "--media" in sys.argv[1:]
    graph = "--graph" in sys.argv[1:]
    n = int(args[0]) if args else 1_000_000

    from pyspark.sql import functions as F

    from bench_dedup_scale import make_corpus

    from adsb_clickhouse_spark.operators.curation import curate_documents
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("curation-scale")
    corpus = make_corpus(spark, n).withColumn("lang", F.lit("en"))
    if full:
        corpus = corpus.withColumn(
            "source",
            F.when(F.col("doc_id") % 100 < 90, "web")
            .when(F.col("doc_id") % 100 < 99, "books")
            .otherwise("wiki"),
        )
    if gates:
        junk = ("zorp blix quux fendle wark jibber flonk trazzle mimsy "
                "borogove wabe gyre gimble tove rath outgrabe snicker snack "
                "vorpal frumious bandersnatch tulgey uffish manxome ")
        corpus = corpus.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 50 == 3,
                F.concat(F.lit(junk), F.col("doc_id").cast("string")),
            ).otherwise(F.col("text")),
        )
    if media:
        # synthetic payloads, Arrow-batched: doc_id%100==1 -> byte-exact
        # copy of (doc_id-1)'s payload; %100==3 -> perceptual near-copy
        # (first blockhash block forced to 0xFF, hamming <= 3); else
        # unique random bytes (cross-pair hamming ~32, min ~21 measured)
        import pandas as pd
        from pyspark.sql import types as T

        def gen(it):
            import numpy as np

            for pdf in it:
                payloads = []
                for did in pdf["doc_id"]:
                    src = did - 1 if did % 100 in (1, 3) else did
                    rs = np.random.RandomState(int(src) % (2**31))
                    px = rs.randint(0, 256, 640).astype(np.uint8)
                    if did % 100 == 3:
                        px[:5] = 255
                    payloads.append(px.tobytes())
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

        pay = corpus.select("doc_id").mapInPandas(
            gen,
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("payload", T.BinaryType()),
                ]
            ),
        )
        corpus = corpus.join(pay, "doc_id")
    if graph:
        # 10k hosts; doc->host is power-law-ish (quadratic fold of a
        # multiplicative hash so low host ids get many docs); hosts h
        # with h%50==7 form the spam ring (each links only its ring
        # successor), everyone else links "forward" to 3 smaller-id
        # hosts, and host 0..49 are the vetted seeds
        n_hosts = 10_000
        h = (F.col("doc_id") * 2654435761) % (n_hosts * n_hosts)
        host_id = F.floor(F.sqrt(h.cast("double"))).cast("long") % n_hosts
        corpus = corpus.withColumn("host_id", host_id).withColumn(
            "host",
            F.when(
                F.col("host_id") % 50 == 7,
                F.concat(F.lit("spam"), F.col("host_id").cast("string")),
            ).otherwise(F.concat(F.lit("h"), F.col("host_id").cast("string"))),
        )
        spam_next = (F.col("host_id") + 50) % n_hosts  # ring successor (also %50==7)
        corpus = corpus.withColumn(
            "out_links",
            F.when(
                F.col("host_id") % 50 == 7,
                F.array(F.concat(F.lit("spam"), spam_next.cast("string"))),
            ).otherwise(
                # pseudo-random 3-out-degree digraph: trust percolates
                # from the 50 seeds to (nearly) the whole non-spam web
                # within 5 iterations; spam names never appear here, so
                # the ring stays unreachable
                F.array(
                    *[
                        F.concat(
                            F.lit("h"),
                            (
                                (F.col("host_id") * 2654435761 + F.lit(k))
                                % n_hosts
                            ).cast("string"),
                        )
                        for k in (1, 2, 3)
                    ]
                )
            ),
        ).drop("host_id")
    corpus = corpus.persist()
    corpus.count()  # materialize: probe timing excludes generation

    extra = (
        dict(
            apply_domain_mixture=True,
            mixture_alpha=0.5,
            mixture_budget_frac=0.6,
            remove_dup_substrings=8,
            assign_splits=True,
        )
        if full
        else {}
    )
    if gates:
        extra["lm_reference"] = corpus.filter(
            (F.col("doc_id") % 97 == 11) & (F.col("doc_id") % 50 != 3)
        ).select("doc_id", "text")
        extra["lm_n_buckets"] = 4096
    if media:
        extra["media_col"] = "payload"
        extra["media_max_band_freq"] = 10_000
    if graph:
        extra["host_col"] = "host"
        extra["host_links_col"] = "out_links"
        # 50 vetted seeds drawn from hosts that provably have out-links
        # (pagerank_multi enforces every seed is a graph node)
        extra["host_trust_seeds"] = [
            r["host"]
            for r in corpus.filter(
                ~F.col("host").startswith("spam") & (F.col("host") != "h0")
            )
            .select("host")
            .distinct()
            .orderBy("host")
            .limit(50)
            .collect()
        ]
    t0 = time.time()
    res = curate_documents(
        corpus,
        min_quality=0.1,
        dedup_threshold=0.5,
        pack_budget=2048,
        fuse_projective=not no_fuse,
        **extra,
    )
    funnel = res.funnel()
    # force the packed stage fully (funnel's max(pack_id) already ran the
    # prefix-sum job; count the rows too so the full output materializes)
    funnel["packed_rows"] = res.packed.count()
    out = {"n_docs": n, "full": full, "gates": gates, "media": media,
           "graph": graph, "fused": not no_fuse, **funnel}
    if media:
        # planted media copies are the HIGHER id of each (i-1, i) pair;
        # min_id retention must have condemned exactly those still in
        # the filtered set (text policies may have dropped some first)
        dropped_df = res.dropped_dups.select(F.col("id").alias("doc_id"))
        fil_ids = res.filtered.select("doc_id")
        planted = fil_ids.filter((F.col("doc_id") % 100).isin(1, 3)).join(
            fil_ids.select((F.col("doc_id") + 1).alias("doc_id")),
            "doc_id",
            "left_semi",  # the copied partner (i-1) must also be in play
        )
        out["media_planted_pairs_in_filtered"] = planted.count()
        out["media_planted_dropped"] = planted.join(
            dropped_df, "doc_id", "left_semi"
        ).count()
    if graph:
        spam_docs = corpus.filter(F.col("host").startswith("spam"))
        out["spam_host_docs"] = spam_docs.count()
        out["spam_docs_surviving_trust_gate"] = res.filtered.join(
            spam_docs.select("doc_id"), "doc_id", "left_semi"
        ).count()
        out["hosts_ranked"] = res.scored.filter(
            F.col("host_pagerank_fp").isNotNull()
        ).select("doc_id").count()
    if gates:
        kept_junk = res.filtered.filter(F.col("doc_id") % 50 == 3).count()
        n_junk = corpus.filter(F.col("doc_id") % 50 == 3).count()
        out["junk_planted"] = n_junk
        out["junk_surviving_lm_gate"] = kept_junk
    if full:
        splits = {
            r["split"]: r["n"]
            for r in res.packed.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        out["split_sizes"] = splits
        out["excised_tokens"] = int(
            res.packed.agg(F.sum("n_dup_tokens")).collect()[0][0] or 0
        )
    wall = time.time() - t0
    out["wall_sec"] = round(wall, 1)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
