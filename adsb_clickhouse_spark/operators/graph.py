"""Link-graph quality signals: distributed PageRank over an edge table.

Web-scale curation pipelines score DOMAINS before they score documents —
CommonCrawl-derived corpora (RefinedWeb §3.1, Gopher's quality filters)
use host-graph centrality as a trust prior, and the classic signal is
PageRank (Page et al. 1999) over the host link graph. The reference
engine has no graph operators; this is an engine-supplied extension in
the same family as the quality/selection operators.

Spark-first shape — PageRank is T rounds of (join + aggregate), nothing
more:

1. the EDGE table (the 100 TB side: the web host graph is ~10⁸ nodes and
   ~10¹⁰ edges) is joined with its out-degree table once, repartitioned
   on ``src`` and persisted — it never moves again; every iteration
   re-joins it against the node-sized rank table co-partitioned on the
   same key, so the per-iteration exchange is RANK-sized, not
   edge-sized;
2. contributions aggregate per ``dst`` (one node-sized shuffle), the
   damping base and the dangling-mass redistribution fold in as literal
   arithmetic over a broadcast one-row aggregate;
3. ranks are ``localCheckpoint``-ed per round so T iterations don't
   stack T joins into one exponential plan (same discipline as
   dedup.connected_components / bpe.learn_bpe).

Fixed-point arithmetic, deliberately: ranks are integer micro-units
(``scale`` = 10¹² by default) and every step is integer multiply +
floor-divide. Floating-point PageRank is NOT reproducible on a cluster —
a distributed float sum's addition order changes with partitioning, so
two runs of the same job (or the engine and its DuckDB oracle twin)
disagree in the last ULPs, and rank ORDER can flip for near-tied nodes.
Integer sums are associative: the same corpus gives bit-identical ranks
on any partitioning, any engine — which is what makes this operator
hash-verifiable cross-engine (the 'pagerank' branch of the
``text_quality`` oracle row) and its production runs auditable. The
quantization error is < outdeg⁻¹ micro-units per edge per round —
~10 orders of magnitude below the rank mass at the default scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 10**12
# damping 0.85 as an exact rational so both engines do the same integer ops
DAMPING_NUM = 17
DAMPING_DEN = 20


MAX_SEEDS = 10_000
# weighted mode: dn * scale * w must stay inside int64 —
# 17 * 10^12 * 10^5 = 1.7e18 < 2^63 ≈ 9.2e18
MAX_EDGE_WEIGHT = 100_000


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = PAGERANK_SCALE,
    checkpoint: bool = True,
    seeds: list | None = None,
    weight_col: str | None = None,
    driver_threshold: int | None = None,
) -> DataFrame:
    """Fixed-point PageRank over ``edges``: returns (``node``,
    ``rank_fp``) where ``rank_fp`` is the rank in integer
    ``scale``-units after ``iterations`` rounds at damping 0.85.

    Semantics (mirrored EXACTLY, floor-divisions included, by the
    unrolled-CTE DuckDB twin in queries/text.py):

    - nodes = distinct(src) ∪ distinct(dst); N = |nodes|;
    - r₀(v) = scale // N;
    - contribution of edge (u→v): (17 · r(u)) div (20 · outdeg(u));
    - dangling mass D = Σ r(u) over nodes with no out-edges,
      redistributed as (17 · D) div (20 · N) to every node;
    - r'(v) = (3 · scale) div (20 · N) + dangling share + Σ inflow(v).

    Multi-edges contribute once each (callers wanting simple-graph
    semantics dedup first — the oracle derivation does). Total mass
    drifts below ``scale`` by the accumulated floor remainders (bounded
    by edges + N per round — parts in 10⁶ at the default scale);
    deterministic, not stochastic.

    The driver-side footprint is one ``count()`` (N) per call and one
    1-row dangling-mass aggregate per round — bounded regardless of
    graph size. ``checkpoint`` governs the per-round RANK lineage only
    (the loop-invariant node/outdeg/edge tables are always pinned):
    False leaves the ranks lazy, so the plan carries 2^T copies of the
    node-sized rank chain — measurably cheaper than T eager checkpoint
    jobs for small T over small graphs, exponential poison for large T.

    ``seeds`` switches the operator to TrustRank (Gyöngyi et al., VLDB
    2004): the teleport mass — the damping base, the dangling
    redistribution, and the initial ranks — lands ONLY on the seed
    nodes (split evenly), so trust flows outward from a hand-vetted
    domain list and nodes unreachable from any seed converge to rank 0:
    the spam-demotion prior of web curation, next to unseeded
    PageRank's popularity prior. Seeds are DIMENSION data (a vetted
    list, not a corpus): they compile into the plan as an IN-list, so
    the count is enforced at ``MAX_SEEDS`` and every seed must exist in
    the graph (checked with one bounded action).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    return pagerank_multi(
        edges,
        teleports={"rank_fp": seeds},
        iterations=iterations,
        src_col=src_col,
        dst_col=dst_col,
        scale=scale,
        checkpoint=checkpoint,
        weight_col=weight_col,
        **(
            {"driver_threshold": driver_threshold}
            if driver_threshold is not None
            else {}
        ),
    )


DRIVER_EDGE_THRESHOLD = 100_000


def pagerank_multi(
    edges: DataFrame,
    *,
    teleports: dict[str, list | None],
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = PAGERANK_SCALE,
    checkpoint: bool = True,
    weight_col: str | None = None,
    driver_threshold: int = DRIVER_EDGE_THRESHOLD,
) -> DataFrame:
    """Run SEVERAL teleport distributions through ONE rank propagation:
    ``teleports`` maps an output column name to its seed list (None =
    uniform teleport, i.e. classic PageRank). Returns (``node``, one
    integer rank column per name).

    This is the batched personalized-PageRank shape: the k rank vectors
    share every join and aggregate — the per-round edge⋈rank join, the
    per-dst reduce, and the dangling-mass aggregate each run ONCE with k
    columns instead of k times with one — so evaluating PageRank and a
    TrustRank (or k per-topic teleports) costs one propagation, not k.
    All arithmetic is the fixed-point integer law of :func:`pagerank`,
    per column.

    ``weight_col`` names an INTEGER edge-weight column (link
    multiplicity in a host graph): edge (u→v, w) contributes
    (17 · r(u) · w) div (20 · W(u)) where W(u) = Σ weights out of u.
    Weights must lie in [1, ``MAX_EDGE_WEIGHT``] — validated with one
    bounded aggregate — because 17 · scale · w must stay inside int64
    for the exact integer law to hold.

    Size-adaptive, mirroring dedup.connected_components: the edge table
    is materialized ONCE (``localCheckpoint``) and counted; at or below
    ``driver_threshold`` edges the ranks come from the pure-Python
    integer twin :func:`pagerank_py` on the collected edge list — the
    SAME integer law, bit-identical output (pinned by
    tests/test_graph.py), for 3 bounded Spark jobs instead of
    ~4 + 2·T·k. Host graphs are node/edge-bounded dimension data (the
    web host graph is ~10⁸ hosts — far above the cap — but per-batch
    and per-tenant graphs routinely aren't), so the driver path is the
    common case for small graphs and the distributed iteration engages
    automatically past the cap. The up-front checkpoint also serves the
    distributed path: nodes/outdeg/eo previously re-evaluated the
    caller's edge plan three times; now each derives from the
    materialized blocks.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not teleports:
        raise ValueError("teleports must be a non-empty {name: seeds} dict")
    names = list(teleports)
    seed_lists: dict[str, list | None] = {}
    for name, seeds in teleports.items():
        if seeds is None:
            seed_lists[name] = None
            continue
        sl = list(dict.fromkeys(seeds))
        if not sl:
            raise ValueError(f"seeds for {name!r} must be non-empty when given")
        if len(sl) > MAX_SEEDS:
            raise ValueError(
                f"{len(sl)} seeds for {name!r} > MAX_SEEDS={MAX_SEEDS}; a "
                "seed set that big is not a vetted dimension list — use a "
                "broadcast-join variant"
            )
        seed_lists[name] = sl

    wcols = (
        [F.col(weight_col).cast("long").alias("_w")] if weight_col else []
    )
    # materialize the edge table once: the count decides driver-vs-
    # distributed, the weight validation reads the same blocks, and the
    # distributed path's three derived tables (nodes/outdeg/eo) no
    # longer re-evaluate the caller's edge plan each
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), *wcols
    ).localCheckpoint(eager=True)
    n_edges = e.count()
    if weight_col:
        lim = e.agg(
            F.min("_w").alias("lo"),
            F.max("_w").alias("hi"),
            F.count(F.when(F.col("_w").isNull(), F.lit(1))).alias("nulls"),
        ).collect()[0]
        if lim["nulls"]:
            # min/max skip NULLs, so a NULL weight would otherwise slip
            # through: its source node gets an outdeg row (NULL Σ) yet
            # contributes no inflow — rank mass silently vanishing,
            # diverging from the integer law and the pure-Python twin.
            raise ValueError(
                f"{lim['nulls']} NULL edge weight(s) in {weight_col!r}; "
                "weights must be non-NULL integers in "
                f"[1, {MAX_EDGE_WEIGHT}]"
            )
        if lim["lo"] is not None and (
            lim["lo"] < 1 or lim["hi"] > MAX_EDGE_WEIGHT
        ):
            raise ValueError(
                f"edge weights must lie in [1, {MAX_EDGE_WEIGHT}], got "
                f"[{lim['lo']}, {lim['hi']}] — the int64 overflow bound "
                "of the exact integer law"
            )
    if n_edges <= int(driver_threshold):
        # bounded-graph fast path: the labels come from the pure-Python
        # integer twin on the collected edge list — identical output
        # (same integer law; parity pinned in tests/test_graph.py),
        # zero iteration jobs
        rows = e.collect()
        tri = (
            [(r["src"], r["dst"], r["_w"]) for r in rows]
            if weight_col
            else [(r["src"], r["dst"]) for r in rows]
        )
        node_set = {t[0] for t in tri} | {t[1] for t in tri}
        for name in names:
            sl = seed_lists[name]
            if sl is not None:
                n_missing = sum(1 for s in sl if s not in node_set)
                if n_missing:
                    raise ValueError(
                        f"{n_missing} seed(s) for {name!r} are "
                        "not nodes of the graph"
                    )
        per_name = {
            name: pagerank_py(
                tri,
                iterations=int(iterations),
                scale=scale,
                seeds=seed_lists[name],
            )
            for name in names
        }
        from pyspark.sql.types import LongType, StructField, StructType

        # node type = the union-coerced src/dst type (plan-time only)
        node_field = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .schema["node"]
        )
        out_schema = StructType(
            [node_field] + [StructField(name, LongType()) for name in names]
        )
        data = [
            tuple([nd] + [per_name[name].get(nd, 0) for name in names])
            for nd in sorted(node_set)
        ]
        return edges.sparkSession.createDataFrame(data, out_schema)

    # loop-invariant tables are pinned ONCE regardless of `checkpoint`
    # (which governs only the per-round rank lineage): without this, the
    # dangling-mass branch re-derives outdeg — and through it the
    # caller's whole edge plan — every iteration.
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        out = nodes
        for name in names:
            out = out.withColumn(name, F.lit(0).cast("long"))
        return out
    # "outdeg" holds the out-MASS denominator: Σ weights when weighted,
    # the out-edge count otherwise
    outdeg = (
        e.groupBy("src")
        .agg(
            (F.sum("_w") if weight_col else F.count("*")).alias("outdeg")
        )
        .localCheckpoint(eager=True)
    )
    # the edge-sized table, partitioned once on src and pinned; every
    # iteration's join against ranks reuses this partitioning so only
    # the node-sized rank table moves per round
    eo = e.join(outdeg, "src").repartition("src").localCheckpoint(eager=True)

    n_ts: dict[str, int] = {}
    conds: dict[str, object] = {}
    for name in names:
        sl = seed_lists[name]
        if sl is None:
            n_ts[name] = n
            conds[name] = F.lit(True)
        else:
            n_ts[name] = len(sl)
            conds[name] = F.col("node").isin(sl)
    missing_checks = [
        (name, seed_lists[name])
        for name in names
        if seed_lists[name] is not None
    ]
    if missing_checks:
        found = nodes.agg(
            *[
                F.count(F.when(conds[name], 1)).alias(name)
                for name, _ in missing_checks
            ]
        ).collect()[0]
        for name, sl in missing_checks:
            if found[name] != len(sl):
                raise ValueError(
                    f"{len(sl) - found[name]} seed(s) for {name!r} are "
                    "not nodes of the graph"
                )

    ranks = nodes.select(
        "node",
        *[
            F.when(conds[name], F.lit(int(scale // n_ts[name])))
            .otherwise(F.lit(0))
            .cast("long")
            .alias(name)
            for name in names
        ],
    )
    for _ in range(int(iterations)):
        inflow = (
            eo.join(ranks, eo["src"] == ranks["node"])
            .select(
                "dst",
                *[
                    F.expr(
                        f"({DAMPING_NUM} * {name}{' * _w' if weight_col else ''})"
                        f" div ({DAMPING_DEN} * outdeg)"
                    ).alias(name)
                    for name in names
                ],
            )
            .groupBy("dst")
            .agg(*[F.sum(name).alias(name) for name in names])
        )
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(
                *[
                    F.coalesce(F.sum(name), F.lit(0)).alias(f"_dm_{name}")
                    for name in names
                ]
            )
        )
        joined = nodes.join(
            inflow, nodes["node"] == inflow["dst"], "left"
        ).crossJoin(F.broadcast(dangling))
        ranks = joined.select(
            "node",
            *[
                (
                    F.when(
                        conds[name],
                        F.lit(
                            ((DAMPING_DEN - DAMPING_NUM) * scale)
                            // (DAMPING_DEN * n_ts[name])
                        )
                        + F.expr(
                            f"({DAMPING_NUM} * _dm_{name}) "
                            f"div ({DAMPING_DEN} * {n_ts[name]})"
                        ),
                    ).otherwise(F.lit(0))
                    + F.coalesce(inflow[name], F.lit(0))
                )
                .cast("long")
                .alias(name)
                for name in names
            ],
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_py(
    edges: list[tuple],
    *,
    iterations: int = 5,
    scale: int = PAGERANK_SCALE,
    seeds: list | None = None,
) -> dict[object, int]:
    """Pure-Python reference twin of :func:`pagerank` for tests —
    identical integer arithmetic (incl. the TrustRank seeded-teleport
    mode and weighted (u, v, w) edges), no Spark."""
    tri = [(e[0], e[1], e[2] if len(e) > 2 else None) for e in edges]
    nodes = sorted({u for u, _, _ in tri} | {v for _, v, _ in tri})
    n = len(nodes)
    if n == 0:
        return {}
    tele = set(nodes) if seeds is None else set(seeds)
    n_t = len(tele)
    outdeg: dict[object, int] = {}
    for u, _, w in tri:
        outdeg[u] = outdeg.get(u, 0) + (1 if w is None else w)
    ranks = {v: (scale // n_t if v in tele else 0) for v in nodes}
    base = ((DAMPING_DEN - DAMPING_NUM) * scale) // (DAMPING_DEN * n_t)
    for _ in range(iterations):
        inflow: dict[object, int] = {}
        for u, v, w in tri:
            num = DAMPING_NUM * ranks[u] * (1 if w is None else w)
            inflow[v] = inflow.get(v, 0) + num // (DAMPING_DEN * outdeg[u])
        dm = sum(r for v, r in ranks.items() if v not in outdeg)
        share = (DAMPING_NUM * dm) // (DAMPING_DEN * n_t)
        ranks = {
            v: (base + share if v in tele else 0) + inflow.get(v, 0)
            for v in nodes
        }
    return ranks

def host_edges(
    docs: DataFrame,
    *,
    host_col: str = "source",
    links_col: str = "out_links",
) -> DataFrame:
    """Derive the simple host link graph from a document corpus:
    one (``src``, ``dst``) row per DISTINCT (document host → linked
    host) pair, NULLs and self-links dropped. This is the edge table
    the curation funnel's domain-reputation stage (RefinedWeb §3.1
    lineage: score hosts, then gate documents by their host's rank)
    feeds to :func:`pagerank_multi`.

    Scale shape: one explode projection + one distinct — a single
    shuffle on the (src, dst) key pair, output bounded by the number of
    unique host links (~10^10 for the full web graph), after which every
    PageRank iteration exchanges only node-sized rank tables. Distinct
    (simple-graph) semantics deliberately: multiplicity weighting is the
    caller's choice via ``weight_col`` on a pre-aggregated edge table.
    """
    return (
        docs.select(
            F.col(host_col).alias("src"),
            F.explode(F.col(links_col)).alias("dst"),
        )
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )
