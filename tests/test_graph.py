"""PageRank (operators/graph.py): Spark vs the pure-Python integer twin,
structural sanity, and the plan contract."""

import pytest
from pyspark.sql import functions as F

from adsb_clickhouse_spark.operators.graph import (
    PAGERANK_SCALE,
    pagerank,
    pagerank_py,
)


def _run(spark, edges, iterations=5):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, iterations=iterations).collect()
    }
    want = pagerank_py(edges, iterations=iterations)
    return got, want


def test_pagerank_matches_python_twin_exactly(spark):
    # chain + cycle + dangling node + a hub with many in-links
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("d", "hub"), ("e", "hub"), ("f", "hub"), ("g", "hub"),
        ("hub", "a"),
        ("a", "sink"),  # sink has no out-edges: dangling mass path
    ]
    got, want = _run(spark, edges)
    assert got == want  # bit-exact: integer arithmetic both sides


def test_pagerank_hub_outranks_leaves(spark):
    edges = [(f"leaf{i}", "hub") for i in range(8)] + [("hub", "leaf0")]
    got, _ = _run(spark, edges, iterations=3)
    assert got["hub"] == max(got.values())
    assert got["hub"] > got["leaf1"]


def test_pagerank_mass_conservation_bound(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    got, want = _run(spark, edges, iterations=4)
    assert got == want
    total = sum(got.values())
    # floor drift only: within (edges + N) units per round of scale
    assert PAGERANK_SCALE - (len(edges) + 4) * 4 * 4 <= total <= PAGERANK_SCALE


def test_pagerank_multi_edges_count_per_row(spark):
    # documented semantics: a doubled edge contributes twice
    single, _ = _run(spark, [("a", "b"), ("a", "c")], iterations=2)
    doubled, want = _run(
        spark, [("a", "b"), ("a", "b"), ("a", "c")], iterations=2
    )
    assert doubled == want
    assert doubled["b"] > single["b"]


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df, iterations=2).collect() == []


def test_pagerank_rejects_zero_iterations(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)


def test_pagerank_per_iteration_exchange_is_rank_sized(spark):
    """Plan contract: with checkpointing off, the edge-side scan feeds
    the per-iteration join through its pinned repartition("src") —
    ranks move, edges don't re-shuffle per round. driver_threshold=0
    forces the DISTRIBUTED path (r15: small graphs take the driver
    twin by default)."""
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c")], "src string, dst string"
    )
    plan = pagerank(
        df, iterations=2, checkpoint=False, driver_threshold=0
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_driver_and_distributed_paths_agree(spark):
    """r15 size-adaptive split: the driver twin (default for small
    graphs) and the distributed iteration (forced via
    driver_threshold=0) must be bit-identical — unweighted, seeded,
    and weighted modes, all also equal to pagerank_py."""
    from adsb_clickhouse_spark.operators.graph import pagerank_multi

    edges = [
        ("seed", "a"), ("a", "b"), ("b", "seed"), ("a", "sink"),
        ("x", "y"), ("y", "x"), ("b", "x"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    kwargs = dict(teleports={"pr": None, "tr": ["seed"]}, iterations=4)
    drv = {
        r["node"]: (r["pr"], r["tr"])
        for r in pagerank_multi(df, **kwargs).collect()
    }
    dist = {
        r["node"]: (r["pr"], r["tr"])
        for r in pagerank_multi(df, driver_threshold=0, **kwargs).collect()
    }
    assert drv == dist
    assert {k: v[0] for k, v in drv.items()} == pagerank_py(edges, iterations=4)
    assert {k: v[1] for k, v in drv.items()} == pagerank_py(
        edges, iterations=4, seeds=["seed"]
    )

    wedges = [("a", "b", 3), ("b", "a", 2), ("a", "c", 1), ("c", "b", 5)]
    wdf = spark.createDataFrame(wedges, "src string, dst string, w long")
    got_drv = {
        r["node"]: r["rank_fp"]
        for r in pagerank(wdf, iterations=3, weight_col="w").collect()
    }
    got_dist = {
        r["node"]: r["rank_fp"]
        for r in pagerank(
            wdf, iterations=3, weight_col="w", driver_threshold=0
        ).collect()
    }
    assert got_drv == got_dist == pagerank_py(wedges, iterations=3)


# ---------------------------------------------------------------- trustrank


def test_trustrank_matches_python_twin_exactly(spark):
    edges = [
        ("seed", "a"), ("a", "b"), ("b", "seed"),
        ("spamhub", "spam1"), ("spam1", "spamhub"),
        ("a", "sink"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, iterations=4, seeds=["seed"]).collect()
    }
    want = pagerank_py(edges, iterations=4, seeds=["seed"])
    assert got == want


def test_trustrank_unreachable_spam_cluster_gets_zero(spark):
    """The TrustRank property: nodes with no path from any seed hold
    rank 0 exactly (integer arithmetic — no epsilon leakage)."""
    edges = [
        ("seed", "a"), ("a", "b"),
        ("spamhub", "spam1"), ("spam1", "spamhub"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, iterations=5, seeds=["seed"]).collect()
    }
    assert got["spamhub"] == 0 and got["spam1"] == 0
    assert got["seed"] > 0 and got["a"] > 0 and got["b"] > 0
    # (no hop-distance rank inequality asserted: a 3-node chain whose
    # tail is dangling OSCILLATES at small fixed iteration counts — the
    # bit-exact twin test above pins the arithmetic instead)
    assert got == pagerank_py(edges, iterations=5, seeds=["seed"])


def test_trustrank_seed_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="not nodes"):
        pagerank(df, seeds=["nope"])
    with pytest.raises(ValueError, match="non-empty"):
        pagerank(df, seeds=[])
    from adsb_clickhouse_spark.operators.graph import MAX_SEEDS

    with pytest.raises(ValueError, match="MAX_SEEDS"):
        pagerank(df, seeds=[f"s{i}" for i in range(MAX_SEEDS + 1)])


def test_pagerank_multi_matches_single_runs_bit_exactly(spark):
    """The batched propagation (k rank columns through one set of
    joins) must equal k independent single runs — per column, bit
    exact."""
    from adsb_clickhouse_spark.operators.graph import pagerank_multi

    edges = [
        ("seed", "a"), ("a", "b"), ("b", "seed"), ("a", "sink"),
        ("x", "y"), ("y", "x"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    both = {
        r["node"]: (r["pr"], r["tr"])
        for r in pagerank_multi(
            df, teleports={"pr": None, "tr": ["seed"]}, iterations=4
        ).collect()
    }
    pr = pagerank_py(edges, iterations=4)
    tr = pagerank_py(edges, iterations=4, seeds=["seed"])
    assert {k: v[0] for k, v in both.items()} == pr
    assert {k: v[1] for k, v in both.items()} == tr


def test_pagerank_multi_validates_each_teleport(spark):
    from adsb_clickhouse_spark.operators.graph import pagerank_multi

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="non-empty"):
        pagerank_multi(df, teleports={})
    with pytest.raises(ValueError, match="'bad'"):
        pagerank_multi(df, teleports={"ok": None, "bad": ["zz"]})


def test_pagerank_randomized_graphs_match_twin(spark):
    """10 seeded random digraphs (with dangling nodes, cycles, self-ish
    structure, multi-edges) through BOTH modes — every rank bit-equal
    to the pure-Python integer twin. Broad-net law check in the spirit
    of test_property_textops."""
    import random

    from adsb_clickhouse_spark.operators.graph import pagerank_multi

    rng = random.Random(20260815)
    for trial in range(10):
        n = rng.randint(2, 12)
        m = rng.randint(1, 24)
        edges = [
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}")
            for _ in range(m)
        ]
        edges = [(u, v) for u, v in edges if u != v] or [("n0", "n1")]
        nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
        seeds = [nodes[0]]
        iters = rng.randint(1, 4)
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r["node"]: (r["pr"], r["tr"])
            for r in pagerank_multi(
                df, teleports={"pr": None, "tr": seeds}, iterations=iters
            ).collect()
        }
        pr = pagerank_py(edges, iterations=iters)
        tr = pagerank_py(edges, iterations=iters, seeds=seeds)
        assert {k: v[0] for k, v in got.items()} == pr, (trial, edges)
        assert {k: v[1] for k, v in got.items()} == tr, (trial, edges)


# ------------------------------------------------------------------ weighted


def test_weighted_pagerank_matches_twin_exactly(spark):
    edges = [
        ("a", "b", 3), ("a", "c", 1), ("b", "a", 2),
        ("c", "hub", 5), ("b", "hub", 1), ("hub", "a", 1),
        ("a", "sink", 1),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, iterations=4, weight_col="w").collect()
    }
    assert got == pagerank_py(edges, iterations=4)


def test_weighted_unit_weights_equal_unweighted(spark):
    """w=1 everywhere must reproduce the unweighted law bit-exactly
    (the denominator becomes the out-edge count)."""
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    unw = spark.createDataFrame(pairs, "src string, dst string")
    wdf = spark.createDataFrame(
        [(u, v, 1) for u, v in pairs], "src string, dst string, w long"
    )
    got_u = {r["node"]: r["rank_fp"] for r in pagerank(unw, iterations=3).collect()}
    got_w = {
        r["node"]: r["rank_fp"]
        for r in pagerank(wdf, iterations=3, weight_col="w").collect()
    }
    assert got_u == got_w


def test_weighted_heavier_edge_gets_more_mass(spark):
    edges = [("s", "x", 9), ("s", "y", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, iterations=2, weight_col="w").collect()
    }
    assert got["x"] > got["y"]
    assert got == pagerank_py(edges, iterations=2)


def test_weighted_rejects_out_of_range_weights(spark):
    from adsb_clickhouse_spark.operators.graph import MAX_EDGE_WEIGHT

    bad = spark.createDataFrame(
        [("a", "b", 0)], "src string, dst string, w long"
    )
    with pytest.raises(ValueError, match="weights must lie"):
        pagerank(bad, weight_col="w")
    big = spark.createDataFrame(
        [("a", "b", MAX_EDGE_WEIGHT + 1)], "src string, dst string, w long"
    )
    with pytest.raises(ValueError, match="weights must lie"):
        pagerank(big, weight_col="w")

def test_weighted_rejects_null_weights(spark):
    """min/max skip NULLs, so without an explicit NULL count a NULL (or
    all-NULL) weight column would pass validation while its source
    node's rank mass silently vanished (NULL outdeg joins, no inflow) —
    diverging from the integer law and from pagerank_py."""
    some_null = spark.createDataFrame(
        [("a", "b", 2), ("b", "a", None)], "src string, dst string, w long"
    )
    with pytest.raises(ValueError, match="NULL edge weight"):
        pagerank(some_null, weight_col="w")
    all_null = spark.createDataFrame(
        [("a", "b", None), ("b", "a", None)], "src string, dst string, w long"
    )
    with pytest.raises(ValueError, match="NULL edge weight"):
        pagerank(all_null, weight_col="w")
