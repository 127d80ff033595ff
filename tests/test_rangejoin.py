"""Bucketized interval join (operators/rangejoin.py): DuckDB BETWEEN
parity on fuzzed inputs (the oracle-parity pytest pattern — the driver
registry is at its 50-row cap), exactly-once pair production, left-join
semantics, and the no-nested-loop plan pin."""

import duckdb

from adsb_clickhouse_spark.operators.rangejoin import interval_join


def _fuzz(seed, n_points=400, n_intervals=120, span=10_000):
    import random

    rng = random.Random(seed)
    pts = [(i, rng.randrange(span)) for i in range(n_points)]
    ivs = []
    for j in range(n_intervals):
        s = rng.randrange(span)
        ln = rng.choice([0, 1, rng.randrange(5), rng.randrange(200), rng.randrange(3000)])
        ivs.append((j, s, s + ln))
    return pts, ivs


def _duck(pts, ivs, how="inner"):
    con = duckdb.connect()
    con.execute("CREATE TABLE p(pid BIGINT, x BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pts)
    con.execute("CREATE TABLE i(iid BIGINT, s BIGINT, e BIGINT)")
    con.executemany("INSERT INTO i VALUES (?, ?, ?)", ivs)
    join = "JOIN" if how == "inner" else "LEFT JOIN"
    return sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT pid, iid FROM p {join} i ON p.x BETWEEN i.s AND i.e"
        ).fetchall()
    )


def _spark_pairs(spark, pts, ivs, how="inner", **kw):
    p = spark.createDataFrame(pts, "pid long, x long")
    i = spark.createDataFrame(ivs, "iid long, s long, e long")
    out = interval_join(
        p, i, point_col="x", start_col="s", end_col="e", how=how, **kw
    )
    return sorted((r["pid"], r["iid"]) for r in out.select("pid", "iid").collect())


def test_matches_duckdb_between_join_fuzzed(spark):
    for seed in (1, 2, 3):
        pts, ivs = _fuzz(seed)
        assert _spark_pairs(spark, pts, ivs) == _duck(pts, ivs), seed
    # width sensitivity: any positive width gives the same answer
    pts, ivs = _fuzz(7)
    want = _duck(pts, ivs)
    for w in (1, 17, 500, 1_000_000):
        assert _spark_pairs(spark, pts, ivs, bucket_width=w) == want, w


def test_left_join_keeps_unmatched_points(spark):
    pts = [(0, 5), (1, 50), (2, 999)]
    ivs = [(0, 4, 6), (1, 40, 60)]
    got = _spark_pairs(spark, pts, ivs, how="left")
    assert got == _duck(pts, ivs, how="left")
    assert (2, None) in got


def test_inclusive_bounds_and_exactly_once(spark):
    # point on both boundaries; interval spanning many buckets must not
    # duplicate the pair
    pts = [(0, 10), (1, 20), (2, 15)]
    ivs = [(0, 10, 20)]
    got = _spark_pairs(spark, pts, ivs, bucket_width=2)
    assert got == [(0, 0), (1, 0), (2, 0)]


def test_plan_has_no_nested_loop(spark):
    pts, ivs = _fuzz(9)
    p = spark.createDataFrame(pts, "pid long, x long")
    i = spark.createDataFrame(ivs, "iid long, s long, e long")
    out = interval_join(p, i, point_col="x", start_col="s", end_col="e")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    # the naive formulation, for contrast, IS a nested loop
    naive = p.join(i, (p["x"] >= i["s"]) & (p["x"] <= i["e"]))
    nplan = naive._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" in nplan or "Cartesian" in nplan
