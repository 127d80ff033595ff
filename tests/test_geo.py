"""Geospatial proximity operators (operators/geo.py): grid-bucketed
pair join and broadcast points-in-radius, verified against brute-force
haversine on corpora planted with the geometric edge cases — cell
boundaries, the antimeridian seam, and near-polar latitudes."""

import math
import random

import pytest

from adsb_clickhouse_spark.operators import geo as G


def _hav_nm(lat1, lon1, lat2, lon2):
    a = (
        math.sin(math.radians(lat2 - lat1) / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(math.radians(lon2 - lon1) / 2) ** 2
    )
    return 2 * G.EARTH_RADIUS_NM * math.asin(math.sqrt(a))


def _brute_pairs(rows, radius, same_bucket=False, diff_user=False):
    out = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            if same_bucket and a[3] != b[3]:
                continue
            if diff_user and a[4] == b[4]:
                continue
            if _hav_nm(a[1], a[2], b[1], b[2]) <= radius:
                out.add((min(a[0], b[0]), max(a[0], b[0])))
    return out


def _corpus(n=250, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        # clustered so some pairs actually fall within radius
        clat = rng.choice([-80.0, -30.0, 0.0, 45.0, 88.9])
        clon = rng.choice([-179.9, -60.0, 0.0, 120.0, 179.9])
        rows.append(
            (
                i,
                max(-89.99, min(89.99, clat + rng.uniform(-0.4, 0.4))),
                ((clon + rng.uniform(-0.4, 0.4) + 180) % 360) - 180,
                rng.randint(0, 1),  # bucket
                rng.randint(0, 9),  # user
            )
        )
    return rows


SCHEMA = "id long, lat double, lon double, hb int, user_id int"


def test_proximity_pairs_matches_bruteforce(spark):
    rows = _corpus()
    collected = G.proximity_pairs(
        spark.createDataFrame(rows, SCHEMA), radius_nm=15.0
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in collected}
    assert got == _brute_pairs(rows, 15.0)
    # multiplicity: exactly-once emission, not just the right pair SET
    assert len(collected) == len(got)


def test_proximity_pairs_bucket_and_exclude(spark):
    rows = _corpus(seed=11)
    got = G.proximity_pairs(
        spark.createDataFrame(rows, SCHEMA),
        radius_nm=15.0,
        bucket_cols=("hb",),
        exclude_same=("user_id",),
        carry_cols=("user_id",),
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == _brute_pairs(
        rows, 15.0, same_bucket=True, diff_user=True
    )
    assert len(got) == len({(r["id_a"], r["id_b"]) for r in got})
    by_id = {r[0]: r for r in rows}
    for r in got:
        assert r["user_id_a"] == by_id[r["id_a"]][4]
        assert r["user_id_b"] == by_id[r["id_b"]][4]
        assert r["user_id_a"] != r["user_id_b"]


def test_proximity_antimeridian_and_pole(spark):
    rows = [
        (0, 10.0, 179.95, 0, 0),
        (1, 10.0, -179.95, 0, 1),   # ~6 nm across the seam
        (2, 89.5, 0.0, 0, 2),
        (3, 89.5, 80.0, 0, 3),      # ~39 nm around the pole's parallel chord
        (4, -10.0, 0.0, 0, 4),      # far from everything
    ]
    collected = G.proximity_pairs(
        spark.createDataFrame(rows, SCHEMA), radius_nm=40.0
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["dist_nm"] for r in collected}
    assert set(got) == _brute_pairs(rows, 40.0)
    assert (0, 1) in got and (2, 3) in got
    # lat 89.5 clamps k to the full parallel — exactly the regime where
    # the pre-fix sequence(-k, k) emitted duplicate rows; check counts
    assert len(collected) == len(got)


def test_proximity_no_duplicate_rows_near_pole(spark):
    # regression: (89.9, 0) vs (89.9, 180) are ~12 nm apart over the pole;
    # the 0.25-degree grid (radius 15 nm) gives n_x=1440 (even) and the
    # half-width clamp k=720, where sequence(-k, k) has n_x+1 offsets and
    # pmod collides -k with +k — the pair used to be emitted twice.
    rows = [(0, 89.9, 0.0, 0, 0), (1, 89.9, 180.0, 0, 1)]
    collected = G.proximity_pairs(
        spark.createDataFrame(rows, SCHEMA), radius_nm=15.0
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in collected] == [(0, 1)]


def test_proximity_cell_boundary_pair(spark):
    # radius 15 nm → cell 0.25°; plant a pair straddling a cell edge at
    # distance just under the radius, and a pair just over it
    rows = [
        (0, 0.2499, 50.0, 0, 0),
        (1, 0.2501 + 0.20, 50.0, 0, 1),  # Δlat ≈ 0.2002° ≈ 12.0 nm
        (2, 20.0, 7.0, 0, 2),
        (3, 20.26, 7.0, 0, 3),           # Δlat 0.26° ≈ 15.6 nm > radius
    ]
    got = {
        (r["id_a"], r["id_b"])
        for r in G.proximity_pairs(
            spark.createDataFrame(rows, SCHEMA), radius_nm=15.0
        ).collect()
    }
    assert (0, 1) in got and (2, 3) not in got


def test_proximity_cell_deg_validation(spark):
    df = spark.createDataFrame([(0, 0.0, 0.0, 0, 0)], SCHEMA)
    with pytest.raises(ValueError, match="cell_deg"):
        G.proximity_pairs(df, radius_nm=30.0, cell_deg=0.4)  # < 0.5°


def test_proximity_hot_cell_valve(spark):
    # 20 aircraft parked on one apron + one en-route pair elsewhere
    rows = [(i, 40.0001 + i * 1e-5, -73.0, 0, i) for i in range(20)]
    rows += [(100, 10.0, 10.0, 0, 100), (101, 10.01, 10.0, 0, 101)]
    df = spark.createDataFrame(rows, SCHEMA)
    assert G.proximity_pairs(df, radius_nm=15.0).count() == 190 + 1
    got = {
        (r["id_a"], r["id_b"])
        for r in G.proximity_pairs(df, radius_nm=15.0, max_cell_freq=10).collect()
    }
    assert got == {(100, 101)}  # apron pairs priced away, en-route kept


def test_points_in_radius_matches_bruteforce(spark):
    rows = _corpus(seed=23)
    centers = [(0, 0.05, 0.05), (1, 88.95, 100.0), (2, 10.0, -179.99)]
    pdf = spark.createDataFrame(rows, SCHEMA)
    cdf = spark.createDataFrame(centers, "center_id long, lat double, lon double")
    got = {
        (r["id"], r["center_id"])
        for r in G.points_in_radius(pdf, cdf, radius_nm=30.0).collect()
    }
    want = {
        (p[0], c[0])
        for p in rows
        for c in centers
        if _hav_nm(p[1], p[2], c[1], c[2]) <= 30.0
    }
    assert got == want
    assert any(c == 1 for _, c in got) or not any(
        _hav_nm(p[1], p[2], 88.95, 100.0) <= 30.0 for p in rows
    )


def test_points_in_radius_broadcasts_centers(spark):
    pdf = spark.createDataFrame(_corpus(n=50), SCHEMA)
    cdf = spark.createDataFrame([(0, 0.0, 0.0)], "center_id long, lat double, lon double")
    plan = G.points_in_radius(pdf, cdf, radius_nm=30.0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_points_in_radius_center_cap_trips(spark):
    # the dimension-table contract is enforced: a centers side above the
    # cap raises instead of broadcasting a corpus to every executor
    pdf = spark.createDataFrame(_corpus(n=10), SCHEMA)
    cdf = spark.createDataFrame(
        [(i, float(i % 80), float(i % 170)) for i in range(5)],
        "center_id long, lat double, lon double",
    )
    with pytest.raises(ValueError, match="max_centers"):
        G.points_in_radius(pdf, cdf, radius_nm=30.0, max_centers=3)
    assert G.points_in_radius(pdf, cdf, radius_nm=30.0, max_centers=5) is not None


def test_geo_layout_stored_probe_matches_and_prunes(spark, tmp_path):
    """Stored coarse-grid layout: the from-disk probe returns exactly the
    full-scan points_in_radius result, and the coarse-cell filter reaches
    the scan as a PartitionFilter (the ANN-layout discipline)."""
    import os

    rows = _corpus(seed=31, n=300)
    pdf = spark.createDataFrame(rows, SCHEMA)
    centers = [(0, 0.05, 0.05), (1, 45.2, 120.1), (2, -80.0, -60.0)]
    cdf = spark.createDataFrame(centers, "center_id long, lat double, lon double")
    path = str(tmp_path / "geo_layout")
    G.write_geo_layout(pdf, path, cell_deg=5.0, sort_col="id")

    stored = G.points_in_radius_stored(
        spark, path, cdf, radius_nm=30.0, cell_deg=5.0
    )
    full = G.points_in_radius(pdf, cdf, radius_nm=30.0)
    got = sorted((r["id"], r["center_id"]) for r in stored.collect())
    want = sorted((r["id"], r["center_id"]) for r in full.collect())
    assert got == want and got  # non-vacuous
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "geo_cell" in plan.split("PartitionFilters")[1][:200]
    # prune is physical: far more cell directories exist than are probed
    n_dirs = sum(1 for e in os.listdir(path) if e.startswith("geo_cell="))
    n_probed = len(
        G._touched_coarse_cells([(c[1], c[2]) for c in centers], 30.0, 5.0)
    )
    assert n_probed < n_dirs or n_dirs <= 9  # tiny corpora may be compact


def test_geo_layout_cell_too_fine_raises(spark, tmp_path):
    cdf = spark.createDataFrame([(0, 0.0, 0.0)], "center_id long, lat double, lon double")
    with pytest.raises(ValueError, match="cell_deg"):
        G.points_in_radius_stored(
            spark, str(tmp_path / "x"), cdf, radius_nm=600.0, cell_deg=5.0
        )


def test_proximity_pair_join_never_broadcasts_probe(spark):
    """The pair join's physical plan must be a shuffled join with the
    unexploded side as build — Catalyst's Generate node passes the
    child's sizeInBytes through un-multiplied, so without the
    shuffle_hash pin the planner can estimate the exploded probe side
    under the broadcast threshold and attempt to broadcast the exploded
    corpus (observed: 9.2 GiB at 2M reports clustered at lat 85°)."""
    pdf = spark.createDataFrame(_corpus(seed=17), SCHEMA)
    plan = (
        G.proximity_pairs(pdf, radius_nm=15.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" not in plan and "BroadcastNestedLoop" not in plan
    assert "ShuffledHashJoin" in plan


# -- geofence containment (points_in_polygons) --------------------------


def _pip_brute(lat, lon, verts):
    """Pure-Python even-odd ray casting, same arithmetic as the operator."""
    n = len(verts)
    inside = False
    for i in range(n):
        y1, x1 = verts[i]
        y2, x2 = verts[(i + 1) % n]
        if (y1 > lat) != (y2 > lat) and lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


POLYS = {
    "convex": [(10.0, 10.0), (30.0, 12.0), (28.0, 35.0), (8.0, 30.0)],
    # concave chevron: the notch re-enters, so bbox alone over-matches
    "chevron": [(-40.0, -60.0), (-20.0, -60.0), (-30.0, -45.0),
                (-20.0, -30.0), (-40.0, -30.0)],
    "triangle": [(50.0, 100.0), (70.0, 110.0), (52.0, 130.0)],
}


def test_points_in_polygons_matches_bruteforce(spark):
    rng = random.Random(23)
    rows = []
    for i in range(600):
        # half the points sampled near polygon bboxes so interiors,
        # notches, and edges all get real coverage
        if i % 2 == 0:
            verts = POLYS[rng.choice(list(POLYS))]
            ys = [v[0] for v in verts]; xs = [v[1] for v in verts]
            lat = rng.uniform(min(ys) - 3, max(ys) + 3)
            lon = rng.uniform(min(xs) - 3, max(xs) + 3)
        else:
            lat, lon = rng.uniform(-89, 89), rng.uniform(-179, 179)
        rows.append((i, lat, lon))
    pdf = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = {
        (r["id"], r["poly_id"])
        for r in G.points_in_polygons(pdf, POLYS).collect()
    }
    want = {
        (i, pid)
        for (i, lat, lon) in rows
        for pid, verts in POLYS.items()
        if _pip_brute(lat, lon, verts)
    }
    assert got == want and want  # non-vacuous
    # sanity: the chevron notch actually excluded some bbox-interior point
    notch_misses = [
        (i, lat, lon) for (i, lat, lon) in rows
        if -40 < lat < -20 and -60 < lon < -30
        and not _pip_brute(lat, lon, POLYS["chevron"])
    ]
    assert notch_misses


def test_points_in_polygons_plan_is_scan_only(spark):
    """Containment compiles into the plan: no join, no exchange, no
    Python — a pure whole-stage-codegen projection over the scan."""
    pdf = spark.createDataFrame([(0, 20.0, 20.0)], "id long, lat double, lon double")
    plan = (
        G.points_in_polygons(pdf, POLYS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("Join", "Exchange", "EvalPython"):
        assert bad not in plan
    assert "Generate explode" in plan


def test_points_in_polygons_contracts(spark):
    pdf = spark.createDataFrame([(0, 0.0, 0.0)], "id long, lat double, lon double")
    with pytest.raises(ValueError, match="max_vertices"):
        G.points_in_polygons(
            pdf, {"big": [(float(i), float(i)) for i in range(40)]},
            max_vertices=10,
        )
    with pytest.raises(ValueError, match="fewer than 3"):
        G.points_in_polygons(pdf, {"line": [(0.0, 0.0), (1.0, 1.0)]})

def _pip_brute_rings(lat, lon, rings):
    """Even-odd parity over all rings (outer + holes)."""
    crossings = 0
    for verts in rings:
        n = len(verts)
        for i in range(n):
            y1, x1 = verts[i]
            y2, x2 = verts[(i + 1) % n]
            if (y1 > lat) != (y2 > lat) and lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
                crossings += 1
    return crossings % 2 == 1


HOLED = {
    # square zone with a square exclusion hole in the middle
    "donut": [
        [(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0)],
        [(7.0, 7.0), (13.0, 7.0), (13.0, 13.0), (7.0, 13.0)],
    ],
    # plain ring alongside, exercising the mixed flat/ringed dict
    "plain": [(40.0, 40.0), (50.0, 42.0), (48.0, 55.0), (38.0, 52.0)],
}


def test_points_in_polygons_hole_excludes_interior(spark):
    """A point inside a hole ring is OUTSIDE the zone (even-odd parity:
    odd outer crossings + odd hole crossings = even); points between the
    rings are inside; the flat-list format still works in the same call."""
    rows = [
        (0, 10.0, 10.0),   # dead centre of the hole -> excluded
        (1, 3.0, 3.0),     # between outer and hole -> included
        (2, 7.5, 10.0),    # just inside the hole edge -> excluded
        (3, 6.5, 10.0),    # just outside the hole edge -> included
        (4, 25.0, 10.0),   # outside the outer ring entirely
        (5, 45.0, 47.0),   # inside the plain single-ring polygon
    ]
    pdf = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = {
        (r["id"], r["poly_id"])
        for r in G.points_in_polygons(pdf, HOLED).collect()
    }
    assert got == {(1, "donut"), (3, "donut"), (5, "plain")}


def test_points_in_polygons_multi_ring_matches_bruteforce(spark):
    rng = random.Random(31)
    rows = [
        (i, rng.uniform(-5.0, 25.0), rng.uniform(-5.0, 25.0))
        for i in range(400)
    ]
    pdf = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = {
        (r["id"], r["poly_id"])
        for r in G.points_in_polygons(pdf, HOLED).collect()
        if r["poly_id"] == "donut"
    }
    want = {
        (i, "donut")
        for (i, lat, lon) in rows
        if _pip_brute_rings(lat, lon, HOLED["donut"])
    }
    assert got == want and want
    # non-vacuous: some bbox-interior points actually fell in the hole
    in_hole = [
        (i, lat, lon) for (i, lat, lon) in rows
        if 7 < lat < 13 and 7 < lon < 13
    ]
    assert in_hole and all((i, "donut") not in got for i, *_ in in_hole)


def test_points_in_polygons_multi_ring_plan_still_scan_only(spark):
    pdf = spark.createDataFrame([(0, 10.0, 10.0)], "id long, lat double, lon double")
    plan = (
        G.points_in_polygons(pdf, HOLED)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("Join", "Exchange", "EvalPython"):
        assert bad not in plan


def test_points_in_polygons_disjoint_outer_rings(spark):
    """TWO DISJOINT outer rings under one id: parity is odd inside
    either, and the bbox prune must span BOTH rings — a rings[0]-only
    box would silently drop points in the second ring (r10 advice)."""
    archipelago = {
        "arch": [
            [(0.0, 0.0), (5.0, 0.0), (5.0, 5.0), (0.0, 5.0)],
            # second outer ring entirely OUTSIDE the first ring's bbox
            [(20.0, 20.0), (25.0, 20.0), (25.0, 25.0), (20.0, 25.0)],
        ],
    }
    rows = [
        (0, 2.5, 2.5),    # inside ring 1
        (1, 22.5, 22.5),  # inside ring 2 (outside ring 1's bbox)
        (2, 12.0, 12.0),  # between the rings -> outside
        (3, 22.5, 2.5),   # ring 2's lats, ring 1's lons -> outside
    ]
    pdf = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = {
        (r["id"], r["poly_id"])
        for r in G.points_in_polygons(pdf, archipelago).collect()
    }
    assert got == {(0, "arch"), (1, "arch")}
    # brute-force parity agrees on every probe
    for i, lat, lon in rows:
        assert _pip_brute_rings(lat, lon, archipelago["arch"]) == (
            (i, "arch") in got
        )


def test_points_in_polygons_bad_ring_raises(spark):
    pdf = spark.createDataFrame([(0, 0.0, 0.0)], "id long, lat double, lon double")
    with pytest.raises(ValueError, match="fewer than 3"):
        G.points_in_polygons(
            pdf, {"z": [[(0.0, 0.0), (5.0, 0.0), (5.0, 5.0)], [(1.0, 1.0), (2.0, 2.0)]]}
        )
