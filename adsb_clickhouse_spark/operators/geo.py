"""Geospatial proximity operators for position-report streams.

The reference's ADS-B schema stores per-aircraft positions
(`schema/schema-local.sql` lat/lon columns) and its dashboards slice them
by area; the natural heavy query over such data — "which pairs of
aircraft came within R nautical miles of each other" — is a distance
self-join that no built-in Spark operator expresses without a cartesian
product. This module supplies it with the same candidate-generation
physics as the banded text/phash dedup families, transplanted to 2D:

1. bucket every point into a lat/lon grid cell at least as coarse as the
   radius (one integer pair, pure codegen arithmetic);
2. explode ONE side to its neighborhood — ±1 cell in latitude (degrees of
   latitude are distance-uniform) and a latitude-dependent ±k in
   longitude (degrees of longitude shrink by cos(lat), so k grows toward
   the poles and is clamped to half the grid circumference, at which
   point the neighborhood covers the full parallel and recall survives
   even at the pole);
3. equi-join the exploded side against exact cells — plus any caller
   bucket columns (an hour bucket turns the join into per-hour conflict
   detection) — and verify each candidate with the exact haversine.

Correctness does not depend on the grid: the grid only has to be a
superset generator (the ±1/±k spans are derived as upper bounds on the
lat/lon separation of any pair within the radius, with one extra cell of
slack for cell-boundary alignment and the asin() convexity of the true
longitude bound), and the haversine filter is exact. At 100 TB the one
corpus-sized exchange is the (bucket, cell) equi-join; hot cells — every
aircraft parked on the same airport apron — are the skew regime, handled
by the same ``max_cell_freq`` valve as the text families: a (bucket,
cell) key carried by more than the cap is dropped from BOTH sides before
the join, bounding per-key fan-out at freq², and AQE's skew split
absorbs what remains under the cap.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_NM = 3440.065
POLE_GUARD_DEG = 89.9999


def haversine_nm(lat1, lon1, lat2, lon2):
    """Great-circle distance in nautical miles as a JVM-side column —
    the exact expression shape used by the stateful tracker
    (streaming/stateful.py) and the adsb_track_distance oracle, so both
    engines associate identically."""
    a = (
        F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)
    )
    return 2 * EARTH_RADIUS_NM * F.asin(F.sqrt(a))


def grid_cells(
    df: DataFrame,
    *,
    cell_deg: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Attach integer grid-cell coordinates (``cy``, ``cx``): ``cy`` is
    the floor-divided latitude band, ``cx`` the longitude band wrapped
    modulo the grid circumference so that −180/+180 are neighbors. The
    seam cell may be narrower than ``cell_deg`` when it doesn't divide
    360 evenly — over-coverage only; verification is exact."""
    n_x = math.ceil(360.0 / cell_deg)
    return df.withColumn(
        "cy", F.floor(F.col(lat_col) / F.lit(cell_deg)).cast("int")
    ).withColumn(
        "cx",
        F.pmod(F.floor(F.col(lon_col) / F.lit(cell_deg)).cast("int"), F.lit(n_x)),
    )


def _lon_halfwidth_cells(lat_expr, rlat_deg: float, s: float, n_x: int):
    """Per-row longitude neighborhood half-width in cells: an upper bound
    on the longitude separation of any pair within the radius given one
    endpoint's latitude — rlat_deg / cos(|lat|+rlat_deg) degrees, the
    worst case being the pair's more poleward edge — then ceil'd to
    cells, +1 slack for cell-boundary alignment and the asin() convexity
    of the exact bound, clamped to half the grid (full-parallel coverage
    near the poles, where cos → 0 would otherwise explode it)."""
    lat_edge = F.least(F.abs(lat_expr) + F.lit(rlat_deg), F.lit(POLE_GUARD_DEG))
    return F.least(
        F.ceil(F.lit(rlat_deg) / (F.cos(F.radians(lat_edge)) * F.lit(s))) + 1,
        F.lit(n_x // 2),
    ).cast("int")


def _explode_neighborhood(df: DataFrame, k, n_x: int) -> DataFrame:
    """Fan each row out to its 3×(2k+1) neighborhood cells: ±1 latitude
    band, ±k longitude bands with modular wrap at the grid seam.

    The offset sequence's upper end is capped at ``n_x - 1 - k`` so the
    offsets map to DISTINCT cells on the parallel: with ``k`` clamped to
    ``n_x // 2`` and even ``n_x``, a naive ``sequence(-k, k)`` yields
    ``n_x + 1`` offsets and ``pmod`` collides ``-k`` with ``+k`` — the
    probe lands twice in the antipodal cell and a near-polar pair is
    emitted twice. Capped, the full-parallel regime emits exactly
    ``n_x`` offsets (one per cell) and sub-clamp widths are unchanged
    (``n_x - 1 - k > k`` there)."""
    return (
        df.withColumn("_dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn(
            "_dx", F.explode(F.sequence(-k, F.least(k, F.lit(n_x - 1) - k)))
        )
        .withColumn("cy", F.col("cy") + F.col("_dy"))
        .withColumn("cx", F.pmod(F.col("cx") + F.col("_dx"), F.lit(n_x)))
        .drop("_dy", "_dx")
    )


def proximity_pairs(
    points: DataFrame,
    *,
    radius_nm: float,
    cell_deg: float | None = None,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    bucket_cols: tuple[str, ...] = (),
    carry_cols: tuple[str, ...] = (),
    exclude_same: tuple[str, ...] = (),
    max_cell_freq: int | None = None,
) -> DataFrame:
    """All pairs of points within ``radius_nm`` great-circle nautical
    miles (and in the same ``bucket_cols`` slice), without a cartesian
    product. Returns (``id_a``, ``id_b``, ``dist_nm``) with
    ``id_a < id_b``, plus ``{c}_a``/``{c}_b`` for every ``carry_cols``
    column; ``exclude_same`` columns must DIFFER between the two points
    (e.g. ``("user_id",)`` drops an aircraft's self-proximity to its own
    later reports).

    ``cell_deg`` defaults to the radius in latitude degrees and must not
    be smaller (the ±1 latitude-neighbor guarantee needs it). Fan-out is
    3·(2k+1) cells per probe row — 9 at the equator for the default cell
    size, growing only where cos(lat) shrinks. Only the probe side is
    exploded; the build side keeps one row per point, so a pair (a<b) is
    emitted exactly once, by a's neighborhood covering b's cell.
    """
    rlat_deg = radius_nm / 60.0
    s = cell_deg if cell_deg is not None else rlat_deg
    if s < rlat_deg:
        raise ValueError(
            f"cell_deg must be >= the radius in latitude degrees "
            f"({rlat_deg:.6f}), got {s}"
        )
    n_x = math.ceil(360.0 / s)

    cols = [F.col(id_col).alias("_pid"), F.col(lat_col).alias("_plat"),
            F.col(lon_col).alias("_plon")]
    cols += [F.col(c) for c in dict.fromkeys(bucket_cols + carry_cols + exclude_same)]
    base = grid_cells(
        points.select(*cols), cell_deg=s, lat_col="_plat", lon_col="_plon"
    )

    if max_cell_freq is not None:
        # hot-cell valve: drop (bucket, cell) HOME keys carried by more
        # rows than the cap BEFORE the join — freq² fan-out per key
        # otherwise. Unlike the multi-band phash valve there is no
        # redundancy here (each point has exactly one home cell), so any
        # pair with EITHER endpoint homed in a hot cell is dropped —
        # including pairs whose other endpoint sits in a cold adjacent
        # cell. The cap prices away the mega-cluster (airport apron) AND
        # its immediate fringe; callers needing the fringe must raise
        # the cap.
        keys = list(bucket_cols) + ["cy", "cx"]
        hot = (
            base.groupBy(*keys)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > int(max_cell_freq))
            .select(*keys)
        )
        base = base.join(hot, keys, "left_anti")

    probe = _explode_neighborhood(
        base, _lon_halfwidth_cells(F.col("_plat"), rlat_deg, s, n_x), n_x
    )

    join_keys = list(bucket_cols) + ["cy", "cx"]
    cond = [F.col(f"x.{c}") == F.col(f"y.{c}") for c in join_keys]
    cond.append(F.col("x._pid") < F.col("y._pid"))
    cond += [F.col(f"x.{c}") != F.col(f"y.{c}") for c in exclude_same]
    out = [
        F.col("x._pid").alias("id_a"),
        F.col("y._pid").alias("id_b"),
        haversine_nm(
            F.col("x._plat"), F.col("x._plon"), F.col("y._plat"), F.col("y._plon")
        ).alias("dist_nm"),
    ]
    out += [F.col(f"x.{c}").alias(f"{c}_a") for c in carry_cols]
    out += [F.col(f"y.{c}").alias(f"{c}_b") for c in carry_cols]
    # Pin the shuffled hash join with the UNEXPLODED side as build: the
    # probe side is 3·(2k+1)× the corpus, but Catalyst's Generate node
    # passes the child's sizeInBytes through un-multiplied, so the
    # planner may estimate the exploded side under the broadcast
    # threshold and try to SHIP THE EXPLODED CORPUS to every executor —
    # at 2M reports clustered at lat 85° (k≈13, fan 81×) the attempted
    # broadcast is 9.2 GiB and the job dies; at 100 TB it's absurd. The
    # hint keeps the documented plan: both sides exchange on
    # (bucket, cy, cx), base is hashed per-partition.
    return (
        probe.alias("x")
        .join(base.alias("y").hint("shuffle_hash"), on=cond)
        .select(*out)
        .filter(F.col("dist_nm") <= F.lit(float(radius_nm)))
    )


def _coarse_cell_expr(lat_col: str, lon_col: str, cell_deg: float):
    """Single-int coarse grid cell id: (cy − cy_min)·n_x + cx. Used as
    the partition key of the stored geo layout — one directory per
    coarse cell, at most ceil(180/s)·ceil(360/s) of them (2,664 at the
    default 5°)."""
    n_x = math.ceil(360.0 / cell_deg)
    cy_min = math.floor(-90.0 / cell_deg)
    cy = F.floor(F.col(lat_col) / F.lit(cell_deg)).cast("int")
    cx = F.pmod(F.floor(F.col(lon_col) / F.lit(cell_deg)).cast("int"), F.lit(n_x))
    return ((cy - F.lit(cy_min)) * n_x + cx).cast("int")


def write_geo_layout(
    points: DataFrame,
    path: str,
    *,
    cell_deg: float = 5.0,
    lat_col: str = "lat",
    lon_col: str = "lon",
    sort_col: str | None = None,
) -> None:
    """Persist positions partitioned by COARSE grid cell — the stored
    half of the dashboard geo probes, same discipline as the ANN
    ``bucket``/``list_id`` layouts (operators/layout.py): at 100 TB a
    "points near these sites" probe must be a partition-pruned scan of
    the touched cells, never a corpus scan + filter. The coarse cell
    (default 5° ≈ 300 nm of latitude) bounds directory count at ~2.7k
    while keeping the pruned fraction ≈ (touched cells)/(n cells)."""
    from .layout import write_ann_layout

    df = points.withColumn(
        "geo_cell", _coarse_cell_expr(lat_col, lon_col, cell_deg)
    )
    write_ann_layout(df, path, key_col="geo_cell", sort_col=sort_col)


def _touched_coarse_cells(
    centers: list[tuple[float, float]], radius_nm: float, cell_deg: float
) -> list[int]:
    """Driver-side twin of the probe-side neighborhood explode, at the
    coarse cell size: every coarse cell that can hold a point within
    ``radius_nm`` of any center (±1 latitude band, latitude-dependent
    ±k longitude bands, same clamp arithmetic as _lon_halfwidth_cells /
    _explode_neighborhood — including the n_x−1−k cap that keeps the
    full-parallel regime duplicate-free). Centers are a dimension table
    (points_in_radius's enforced contract), so this is bounded work."""
    n_x = math.ceil(360.0 / cell_deg)
    cy_min = math.floor(-90.0 / cell_deg)
    rlat = radius_nm / 60.0
    cells: set[int] = set()
    for lat, lon in centers:
        cy0 = math.floor(lat / cell_deg)
        cx0 = math.floor(lon / cell_deg) % n_x
        lat_edge = min(abs(lat) + rlat, POLE_GUARD_DEG)
        k = min(
            int(math.ceil(rlat / (math.cos(math.radians(lat_edge)) * cell_deg)))
            + 1,
            n_x // 2,
        )
        hi = min(k, n_x - 1 - k)
        for dy in (-1, 0, 1):
            for dx in range(-k, hi + 1):
                cells.add((cy0 + dy - cy_min) * n_x + (cx0 + dx) % n_x)
    return sorted(cells)


def points_in_radius_stored(
    spark,
    path: str,
    centers: DataFrame,
    *,
    radius_nm: float,
    cell_deg: float = 5.0,
    lat_col: str = "lat",
    lon_col: str = "lon",
    center_id_col: str = "center_id",
    max_centers: int = 100_000,
) -> DataFrame:
    """``points_in_radius`` against a stored geo layout: collect the
    (bounded, contract-enforced) centers, list the coarse cells their
    neighborhoods touch, read ONLY those partitions (the isin filter
    reaches the scan as a PartitionFilter — plan-pinned in
    tests/test_geo.py), then run the exact broadcast join on the pruned
    scan. Probe cost is proportional to touched/total cells of the
    corpus regardless of corpus size."""
    if cell_deg < radius_nm / 60.0:
        raise ValueError(
            f"cell_deg must be >= the radius in latitude degrees "
            f"({radius_nm / 60.0:.6f}), got {cell_deg}"
        )
    from .layout import probe_ann_layout

    crows = centers.limit(int(max_centers) + 1).select(
        F.col(center_id_col), F.col(lat_col), F.col(lon_col)
    ).collect()
    if len(crows) > max_centers:
        raise ValueError(
            f"centers has more than max_centers={max_centers} rows; "
            "not a dimension table — probe per-cell instead"
        )
    cells = _touched_coarse_cells(
        [(r[lat_col], r[lon_col]) for r in crows], radius_nm, cell_deg
    )
    pruned = probe_ann_layout(spark, path, cells, key_col="geo_cell").drop(
        "geo_cell"
    )
    return points_in_radius(
        pruned,
        centers,
        radius_nm=radius_nm,
        lat_col=lat_col,
        lon_col=lon_col,
        center_id_col=center_id_col,
        max_centers=max_centers,
    )


MAX_BROADCAST_CENTERS = 1_000_000


def points_in_radius(
    points: DataFrame,
    centers: DataFrame,
    *,
    radius_nm: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    center_id_col: str = "center_id",
    max_centers: int = MAX_BROADCAST_CENTERS,
) -> DataFrame:
    """Tag each point with every center (a small DIMENSION table: airports,
    sensors, geofences) within ``radius_nm`` of it. The CENTERS side is
    exploded to its neighborhood and broadcast — each point lands in
    exactly one cell and the center's neighborhood must cover it (the
    half-width bound is computed from the center's latitude and already
    accounts for the other endpoint sitting up to rlat_deg poleward), so
    candidate pruning happens inside a broadcast hash join on the cell
    key and the corpus is never shuffled at all. This is the 'points
    near a fixed site list' dashboard query; use :func:`proximity_pairs`
    for the all-pairs self-join.

    The dimension-table contract is ENFORCED, not advisory: the centers
    side is counted at plan-build time (one bounded action — ``limit``
    caps the scan) and a count above ``max_centers`` raises instead of
    broadcasting a corpus. The default cap (10⁶ centers × ~5 exploded
    cells × ~40 B ≈ 200 MB) is the edge of a sane executor broadcast;
    a centers side bigger than that is not a dimension table — use
    :func:`proximity_pairs` semantics or a shuffle join instead."""
    n_centers = centers.limit(int(max_centers) + 1).count()
    if n_centers > max_centers:
        raise ValueError(
            f"centers has more than max_centers={max_centers} rows; "
            "broadcasting it would ship a corpus to every executor — "
            "use proximity_pairs or raise max_centers explicitly"
        )
    rlat_deg = radius_nm / 60.0
    s = rlat_deg
    n_x = math.ceil(360.0 / s)
    cpts = grid_cells(points, cell_deg=s, lat_col=lat_col, lon_col=lon_col)
    ccen = _explode_neighborhood(
        grid_cells(
            centers.select(
                F.col(center_id_col).alias("_cid"),
                F.col(lat_col).alias("_clat"),
                F.col(lon_col).alias("_clon"),
            ),
            cell_deg=s,
            lat_col="_clat",
            lon_col="_clon",
        ),
        _lon_halfwidth_cells(F.col("_clat"), rlat_deg, s, n_x),
        n_x,
    ).dropDuplicates(["_cid", "cy", "cx"])
    return (
        cpts.join(F.broadcast(ccen), on=["cy", "cx"])
        .withColumn(
            "dist_nm",
            haversine_nm(
                F.col(lat_col), F.col(lon_col), F.col("_clat"), F.col("_clon")
            ),
        )
        .filter(F.col("dist_nm") <= F.lit(float(radius_nm)))
        .drop("cy", "cx", "_clat", "_clon")
        .withColumnRenamed("_cid", center_id_col)
    )


MAX_POLYGON_VERTICES = 10_000


def _as_rings(verts) -> list[list[tuple[float, float]]]:
    """Normalize a polygon value: a flat [(lat, lon), ...] list is one
    ring; a list of rings — outer first, holes after — passes through.
    The format is detected from the first element (a 2-number pair =
    flat ring), so existing single-ring callers are unchanged."""
    if not verts:
        return []
    first = verts[0]
    if len(first) == 2 and all(isinstance(c, (int, float)) for c in first):
        return [list(verts)]
    return [list(r) for r in verts]


def _crossing_parity_expr(lat, lon, rings):
    """Even-odd ray-casting containment as ONE boolean column: for each
    polygon edge (y1,x1)->(y2,x2), the eastward ray from the point
    crosses it iff the edge straddles the point's latitude and the
    edge's longitude at that latitude lies east of the point. Parity of
    the crossing count decides containment. ``rings`` is a list of
    vertex rings (each closing edge implied PER RING); the parity law
    generalizes to holes for free — a point inside a hole crosses the
    outer ring an odd number of times AND the hole ring an odd number,
    so its total is even and it is (correctly) outside. All literals
    fold at plan build; the arithmetic is the IEEE +,-,*,/ chain
    ``(x2-x1)*(lat-y1)/(y2-y1)+x1`` written with the SAME association as
    the DuckDB oracle twin, so both engines produce bit-identical
    doubles and strict comparisons cannot ULP-flip membership."""
    crossings = None
    for vertices in rings:
        n = len(vertices)
        for i in range(n):
            y1, x1 = vertices[i]
            y2, x2 = vertices[(i + 1) % n]
            straddles = (F.lit(y1) > lat) != (F.lit(y2) > lat)
            xs = (F.lit(x2) - F.lit(x1)) * (lat - F.lit(y1)) / (
                F.lit(y2) - F.lit(y1)
            ) + F.lit(x1)
            c = F.when(straddles & (lon < xs), F.lit(1)).otherwise(F.lit(0))
            crossings = c if crossings is None else crossings + c
    # bbox guard over ALL rings: holes lie inside the outer ring by
    # definition so they never widen the box, but DISJOINT outer rings
    # under one id (documented capability) each contribute area — a
    # rings[0]-only box would silently exclude points in the others
    verts_all = [v for ring in rings for v in ring]
    ymin = min(v[0] for v in verts_all)
    ymax = max(v[0] for v in verts_all)
    xmin = min(v[1] for v in verts_all)
    xmax = max(v[1] for v in verts_all)
    bbox = (
        (lat >= F.lit(ymin)) & (lat <= F.lit(ymax))
        & (lon >= F.lit(xmin)) & (lon <= F.lit(xmax))
    )
    return bbox & (crossings % 2 == 1)


def points_in_polygons(
    points: DataFrame,
    polygons: dict[object, list[tuple[float, float]]],
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
    poly_id_type: str = "string",
    max_vertices: int = MAX_POLYGON_VERTICES,
) -> DataFrame:
    """Tag each point with every polygon (geofence) containing it — the
    restricted-airspace / zone-alert query. ``polygons`` maps a polygon
    id to either a vertex ring as (lat, lon) tuples, or — for zones with
    exclusions (r10) — a LIST OF RINGS, outer ring first and hole rings
    after it (each ring's closing edge implied; rings must not cross the
    antimeridian — split such zones in two). Containment is the even-odd
    parity over ALL the polygon's rings, so a point inside a hole is
    outside the zone; disjoint outer rings under one id also compose
    (parity is odd in either).
    Returns one output row per (point, containing polygon) with a
    ``poly_id`` column; points contained in NO polygon are omitted
    (the zones board wants only alerts — use your own ``explode_outer``
    over the compacted match array if keep-all semantics are needed).

    Spark-first shape: geofence sets are DIMENSION data (an airspace DB
    is thousands of zones, not billions), so containment compiles into
    the plan itself — per polygon a bbox guard plus the even-odd
    crossing parity over its edges (:func:`_crossing_parity_expr`), all
    of it one whole-stage-codegen projection followed by an
    ``array_compact``+``explode`` of the matched ids. ZERO joins, ZERO
    shuffles, zero Python on the hot path: at 100 TB this is a pure
    corpus scan, embarrassingly parallel, with filters still pushable
    beneath it. The plan-size contract is enforced: total vertex count
    above ``max_vertices`` raises (a polygon table that big should use a
    broadcast edge-table join + parity aggregate instead — one corpus
    shuffle — which no caller has needed yet).

    Boundary semantics: even-odd rule with strict comparisons — points
    exactly ON an edge or vertex fall to whichever side the IEEE
    arithmetic puts them, deterministically and identically in the
    DuckDB oracle (same literal association; see the 'geofence' branch
    of adsb_track_distance)."""
    ringed = {pid: _as_rings(verts) for pid, verts in polygons.items()}
    total = sum(len(r) for rings in ringed.values() for r in rings)
    if total > max_vertices:
        raise ValueError(
            f"polygons carry {total} vertices > max_vertices={max_vertices}; "
            "not dimension data — use a broadcast edge-table join instead"
        )
    for pid, rings in ringed.items():
        if not rings or any(len(r) < 3 for r in rings):
            raise ValueError(
                f"polygon {pid!r} has a ring with fewer than 3 vertices"
            )
    lat, lon = F.col(lat_col), F.col(lon_col)
    matched = F.array_compact(
        F.array(
            *[
                F.when(
                    _crossing_parity_expr(lat, lon, rings),
                    F.lit(pid).cast(poly_id_type),
                )
                for pid, rings in ringed.items()
            ]
        )
    )
    return (
        points.withColumn("poly_id", F.explode(matched))
    )
