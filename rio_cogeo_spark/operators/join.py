"""Spatial joins (SURVEY.md §2.3): point-in-polygon against broadcast admin
boundaries (cell prefilter + exact ray-casting refine), kNN, zonal stats.

The two-phase PIP mirrors the reference's coarse-window-then-exact-mask
pattern (/root/reference/rio_cogeo/cogeo.py:362-379: block window first,
per-pixel dataset_mask second):

  phase 1  pages.cell ⋈ broadcast(explode(admin.covering_cells))   (equi)
  phase 2  exact ray-cast refine, numpy-vectorized per admin group (theta)

Scale design: the admin table is small (countries/regions ≤ 10^5 rings) →
broadcast; the pages side never shuffles for phase 1 (broadcast hash join
preserves scan partitioning). Phase 2 is a batch-vectorized Arrow UDF —
per *admin* loop, never per row. Hot cells (megacities) inflate candidate
counts, not join keys, so no salting is needed on the broadcast path; AQE
skew-split covers the groupBy in zonal stats.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rio_cogeo_spark import grid
from rio_cogeo_spark.functions.tile import cell_id
from rio_cogeo_spark.synth import MEGACITIES

PREFILTER_ZOOM = 11   # PIP: fine enough that ~90% of hot-cell candidates are interior
KNN_ZOOM = 7          # kNN: ring-2 coverage radius must exceed the kth distance


@dataclass(frozen=True)
class AdminArea:
    """One admin boundary: closed ring (lon, lat) arrays + covering cells."""

    admin_id: str
    name: str
    ring_lon: Tuple[float, ...]
    ring_lat: Tuple[float, ...]


def _rect_ring(clon: float, clat: float, half: float) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    lons = (clon - half, clon + half, clon + half, clon - half, clon - half)
    lats = (clat - half, clat - half, clat + half, clat + half, clat - half)
    return lons, lats


def _star_ring(clon: float, clat: float, r_out: float, r_in: float, points: int = 5):
    """Concave star polygon (FIXTURES.md §2: forces the exact refine to
    disagree with the cell/bbox prefilter at edges)."""
    angles = np.linspace(0.0, 2.0 * np.pi, 2 * points, endpoint=False)
    radii = np.where(np.arange(2 * points) % 2 == 0, r_out, r_in)
    lons = clon + radii * np.cos(angles)
    lats = clat + radii * np.sin(angles)
    return tuple(np.append(lons, lons[0])), tuple(np.append(lats, lats[0]))


def build_admin_areas(rect_half: float = 0.6, stars: bool = False) -> List[AdminArea]:
    """Deterministic admin boundaries around the 20 megacity hotspots:
    axis-aligned rectangles (SQL-oracle-friendly) and, optionally, concave
    stars (exercising the ray-cast refine beyond bbox semantics)."""
    areas = []
    for cid, name, clat, clon in MEGACITIES:
        lons, lats = _rect_ring(clon, clat, rect_half)
        areas.append(AdminArea(f"A{cid:03d}", name, lons, lats))
    if stars:
        for cid, name, clat, clon in MEGACITIES[:5]:
            lons, lats = _star_ring(clon, clat, 1.0, 0.35)
            areas.append(AdminArea(f"S{cid:03d}", f"star_{name}", lons, lats))
    return areas


def _cell_is_interior(area: AdminArea, tx: int, ty: int, zoom: int) -> bool:
    """Conservatively decide whether tile (tx, ty) lies ENTIRELY inside the
    ring: all 4 corners inside by ray-cast AND no ring edge can cross the
    cell bbox (Cohen-Sutherland trivial-reject per edge; any edge not
    trivially outside demotes the cell to 'boundary'). False negatives
    only route points through the exact refine — never wrong results."""
    w, s, e, n = grid.tile_bounds_mercator([tx], [ty], zoom)
    corners_lon, corners_lat = grid.mercator_to_lonlat(
        np.array([w[0], e[0], e[0], w[0]]), np.array([s[0], s[0], n[0], n[0]])
    )
    rlon, rlat = np.asarray(area.ring_lon), np.asarray(area.ring_lat)
    if not ray_cast(corners_lon, corners_lat, rlon, rlat).all():
        return False
    bx0, bx1 = corners_lon.min(), corners_lon.max()
    by0, by1 = corners_lat.min(), corners_lat.max()
    x0, y0 = rlon[:-1], rlat[:-1]
    x1, y1 = rlon[1:], rlat[1:]
    trivially_out = (
        ((x0 < bx0) & (x1 < bx0))
        | ((x0 > bx1) & (x1 > bx1))
        | ((y0 < by0) & (y1 < by0))
        | ((y0 > by1) & (y1 > by1))
    )
    return bool(trivially_out.all())


def covering_cells(area: AdminArea, zoom: int = PREFILTER_ZOOM) -> List[Tuple[int, bool]]:
    """(cell, interior) pairs for cells intersecting the ring's bbox at
    ``zoom`` — the coarse prefilter key (the reference's block-window
    analog). ``interior`` cells skip the exact refine entirely."""
    lon0, lon1 = min(area.ring_lon), max(area.ring_lon)
    lat0, lat1 = min(area.ring_lat), max(area.ring_lat)
    tx0, ty0 = grid.tile_index([lon0], [lat1], zoom)
    tx1, ty1 = grid.tile_index([lon1], [lat0], zoom)
    cells = []
    for ty in range(int(ty0[0]), int(ty1[0]) + 1):
        for tx in range(int(tx0[0]), int(tx1[0]) + 1):
            cells.append(
                (int(grid.pack_cell(zoom, tx, ty)), _cell_is_interior(area, tx, ty, zoom))
            )
    return cells


def admin_cells_df(spark: SparkSession, areas: List[AdminArea],
                   zoom: int = PREFILTER_ZOOM) -> DataFrame:
    """Broadcast side: one row per (admin_id, covering cell, interior)."""
    rows = [
        (a.admin_id, a.name, int(c), bool(interior))
        for a in areas
        for c, interior in covering_cells(a, zoom)
    ]
    return spark.createDataFrame(
        rows, "admin_id string, name string, cell long, interior boolean"
    )


def ray_cast(lon: np.ndarray, lat: np.ndarray,
             ring_lon: np.ndarray, ring_lat: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: points (N,) vs one ring (M,).
    Half-open edge semantics (left-closed on crossing) — deterministic."""
    inside = np.zeros(lon.shape[0], dtype=bool)
    x, y = lon, lat
    x0, y0 = ring_lon[:-1], ring_lat[:-1]
    x1, y1 = ring_lon[1:], ring_lat[1:]
    for i in range(x0.shape[0]):
        cond = (y0[i] > y) != (y1[i] > y)
        if not np.any(cond):
            continue
        xin = (x1[i] - x0[i]) * (y - y0[i]) / (y1[i] - y0[i]) + x0[i]
        inside ^= cond & (x < xin)
    return inside


# Memoized PIP dim side: the admin-boundary broadcast inputs are STATIC
# across queries of a job (the reference opens its dataset/config once
# per translate, cogeo.py:86) — re-deriving the covering-cell table,
# the ring broadcast and the id map on every call re-runs ~1 s of
# driver-serial Python per query, a pure Amdahl term a long-running
# cluster job amortizes to zero.  Keyed on the full ring content (not
# object identity), so mutated/replaced area lists never hit stale
# entries; keyed on the JVM context so a restarted session rebuilds.
_PIP_DIM_CACHE: dict = {}


def _pip_dim_side(spark: SparkSession, areas: List[AdminArea], zoom: int):
    key = (
        id(spark.sparkContext._jsc),
        zoom,
        tuple(
            (a.admin_id, a.name,
             np.asarray(a.ring_lon, dtype=np.float64).tobytes(),
             np.asarray(a.ring_lat, dtype=np.float64).tobytes())
            for a in areas
        ),
    )
    hit = _PIP_DIM_CACHE.get(key)
    if hit is not None:
        return hit
    cells = admin_cells_df(spark, areas, zoom)
    # integer admin index for the refine UDF: int-array group masks are
    # ~10x faster than string equality over object dtype
    idx_of = {a.admin_id: i for i, a in enumerate(areas)}
    rings = [(np.asarray(a.ring_lon), np.asarray(a.ring_lat)) for a in areas]
    bc = spark.sparkContext.broadcast(rings)
    idx_map = F.create_map(
        *[x for a in areas for x in (F.lit(a.admin_id), F.lit(idx_of[a.admin_id]))]
    )
    _PIP_DIM_CACHE.clear()  # one live dim side per process is plenty
    _PIP_DIM_CACHE[key] = (cells, bc, idx_map)
    return cells, bc, idx_map


def point_in_polygon(
    pages: DataFrame,
    areas: List[AdminArea],
    zoom: int = PREFILTER_ZOOM,
    how: str = "inner",
) -> DataFrame:
    """Two-phase PIP join. ``how``: inner (pairs), semi (pages in any
    polygon), anti (pages outside all polygons — 'left_anti').

    Returns pages columns + ``admin_id``/``name`` for inner.
    """
    spark = pages.sparkSession
    cells, bc, idx_map = _pip_dim_side(spark, areas, zoom)

    with_cell = pages.withColumn("cell", cell_id(F.col("lon"), F.col("lat"), zoom))
    candidates = with_cell.join(F.broadcast(cells), "cell", "inner").withColumn(
        "admin_idx", idx_map[F.col("admin_id")]
    )

    @F.pandas_udf("boolean")
    def _match(lon_s: pd.Series, lat_s: pd.Series, admin_s: pd.Series,
               interior_s: pd.Series) -> pd.Series:
        # Interior-cell shortcut applied INSIDE the batch: candidates whose
        # prefilter cell is wholly inside the ring are matches by
        # construction — the ray-cast numpy work runs only on boundary-cell
        # rows, vectorized per admin group (never per row). One pass over
        # one Arrow stream: a split+union formulation would execute the
        # pages scan + cell-assignment UDF + broadcast join TWICE (no
        # shuffle boundary to reuse between the branches).
        out = interior_s.to_numpy(dtype=bool).copy()
        bnd = ~out
        if bnd.any():
            lon = lon_s.to_numpy(dtype=np.float64)
            lat = lat_s.to_numpy(dtype=np.float64)
            admins = admin_s.to_numpy(dtype=np.int32)
            for admin in np.unique(admins[bnd]):
                m = bnd & (admins == admin)
                rlon, rlat = bc.value[admin]
                out[m] = ray_cast(lon[m], lat[m], rlon, rlat)
        return pd.Series(out)

    matched = candidates.filter(
        _match(F.col("lon"), F.col("lat"), F.col("admin_idx"), F.col("interior"))
    ).drop("cell", "admin_idx", "interior")

    if how == "inner":
        return matched
    if how == "semi":
        return matched.select(*pages.columns).dropDuplicates(["url"])
    if how == "anti":
        hits = matched.select("url").distinct()
        return pages.join(hits, "url", "left_anti")
    raise ValueError(f"unknown how: {how}")


def knn_bruteforce(
    pages: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact kNN for a *small* broadcast query set: cross-join on the
    broadcast side + per-query window top-k. Linear in pages, no shuffle
    of the big side until the final (tiny) top-k aggregation.

    queries_df: (query_id string, q_lat double, q_lon double).
    Distance: squared lon/lat euclidean (pure arithmetic → oracle-exact);
    ties broken by doc_id.
    """
    joined = pages.crossJoin(F.broadcast(queries_df))
    dist2 = (F.col("lat") - F.col("q_lat")) * (F.col("lat") - F.col("q_lat")) + (
        F.col("lon") - F.col("q_lon")
    ) * (F.col("lon") - F.col("q_lon"))
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col("doc_id").asc())
    return (
        joined.withColumn("dist2", dist2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "url", "rank", F.round("dist2", 9).alias("dist2"))
    )


def _knn_topk(joined: DataFrame, k: int) -> DataFrame:
    dist2 = (F.col("lat") - F.col("q_lat")) * (F.col("lat") - F.col("q_lat")) + (
        F.col("lon") - F.col("q_lon")
    ) * (F.col("lon") - F.col("q_lon"))
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col("doc_id").asc())
    return (
        joined.withColumn("dist2", dist2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "url", "rank", F.round("dist2", 9).alias("dist2"))
    )


def knn_kring(
    pages: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
    zoom: int = KNN_ZOOM,
    ring: int = 1,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Scale-path kNN: expand each query's cell into its k-ring (a
    vectorized UDF + explode — no driver-side loop, so the query set can
    itself be a large table) and equi-join pages on the cell key
    (north_star: 'kNN answered by H3 k-ring expansion') — candidates
    shrink from |pages| to the ring occupancy, then exact top-k. Falls
    back to widening callers if a ring under-fills (checked by tests
    against knn_bruteforce); :func:`knn_kring_exact` automates that.

    ``broadcast_queries`` (default True) broadcasts the exploded query
    cells — right up to ~10^6 probe rows, and the pages side then never
    shuffles before the top-k. Set False for a query table too large to
    broadcast: both sides shuffle on the cell key instead.
    """
    from rio_cogeo_spark.functions.tile import k_ring_cells

    qcells = (
        queries_df.withColumn("cell", cell_id(F.col("q_lon"), F.col("q_lat"), zoom))
        .withColumn("cell", F.explode(k_ring_cells(F.col("cell"), ring)))
        .select("query_id", "q_lat", "q_lon", "cell")
    )
    if broadcast_queries:
        qcells = F.broadcast(qcells)
    with_cell = pages.withColumn("cell", cell_id(F.col("lon"), F.col("lat"), zoom))
    joined = with_cell.join(qcells, "cell", "inner")
    return _knn_topk(joined, k)


def _ring_coverage_dist2(q_lon, q_lat, tx, ty, zoom: int, ring) -> np.ndarray:
    """Vectorized lower bound (squared lon/lat-euclid) on the distance
    from each query to any point OUTSIDE its k-ring's covered region:
    any candidate missed by the ring is at least this far away."""
    q_lon = np.asarray(q_lon, dtype=np.float64)
    q_lat = np.asarray(q_lat, dtype=np.float64)
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty, dtype=np.int64)
    ring = np.asarray(ring, dtype=np.int64)
    n = 1 << zoom
    span = 2.0 * grid.ORIGIN_SHIFT / n
    x0, y0 = tx - ring, ty - ring
    x1, y1 = tx + ring, ty + ring
    lon_w = (-grid.ORIGIN_SHIFT + x0 * span) / grid.ORIGIN_SHIFT * 180.0
    lon_e = (-grid.ORIGIN_SHIFT + (x1 + 1) * span) / grid.ORIGIN_SHIFT * 180.0
    _, lat_n = grid.mercator_to_lonlat(
        np.zeros_like(q_lon), grid.ORIGIN_SHIFT - y0 * span
    )
    _, lat_s = grid.mercator_to_lonlat(
        np.zeros_like(q_lon), grid.ORIGIN_SHIFT - (y1 + 1) * span
    )
    inf = np.float64(np.inf)
    # antimeridian wrap / pole clamps: nothing exists outside those edges
    d_lon = np.where(
        (x1 - x0 + 1) < n, np.minimum(q_lon - lon_w, lon_e - q_lon), inf
    )
    d_lat_s = np.where(y1 < n - 1, q_lat - lat_s, inf)
    d_lat_n = np.where(y0 > 0, lat_n - q_lat, inf)
    d = np.minimum(np.minimum(d_lon, d_lat_s), d_lat_n)
    return np.maximum(d, 0.0) ** 2


def knn_kring_exact(
    pages: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
    zoom: int = KNN_ZOOM,
    start_ring: int = 1,
    max_ring: int = 64,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Provably exact k-ring kNN in TWO distributed phases (no per-round
    result collects — the only driver-side data is one aggregate row per
    query, O(|queries|)):

    phase 1  ring=start_ring probe → per-query (n, kth distance).
    routing  per query: kth-dist <= coverage_bound(start_ring) → done;
             else compute the smallest ring whose coverage bound covers
             the kth distance (vectorized binary search on the bound).
    phase 2  variable-ring explode (k_ring_cells_var) → one more join →
             top-k. Exact by construction: the phase-2 ring contains the
             phase-1 ring, so its kth distance can only shrink and stays
             within the chosen bound.
    fallback queries with fewer than k phase-1 candidates (empty
             neighborhoods) take the exact broadcast scan.

    The routing step is a vectorized pandas UDF over the per-query
    aggregate DataFrame (never a driver collect), so the query set can
    itself be a large table: the only eager materializations are two
    ``localCheckpoint``s of O(k·|queries|) and O(|queries|) rows, both
    distributed. With ``broadcast_queries=False`` neither the exploded
    ring cells nor the done-id set is broadcast (both scale with
    |queries|); the brute-force fallback branch still broadcasts its
    residual, which the adaptive ring routing keeps to the genuinely
    empty-neighborhood queries — a tiny set for any real point
    distribution.
    """
    from rio_cogeo_spark.functions.tile import k_ring_cells_var

    with_cell = pages.withColumn("cell", cell_id(F.col("lon"), F.col("lat"), zoom))

    # phase 1 output is O(k·|queries|): checkpoint it so the stats agg,
    # the routing pass and the done-branch join all reuse one computation
    # of the big join (lineage truncated; blocks freed when the result
    # DataFrame is GC'd).
    phase1 = knn_kring(with_cell.drop("cell"), queries_df, k=k, zoom=zoom,
                       ring=start_ring,
                       broadcast_queries=broadcast_queries).localCheckpoint(eager=True)
    stats = phase1.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("dist2").alias("dkth")
    )

    k_, zoom_, sr_, mr_ = int(k), int(zoom), int(start_ring), int(max_ring)

    @F.pandas_udf("int")
    def _route(q_lat_s: pd.Series, q_lon_s: pd.Series, n_s: pd.Series,
               dkth_s: pd.Series) -> pd.Series:
        # Per-query routing decision, whole Arrow batch at once:
        #   -2 → exact broadcast scan (under-filled ring, or max_ring
        #        cannot certify);  -1 → phase-1 answer already certified;
        #   r>0 → re-probe with ring r (smallest ring whose coverage
        #        bound covers the phase-1 kth distance — vectorized
        #        binary search, log2(max_ring) bound evaluations total).
        lat = q_lat_s.to_numpy(dtype=np.float64)
        lon = q_lon_s.to_numpy(dtype=np.float64)
        n_got = n_s.fillna(0).to_numpy(dtype=np.int64)
        dkth = dkth_s.fillna(np.inf).to_numpy(dtype=np.float64)
        tx, ty = grid.tile_index(lon, lat, zoom_)
        out = np.full(lon.shape[0], -2, dtype=np.int64)
        filled = n_got >= k_
        if filled.any():
            bound0 = _ring_coverage_dist2(
                lon, lat, tx, ty, zoom_, np.full(lon.shape[0], sr_)
            )
            done = filled & (dkth <= bound0)
            out[done] = -1
            todo = filled & ~done
            if todo.any():
                lo = np.full(lon.shape[0], sr_, dtype=np.int64)
                hi = np.full(lon.shape[0], mr_, dtype=np.int64)
                while True:
                    active = todo & (lo < hi)
                    if not active.any():
                        break
                    mid = (lo + hi) // 2
                    ge = _ring_coverage_dist2(lon, lat, tx, ty, zoom_, mid) >= dkth
                    hi = np.where(active & ge, mid, hi)
                    lo = np.where(active & ~ge, mid + 1, lo)
                b_final = _ring_coverage_dist2(lon, lat, tx, ty, zoom_, lo)
                out[todo] = np.where(b_final[todo] >= dkth[todo], lo[todo], -2)
        return pd.Series(out.astype(np.int32))

    routed = (
        queries_df.join(stats, "query_id", "left")
        .withColumn("ring", _route(F.col("q_lat"), F.col("q_lon"),
                                   F.col("n"), F.col("dkth")))
        .select("query_id", "q_lat", "q_lon", "ring")
        .localCheckpoint(eager=True)  # O(|queries|) rows, 3 consumers
    )

    done_ids = routed.filter(F.col("ring") == -1).select("query_id")
    if broadcast_queries:
        done_ids = F.broadcast(done_ids)
    out_done = phase1.join(done_ids, "query_id", "inner")

    exp = routed.filter(F.col("ring") > 0)
    qcells = (
        exp.withColumn("cell", cell_id(F.col("q_lon"), F.col("q_lat"), zoom))
        .withColumn("cell", F.explode(k_ring_cells_var(F.col("cell"), F.col("ring"))))
        .select("query_id", "q_lat", "q_lon", "cell")
    )
    if broadcast_queries:
        qcells = F.broadcast(qcells)
    out_expand = _knn_topk(with_cell.join(qcells, "cell", "inner"), k)

    brute_q = routed.filter(F.col("ring") == -2).select("query_id", "q_lat", "q_lon")
    out_brute = knn_bruteforce(pages, brute_q, k=k)

    # empty branches union to nothing — a 0-query input yields an empty
    # DataFrame with the output schema (no special-casing)
    return out_done.unionByName(out_expand).unionByName(out_brute)


def zonal_stats(pages: DataFrame, areas: List[AdminArea],
                zoom: int = PREFILTER_ZOOM) -> DataFrame:
    """Raster↔vector zonal stats (SURVEY.md §2.3 J4): PIP join then
    per-polygon aggregate — the generalization of the reference's
    per-window read loop (cogeo.py:371-379)."""
    hits = point_in_polygon(pages, areas, zoom, how="inner")
    return (
        hits.groupBy("admin_id")
        .agg(
            F.count(F.lit(1)).alias("page_count"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("lang_count"),
        )
    )
