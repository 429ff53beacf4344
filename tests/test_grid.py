"""Golden unit tests for the pure-numpy grid math (SURVEY.md §7 step 1).

Golden values come from the reference's test assertions (cited) and from
the public WebMercatorQuad definition.
"""

import math

import numpy as np
import pytest

from rio_cogeo_spark import grid


def test_cell_size_z0():
    # WebMercatorQuad z0: whole world in one 256px tile.
    assert grid.cell_size(0) == pytest.approx(156543.03392804097)
    assert grid.cell_size(1) == pytest.approx(156543.03392804097 / 2)


def test_mercator_roundtrip():
    lon = np.array([-180.0, -71.0, 0.0, 2.3522, 139.6917])
    lat = np.array([-60.0, 41.0, 0.0, 48.8566, 35.6895])
    x, y = grid.lonlat_to_mercator(lon, lat)
    lon2, lat2 = grid.mercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_mercator_known_point():
    x, y = grid.lonlat_to_mercator([0.0], [0.0])
    assert x[0] == 0.0 and abs(y[0]) < 1e-9
    x, y = grid.lonlat_to_mercator([180.0], [0.0])
    assert x[0] == pytest.approx(grid.ORIGIN_SHIFT)


def test_tile_index_known():
    # Well-known XYZ facts: z0 → (0,0) everywhere; z1 quadrants.
    tx, ty = grid.tile_index([0.0], [0.0], 0)
    assert (tx[0], ty[0]) == (0, 0)
    tx, ty = grid.tile_index([-100.0, 100.0, -100.0, 100.0], [40.0, 40.0, -40.0, -40.0], 1)
    assert list(tx) == [0, 1, 0, 1]
    assert list(ty) == [0, 0, 1, 1]
    # Paris at z12 — independently computed via the public slippy-map
    # formula (OSM wiki): x = floor((lon+180)/360 * 2^z).
    lon, lat = 2.3522, 48.8566
    ex = math.floor((lon + 180.0) / 360.0 * 4096)
    lat_r = math.radians(lat)
    ey = math.floor((1.0 - math.log(math.tan(lat_r) + 1.0 / math.cos(lat_r)) / math.pi) / 2.0 * 4096)
    tx, ty = grid.tile_index([lon], [lat], 12)
    assert (tx[0], ty[0]) == (ex, ey) == (2074, 1409)


def test_tile_index_clip_at_edges():
    tx, ty = grid.tile_index([180.0, -180.0], [89.9, -89.9], 4)
    assert 0 <= tx[0] <= 15 and 0 <= tx[1] <= 15
    assert ty[0] == 0 and ty[1] == 15


def test_tile_bounds_inverse():
    tx, ty = grid.tile_index([2.3522], [48.8566], 9)
    w, s, e, n = grid.tile_bounds_mercator(tx, ty, 9)
    mx, my = grid.lonlat_to_mercator([2.3522], [48.8566])
    assert w[0] <= mx[0] < e[0]
    assert s[0] <= my[0] < n[0]
    span = 2 * grid.ORIGIN_SHIFT / 512
    assert (e[0] - w[0]) == pytest.approx(span)


def test_max_overview_level_golden():
    # 512x512 input, 64 blocksize → [2,4,8] i.e. 3 levels
    # (reference tests/test_cogeo.py:72).
    assert grid.max_overview_level(512, 512, minsize=64) == 3
    # smaller than blocksize → 0 overviews (tests/test_cogeo.py:357-380).
    assert grid.max_overview_level(51, 51, minsize=512) == 0
    assert grid.max_overview_level(171, 171, minsize=512) == 0
    assert grid.max_overview_level(512, 512, minsize=512) == 0
    assert grid.max_overview_level(1024, 1024, minsize=512) == 1


def test_overview_decimations_golden():
    assert grid.overview_decimations(3) == [2, 4, 8]
    # overview_level=2 → [2,4] (reference tests/test_cogeo.py:258-265).
    assert grid.overview_decimations(2) == [2, 4]
    # decimation_base/overview_level pairs (3,6),(4,5),(5,4): first
    # decimation equals the base (reference tests/test_cogeo.py:818-835).
    for base, lvl in [(3, 6), (4, 5), (5, 4)]:
        decs = grid.overview_decimations(lvl, decimation_base=base)
        assert decs[0] == base and len(decs) == lvl
        assert decs == sorted(decs)
    # base <= 1 raises; base > 2 without level raises (cogeo.py:196-203).
    with pytest.raises(ValueError):
        grid.overview_decimations(3, decimation_base=1)
    with pytest.raises(ValueError):
        grid.overview_decimations(None, decimation_base=3)


def test_overview_decimations_inferred():
    assert grid.overview_decimations(None, width=512, height=512, minsize=64) == [2, 4, 8]


def test_zoom_for_res_strategies():
    # Exact matrix resolution → that zoom under every strategy except lower.
    res9 = grid.cell_size(9)
    assert grid.zoom_for_res(res9, zoom_level_strategy="auto") == 9
    assert grid.zoom_for_res(res9, zoom_level_strategy="upper") == 9
    assert grid.zoom_for_res(res9, zoom_level_strategy="lower") == 8
    # Resolution halfway between z8 and z9: ratio cell(8)/res = 1.333 ≥ 1.1
    # → auto stays at 9 (morecantile's 1.1 auto threshold).
    res = grid.cell_size(9) * 1.5
    assert grid.zoom_for_res(res, zoom_level_strategy="upper") == 9
    assert grid.zoom_for_res(res, zoom_level_strategy="auto") == 9
    assert grid.zoom_for_res(res, zoom_level_strategy="lower") == 8
    # Within 10% of the coarser level → auto snaps down (the reference's
    # image_north case shape: maxzoom 9 auto vs 8 lower, test_web.py:56-71).
    res = grid.cell_size(8) / 1.05
    assert grid.zoom_for_res(res, zoom_level_strategy="upper") == 9
    assert grid.zoom_for_res(res, zoom_level_strategy="auto") == 8
    with pytest.raises(ValueError):
        grid.zoom_for_res(res9, zoom_level_strategy="bogus")


def test_web_optimized_grid_alignment():
    # Bounds snap to tile corners at base_zoom (reference test_web.py:74-124).
    spec = grid.web_optimized_grid((2.0, 48.0, 3.0, 49.0), zoom_level=12)
    assert spec.max_zoom == 12 and spec.base_zoom == 12
    span12 = 2 * grid.ORIGIN_SHIFT / (1 << 12)
    # origin is an exact multiple of the z12 tile span from the origin shift
    k = (spec.origin_x + grid.ORIGIN_SHIFT) / span12
    assert k == pytest.approx(round(k))
    # aligned_levels=2 → snap at z10 (reference test_web.py:241-300).
    spec2 = grid.web_optimized_grid((2.0, 48.0, 3.0, 49.0), zoom_level=12, aligned_levels=2)
    assert spec2.base_zoom == 10
    span10 = 2 * grid.ORIGIN_SHIFT / (1 << 10)
    k2 = (spec2.origin_x + grid.ORIGIN_SHIFT) / span10
    assert k2 == pytest.approx(round(k2))
    # width/height follow max(1, round((e-w)/res)) (utils.py:139-140).
    assert spec.width >= 1 and spec.height >= 1
    assert spec.width % (span12 / spec.resolution) == 0


def test_k_ring():
    ring = grid.k_ring(5, 5, 4, 1)
    assert len(ring) == 9 and (5, 5) in ring and (4, 4) in ring
    # X wraps, Y clamps.
    ring = grid.k_ring(0, 0, 4, 1)
    assert (15, 0) in ring and len(ring) == 6


def test_pack_unpack_cell():
    z, x, y = grid.unpack_cell(grid.pack_cell(12, 2075, 1409))
    assert (int(z), int(x), int(y)) == (12, 2075, 1409)
    arr = grid.pack_cell([4, 4], [1, 2], [3, 4])
    z, x, y = grid.unpack_cell(arr)
    assert list(x) == [1, 2] and list(y) == [3, 4] and list(z) == [4, 4]


def test_zoom_for_res_matches_overview_chain():
    # minzoom = zoom of (res * 2**max_level) — utils.py:79-85 composition.
    res = grid.cell_size(11)
    max_level = grid.max_overview_level(4096, 4096, minsize=512)  # 3
    assert max_level == 3
    minzoom = grid.zoom_for_res(res * 2**max_level)
    assert minzoom == 11 - 3


# ---------------------------------------------------------------------------
# geohash codec
# ---------------------------------------------------------------------------


def test_geohash_canonical_vector_and_twin(spark):
    """Niemeyer's canonical vector (57.64911, 10.40744) -> u4pruyd,
    byte-identical with the DuckDB twin across precisions and poles."""
    import duckdb
    from pyspark.sql import functions as F

    from rio_cogeo_spark.functions.geohash import geohash, geohash_sql

    pts = [
        (57.64911, 10.40744), (48.8566, 2.3522), (-33.8688, 151.2093),
        (0.0, 0.0), (-90.0, -180.0), (89.999999, 179.999999),
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for prec in (1, 5, 7, 12):
        got = [
            r.gh for r in df.select(
                geohash(F.col("lat"), F.col("lon"), prec).alias("gh")
            ).collect()
        ]
        vals = ", ".join(f"({la!r}, {lo!r})" for la, lo in pts)
        want = [
            r[0] for r in duckdb.sql(
                f"SELECT {geohash_sql('lat', 'lon', prec)} AS gh "
                f"FROM (VALUES {vals}) t(lat, lon)"
            ).fetchall()
        ]
        assert got == want, prec
        assert all(len(g) == prec for g in got)
    got7 = df.select(geohash(F.col("lat"), F.col("lon"), 7).alias("gh"))
    assert [r.gh for r in got7.collect()][0] == "u4pruyd"


def test_geohash_decode_bounds_roundtrip(spark):
    """decode(encode(p)) must contain p; prefixes contain their
    descendants' cells (the prefix-scan property)."""
    from pyspark.sql import functions as F

    from rio_cogeo_spark.functions.geohash import (
        geohash,
        geohash_decode_bounds,
    )

    pts = [(57.64911, 10.40744), (-33.8688, 151.2093), (12.34, -56.78)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    ghs = [
        r.gh for r in df.select(
            geohash(F.col("lat"), F.col("lon"), 8).alias("gh")
        ).collect()
    ]
    for gh, (la, lo) in zip(ghs, pts):
        lo0, la0, lo1, la1 = geohash_decode_bounds(gh)
        assert lo0 <= lo <= lo1 and la0 <= la <= la1
        # ancestor cell contains the child cell
        plo0, pla0, plo1, pla1 = geohash_decode_bounds(gh[:4])
        assert plo0 <= lo0 and plo1 >= lo1 and pla0 <= la0 and pla1 >= la1

    import pytest as _pt
    with _pt.raises(ValueError):
        geohash_decode_bounds("")
    with _pt.raises(ValueError):
        geohash_decode_bounds("ab!")
    with _pt.raises(ValueError):
        geohash(F.lit(0.0), F.lit(0.0), 13)
