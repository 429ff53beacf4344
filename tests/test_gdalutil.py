"""GDAL command-line utility analogs: gdalinfo -hist, gdal_translate
-scale, gdallocationinfo, gdal_merge, gdaldem color-relief.

Reference parity frame: rio-cogeo delegates these to GDAL/rasterio
around the COG pipeline; here they run over the tile grid with exact
integer contracts.
"""

import pytest
from pyspark.sql import functions as F

from rio_cogeo_spark.operators import gdalutil


def _tiles(spark, cells, value=None):
    rows = [
        (int(x), int(y), int(value[i] if value is not None else 1))
        for i, (x, y) in enumerate(cells)
    ]
    return spark.createDataFrame(
        rows, "tile_x long, tile_y long, page_count long"
    )


# ---------------------------------------------------------------------------
# raster_hist
# ---------------------------------------------------------------------------


def test_raster_hist_buckets_exact(spark):
    """Values 0..15 into 4 buckets of width 4; zero-count buckets when
    the range has gaps."""
    df = _tiles(spark, [(i, 0) for i in range(16)], value=list(range(16)))
    out = {r.bucket: r for r in gdalutil.raster_hist(df, n_buckets=4).collect()}
    assert len(out) == 4
    for b in range(4):
        assert out[b].n_cells == 4
        assert out[b].lo == b * 4 and out[b].hi == b * 4 + 3


def test_raster_hist_zero_count_buckets_emitted(spark):
    df = _tiles(spark, [(0, 0), (1, 0)], value=[0, 100])
    out = {r.bucket: r.n_cells for r in gdalutil.raster_hist(df, n_buckets=5).collect()}
    assert out[0] == 1 and out[4] == 1
    assert out[1] == out[2] == out[3] == 0


def test_raster_hist_max_lands_in_last_bucket(spark):
    """The +1 width rule: vmax itself must fall in bucket n-1, never
    overflow it."""
    df = _tiles(spark, [(0, 0), (1, 0), (2, 0)], value=[3, 7, 11])
    out = gdalutil.raster_hist(df, n_buckets=3).collect()
    assert sum(r.n_cells for r in out) == 3
    assert max(r.bucket for r in out if r.n_cells > 0) == 2


# ---------------------------------------------------------------------------
# scale_bytes
# ---------------------------------------------------------------------------


def test_scale_bytes_endpoints_and_monotone(spark):
    df = _tiles(spark, [(i, 0) for i in range(5)], value=[10, 20, 30, 40, 50])
    out = {r.v: r.scaled for r in gdalutil.scale_bytes(df).collect()}
    assert out[10] == 0 and out[50] == 255
    assert out[30] == (20 * 255) // 40  # exact integer midpoint
    vals = [out[v] for v in sorted(out)]
    assert vals == sorted(vals)


def test_scale_bytes_constant_input_maps_to_lo(spark):
    df = _tiles(spark, [(0, 0), (1, 1)], value=[7, 7])
    out = gdalutil.scale_bytes(df, lo=10, hi=20).collect()
    assert all(r.scaled == 10 for r in out)


# ---------------------------------------------------------------------------
# locationinfo
# ---------------------------------------------------------------------------


def test_locationinfo_hit_and_miss(spark):
    from rio_cogeo_spark.grid import tile_index

    zoom = 4
    tx, ty = tile_index(10.0, 50.0, zoom)
    tiles = _tiles(spark, [(tx, ty)], value=[42])
    pts = spark.createDataFrame(
        [("hit", 10.0, 50.0), ("miss", -150.0, -40.0)],
        "name string, lon double, lat double",
    )
    out = {r.name: r for r in gdalutil.locationinfo(tiles, pts, zoom).collect()}
    assert out["hit"].value == 42
    assert out["hit"].tile_x == tx and out["hit"].tile_y == ty
    assert out["miss"].value is None


# ---------------------------------------------------------------------------
# mosaic
# ---------------------------------------------------------------------------


def test_mosaic_priority_and_union(spark):
    a = _tiles(spark, [(0, 0), (1, 0)], value=[5, 6])
    b = _tiles(spark, [(1, 0), (2, 0)], value=[99, 7])
    out = {(r.tile_x, r.tile_y): r for r in gdalutil.mosaic(a, b).collect()}
    assert len(out) == 3
    assert out[(0, 0)].value == 5 and out[(0, 0)].src == "a"
    assert out[(1, 0)].value == 6 and out[(1, 0)].src == "a"  # a wins
    assert out[(2, 0)].value == 7 and out[(2, 0)].src == "b"


# ---------------------------------------------------------------------------
# color_relief
# ---------------------------------------------------------------------------


def test_color_relief_classes(spark):
    df = _tiles(spark, [(i, 0) for i in range(5)], value=[0, 1, 9, 10, 500])
    out = {r.v: r.cls for r in gdalutil.color_relief(
        df, [(1, "lo"), (10, "mid"), (100, "hi")]
    ).collect()}
    assert out[0] == "below"
    assert out[1] == "lo" and out[9] == "lo"
    assert out[10] == "mid"
    assert out[500] == "hi"


def test_color_relief_rejects_unsorted_breaks(spark):
    df = _tiles(spark, [(0, 0)])
    with pytest.raises(ValueError):
        gdalutil.color_relief(df, [(10, "a"), (1, "b")])
    with pytest.raises(ValueError):
        gdalutil.color_relief(df, [])
