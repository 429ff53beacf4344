"""Zoom-range fixture analogs (FIXTURES.md §4).

image_web_z5_z11: EPSG:3857 pyramid with MinZoom 5 / MaxZoom 11
(reference tests/test_cogeo.py:568-576); tiny-extent datasets produce
zero overviews (image_51px, tests/test_cogeo.py:357-380).
"""

from pyspark.sql import functions as F

from rio_cogeo_spark.operators.info import cog_info
from rio_cogeo_spark.operators.translate import cog_translate, tiles_meta
from rio_cogeo_spark.synth import synth_pages


def test_z5_z11_pyramid_info(spark, sf_small):
    pages = synth_pages(spark, sf_small)
    tiles, plan = cog_translate(pages, max_zoom=11, overview_level=6)
    meta = tiles_meta(tiles, plan)
    info = cog_info(tiles, meta, {"format": "parquet"})
    assert info.GEO.MaxZoom == 11
    assert info.GEO.MinZoom == 5
    # base IFD + 6 overview IFDs, decimations [1, 2, 4, ..., 64]
    assert [i.Decimation for i in info.IFD] == [1, 2, 4, 8, 16, 32, 64]
    assert info.COG is True


def test_tiny_extent_no_overviews(spark, sf_small):
    """51px-analog: an extent smaller than one block infers zero
    overview levels (grid.max_overview_level rule)."""
    pages = synth_pages(spark, sf_small).filter(
        (F.col("lat") > 35.3) & (F.col("lat") < 36.0)
        & (F.col("lon") > 139.3) & (F.col("lon") < 140.0)
    )
    assert pages.count() > 0
    tiles, plan = cog_translate(pages, max_zoom=6)  # one z6 cell covers it
    assert plan.decimations == []
    zooms = [r["zoom"] for r in tiles.select("zoom").distinct().collect()]
    assert zooms == [6]
