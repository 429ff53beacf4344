"""Nodata/mask/alpha/colormap/tags semantics (SURVEY.md §2.2 P2-P7,
§2.7 F10/F11 — the reference's fixture scenarios from FIXTURES.md §4)."""

import pytest
from pyspark.sql import functions as F

from rio_cogeo_spark.errors import IncompatibleOptions, NodataAlphaMaskWarning
from rio_cogeo_spark.operators.info import cog_info
from rio_cogeo_spark.operators.translate import (
    apply_nodata,
    cog_translate,
    tiles_meta,
)
from rio_cogeo_spark.synth import synth_pages

SENTINEL = -999.0


@pytest.fixture(scope="module")
def pages_with_nodata(spark, sf_small):
    """image_nodata.tif analog: some rows carry the sentinel coordinate;
    image_nan.tif analog: some rows carry NaN."""
    p = synth_pages(spark, sf_small)
    return (
        p.withColumn(
            "lat",
            F.when(F.col("doc_id") % 25 == 0, F.lit(SENTINEL)).otherwise(F.col("lat")),
        )
        .withColumn(
            "lon",
            F.when(F.col("doc_id") % 40 == 3, F.lit(float("nan"))).otherwise(F.col("lon")),
        )
        .withColumn("valid_flag", F.col("doc_id") % 10 != 1)
        .cache()
    )


def test_nodata_rows_excluded_and_counted(pages_with_nodata):
    n = pages_with_nodata.count()
    n_sentinel = pages_with_nodata.filter(F.col("lat") == SENTINEL).count()
    n_nan = pages_with_nodata.filter(F.isnan("lon")).count()
    assert n_sentinel > 0 and n_nan > 0

    tiles, plan = cog_translate(pages_with_nodata, max_zoom=8, nodata=SENTINEL)
    base = tiles.filter(F.col("zoom") == 8)
    total = base.agg(F.sum("page_count")).first()[0]
    assert total == n - n_sentinel - n_nan
    # P6: mask band carries per-cell valid counts; N_MASKED the global tally
    assert base.agg(F.sum("mask_count")).first()[0] == total
    assert int(plan.properties["N_MASKED"]) == n_sentinel + n_nan
    assert plan.properties["NODATA"] == str(SENTINEL)


def test_alpha_validity_column(pages_with_nodata):
    clean = pages_with_nodata.filter(
        (F.col("lat") != SENTINEL) & ~F.isnan("lon")
    )
    n_invalid = clean.filter(~F.col("valid_flag")).count()
    tiles, plan = cog_translate(clean, max_zoom=8, validity_col="valid_flag")
    total = tiles.filter(F.col("zoom") == 8).agg(F.sum("page_count")).first()[0]
    assert total == clean.count() - n_invalid
    assert int(plan.properties["N_MASKED"]) == n_invalid


def test_nodata_beats_alpha_with_warning(pages_with_nodata):
    """image_rgba_nodata.tif analog (reference tests/test_cogeo.py:926-940,
    cogeo.py:225-229): both set → warn, sentinel wins."""
    with pytest.warns(NodataAlphaMaskWarning):
        valid, invalid = apply_nodata(
            pages_with_nodata, nodata=SENTINEL, validity_col="valid_flag"
        )
    # the alpha column must be IGNORED: rows with valid_flag=False but
    # good coordinates stay valid
    assert valid.filter(~F.col("valid_flag")).count() > 0


def test_colormap_multiband_raises(pages_with_nodata):
    """IncompatibleOptions on colormap + multiband (cogeo.py:231-234)."""
    with pytest.raises(IncompatibleOptions):
        cog_translate(
            pages_with_nodata, max_zoom=8, colormap={0: (0, 0, 0, 255)}
        )


def test_colormap_single_band_ok(spark, sf_small):
    from rio_cogeo_spark.operators.translate import BandSpec

    pages = synth_pages(spark, sf_small)
    one_band = [BandSpec("page_count", lambda: F.count(F.lit(1)).cast("long"), "sum")]
    tiles, plan = cog_translate(
        pages, max_zoom=8, bands=one_band, colormap={0: (0, 0, 0, 255), 1: (255, 0, 0, 255)}
    )
    assert plan.colormap is not None and len(plan.colormap) == 2


def test_tags_scales_offsets_forwarding(spark, sf_small):
    """cog_band_tags / image_with_offsets analogs (cogeo.py:395-437;
    reference tests/test_cogeo.py:326-354,472-488)."""
    pages = synth_pages(spark, sf_small)
    tiles, plan = cog_translate(
        pages,
        max_zoom=8,
        tags={"AREA_OR_POINT": "Point"},
        additional_cog_metadata={"ov_meta": "1"},
        band_scales=[2.0, 1.0, 1.0],
        band_offsets=[100.0, 0.0, 0.0],
        overview_resampling="sum",
    )
    p = plan.properties
    assert p["AREA_OR_POINT"] == "Point"
    assert p["ov_meta"] == "1"
    assert p["OVERVIEW_RESAMPLING"] == "SUM"
    assert p["TILING_SCHEME_NAME"] == "WebMercatorQuad"
    assert p["TILING_SCHEME_ZOOM_LEVEL"] == "8"
    assert plan.band_meta["page_count"]["scale"] == 2.0
    assert plan.band_meta["page_count"]["offset"] == 100.0
    assert plan.band_meta["sum_chars"]["scale"] == 1.0

    info = cog_info(
        tiles, tiles_meta(tiles, plan), plan.properties, band_meta=plan.band_meta
    )
    assert info.Tags["Image Metadata"]["AREA_OR_POINT"] == "Point"
    assert info.Band_Metadata["page_count"].Scale == 2.0
    assert info.Band_Metadata["page_count"].Offset == 100.0
