"""``cog_info`` analog (/root/reference/rio_cogeo/cogeo.py:730-853):
aggregate ``tiles`` + ``tiles_meta`` + properties into the typed
:class:`rio_cogeo_spark.models.Info` describe-model.

Pure metadata aggregates (a handful of collect()s over the tiny meta
table plus min/max over tiles) — mirrors the reference, which reads only
TIFF tags/IFDs, never pixels.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rio_cogeo_spark import grid
from rio_cogeo_spark.models import BandMetadata, Geo, IFD, Info, Profile
from rio_cogeo_spark.operators.validate import cog_validate


def _build_tags(
    properties: Dict[str, str], ns_tags: Optional[Dict[str, Dict[str, str]]]
) -> Dict[str, Dict[str, str]]:
    """``Info.Tags`` in the reference's nested-namespace shape
    (cogeo.py:750-755): flat dataset tags under ``Image Metadata``, the
    structural namespace under ``Image Structure``, then every custom
    namespace title-cased (``str.title(ns).replace('_', ' ')``), with
    DERIVED_SUBDATASETS skipped."""
    tags: Dict[str, Dict[str, str]] = {
        "Image Metadata": {k: str(v) for k, v in properties.items()},
        "Image Structure": {"LAYOUT": "COG"},
    }
    for ns, kv in (ns_tags or {}).items():
        if ns == "DERIVED_SUBDATASETS":
            continue
        key = str.title(ns).replace("_", " ")
        tags[key] = {**tags.get(key, {}), **{str(k): str(v) for k, v in kv.items()}}
    return tags


def cog_info(
    tiles: DataFrame,
    meta: DataFrame,
    properties: Optional[Dict[str, str]] = None,
    path: str = "tiles",
    band_meta: Optional[Dict[str, dict]] = None,
    colormap: Optional[Dict[int, tuple]] = None,
    ns_tags: Optional[Dict[str, Dict[str, str]]] = None,
) -> Info:
    properties = properties or {}
    is_valid, errors, warnings = cog_validate(tiles, meta, properties)

    meta_rows = sorted(meta.collect(), key=lambda r: r["zoom"])
    band_cols = [c for c in tiles.columns if c not in ("zoom", "tile_x", "tile_y")]

    max_row = meta_rows[-1]
    min_zoom, max_zoom = meta_rows[0]["zoom"], max_row["zoom"]

    # Extent of the base level in mercator coords (cogeo.py:809-816 analog).
    ext = (
        tiles.filter(F.col("zoom") == max_zoom)
        .agg(
            F.min("tile_x").alias("tx0"),
            F.max("tile_x").alias("tx1"),
            F.min("tile_y").alias("ty0"),
            F.max("tile_y").alias("ty1"),
        )
        .first()
    )
    w, s, _, _ = grid.tile_bounds_mercator([ext["tx0"]], [ext["ty1"]], max_zoom)
    _, _, e, n = grid.tile_bounds_mercator([ext["tx1"]], [ext["ty0"]], max_zoom)
    res = grid.cell_size(max_zoom)

    ifds = [
        IFD(
            Level=r["level"],
            Width=int(r["width"]),
            Height=int(r["height"]),
            Blocksize=(r["blocksize_x"], r["blocksize_y"]),
            Decimation=r["decimation"],
        )
        for r in sorted(meta_rows, key=lambda r: r["level"])
    ]

    # colormap / colorinterp forwarding (cogeo.py:337-360, models.py:50-53):
    # a single-band colormap dataset reports ColorInterp=('palette',) and
    # ColorMap=True; otherwise band names stand in for colorinterp.
    has_mask = "mask_count" in band_cols
    data_bands = [c for c in band_cols if c != "mask_count"]
    if colormap and len(data_bands) == 1:
        colorinterp: tuple = ("palette",)
    else:
        # data bands only: the internal mask is not a color band in the
        # reference (rasterio colorinterp never includes the mask plane)
        colorinterp = tuple(data_bands)
    bmeta = band_meta or {}
    # data bands only throughout the Profile: in the reference the
    # internal mask is not a band, so Bands/Scales/Offsets/ColorInterp
    # must agree in length (a consumer zips them)
    scales = tuple(float(bmeta.get(c, {}).get("scale", 1.0)) for c in data_bands)
    offsets = tuple(float(bmeta.get(c, {}).get("offset", 0.0)) for c in data_bands)
    nodata = (
        float(properties["NODATA"]) if properties.get("NODATA") is not None else None
    )
    # band dtype: the --dtype cast recorded in band_meta (reference
    # Profile.Dtype, models.py:37); int64 is the native band type
    cast_dtypes = {bmeta.get(c, {}).get("dtype") for c in data_bands} - {None}
    dtype = cast_dtypes.pop() if len(cast_dtypes) == 1 else "int64"

    return Info(
        Path=path,
        Driver=properties.get("format", "parquet"),
        COG=is_valid,
        Compression=properties.get("compression", "zstd"),
        ColorSpace=None,
        COG_errors=errors or None,
        COG_warnings=warnings or None,
        Profile=Profile(
            Bands=len(data_bands),
            Width=int(max_row["width"]),
            Height=int(max_row["height"]),
            Tiled=True,
            Dtype=str(dtype),
            Interleave="pixel",
            AlphaBand=False,
            InternalMask=has_mask,
            Nodata=nodata,
            ColorInterp=colorinterp,
            ColorMap=colormap is not None,
            Scales=scales,
            Offsets=offsets,
        ),
        GEO=Geo(
            CRS="EPSG:3857",
            BoundingBox=(float(w[0]), float(s[0]), float(e[0]), float(n[0])),
            Origin=(float(w[0]), float(n[0])),
            Resolution=(res, -res),
            MinZoom=min_zoom,
            MaxZoom=max_zoom,
        ),
        Tags=_build_tags(properties, ns_tags),
        Band_Metadata={
            name: BandMetadata(
                Description=name,
                ColorInterp=("palette" if colorinterp == ("palette",) else name),
                Scale=float(bm.get("scale", 1.0)),
                Offset=float(bm.get("offset", 0.0)),
                # merge rule + forwarded per-band tags (the reference's
                # Metadata = src_dst.tags(ix), cogeo.py:764)
                Metadata={
                    "merge": str(bm.get("merge", "")),
                    **{str(k): str(v) for k, v in (bm.get("tags") or {}).items()},
                },
            )
            for name, bm in bmeta.items()
        },
        IFD=ifds,
    )
