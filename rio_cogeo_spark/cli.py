"""CLI mirroring the reference's ``rio cogeo`` subcommands
(/root/reference/rio_cogeo/scripts/cli.py:84-480): create / validate /
info, re-targeted at pages→tiles pyramid builds.

Usage:
  python -m rio_cogeo_spark.cli create  <pages_path> <out_dir> [--max-zoom Z]
      [--overview-level N] [--decimation-base B] [--profile NAME] [--resume]
  python -m rio_cogeo_spark.cli validate <tiles_dir> [--strict]
  python -m rio_cogeo_spark.cli info     <tiles_dir> [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _session(cpus: int):
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rio_cogeo_spark_cli")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _meta_from_dir(spark, tiles_dir):
    from rio_cogeo_spark.operators.translate import TileJobPlan, tiles_meta
    from rio_cogeo_spark.sources.pages import read_pyramid

    tiles = read_pyramid(spark, tiles_dir)
    zooms = sorted(r["zoom"] for r in tiles.select("zoom").distinct().collect())
    plan_path = os.path.join(tiles_dir, "_plan.json")
    with open(plan_path) as f:
        pj = json.load(f)
    plan = TileJobPlan(
        max_zoom=pj["max_zoom"],
        min_zoom=pj["min_zoom"],
        decimation_base=pj["decimation_base"],
        blocksize=pj["blocksize"],
        extent=tuple(pj["extent"]),
        width_px=pj["width_px"],
        height_px=pj["height_px"],
        decimations=pj["decimations"],
    )
    return tiles, tiles_meta(tiles, plan), plan, zooms


def parse_nodata(value):
    """Nodata option parse — the reference's NodataParamType
    (scripts/cli.py:46-63): 'nan' → NaN, 'none'/'nil' → None, else float;
    anything else is a usage error."""
    if value is None:
        return None
    v = value.lower()
    if v == "nan":
        return float("nan")
    if v in ("none", "nil"):
        return None
    try:
        return float(value)
    except ValueError as exc:
        raise argparse.ArgumentTypeError(f"{value} is not a valid nodata value") from exc


def cmd_create(args) -> int:
    spark = _session(args.cpus)
    from rio_cogeo_spark.profiles import cog_profiles
    from rio_cogeo_spark.sources.pages import read_pages, resumable_pyramid

    cog_profiles.get(args.profile)  # KeyError on unknown, like the reference
    pages = read_pages(spark, args.pages_path)
    if args.nodata is not None:
        from rio_cogeo_spark.operators.translate import apply_nodata

        pages, _ = apply_nodata(pages, nodata=args.nodata)
    plan, manifests = resumable_pyramid(
        pages,
        args.out_dir,
        max_zoom=args.max_zoom,
        overview_level=args.overview_level,
        decimation_base=args.decimation_base,
    )
    with open(os.path.join(args.out_dir, "_plan.json"), "w") as f:
        json.dump(
            {
                "max_zoom": plan.max_zoom,
                "min_zoom": plan.min_zoom,
                "decimation_base": plan.decimation_base,
                "blocksize": plan.blocksize,
                "extent": list(plan.extent or ()),
                "width_px": plan.width_px,
                "height_px": plan.height_px,
                "decimations": plan.decimations,
                "profile": args.profile,
            },
            f,
        )
    for m in manifests:
        print(f"zoom {m['zoom']}: {m['n_tiles']} tiles "
              f"({len(m['partitions'])} partitions)", file=sys.stderr)
    print(f"wrote pyramid zooms {plan.min_zoom}..{plan.max_zoom} to {args.out_dir}",
          file=sys.stderr)
    spark.stop()
    return 0


def cmd_validate(args) -> int:
    spark = _session(args.cpus)
    from rio_cogeo_spark.operators.validate import cog_validate

    tiles, meta, _, _ = _meta_from_dir(spark, args.tiles_dir)
    ok, errors, warnings = cog_validate(
        tiles, meta, {"format": "parquet"}, strict=args.strict
    )
    for e in errors:
        print(f"ERROR: {e}", file=sys.stderr)
    for w in warnings:
        print(f"WARNING: {w}", file=sys.stderr)
    print(f"{args.tiles_dir} is {'a valid' if ok else 'NOT a valid'} cloud "
          f"optimized pyramid")
    spark.stop()
    return 0 if ok else 1


def cmd_info(args) -> int:
    spark = _session(args.cpus)
    from rio_cogeo_spark.operators.info import cog_info

    tiles, meta, _, _ = _meta_from_dir(spark, args.tiles_dir)
    info = cog_info(tiles, meta, {"format": "parquet"}, path=args.tiles_dir)
    if args.json:
        print(json.dumps(info.dict(), default=str))
    else:
        d = info.dict()
        print(f"Path: {d['Path']}\nDriver: {d['Driver']}\nCOG: {d['COG']}")
        print(f"Bands: {d['Profile']['Bands']}  "
              f"Size: {d['Profile']['Width']}x{d['Profile']['Height']}")
        print(f"Zoom: {d['GEO']['MinZoom']}..{d['GEO']['MaxZoom']}  "
              f"CRS: {d['GEO']['CRS']}")
        for ifd in d["IFD"]:
            print(f"  level {ifd['Level']}: {ifd['Width']}x{ifd['Height']} "
                  f"dec {ifd['Decimation']}")
    spark.stop()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rio_cogeo_spark")
    p.add_argument("--cpus", type=int, default=8)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create")
    c.add_argument("pages_path")
    c.add_argument("out_dir")
    c.add_argument("--max-zoom", type=int, default=8, dest="max_zoom")
    c.add_argument("--overview-level", type=int, default=None, dest="overview_level")
    c.add_argument("--decimation-base", type=int, default=2, dest="decimation_base")
    c.add_argument("--profile", default="zstd")
    c.add_argument("--nodata", type=parse_nodata, default=None)
    c.set_defaults(fn=cmd_create)

    v = sub.add_parser("validate")
    v.add_argument("tiles_dir")
    v.add_argument("--strict", action="store_true")
    v.set_defaults(fn=cmd_validate)

    i = sub.add_parser("info")
    i.add_argument("tiles_dir")
    i.add_argument("--json", action="store_true")
    i.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
