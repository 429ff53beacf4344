"""spark-submit entry point (north_rule invocation mode):

    cd /root/repo && ./scripts/package.sh          # -> dist/rio_cogeo_spark.zip
    spark-submit --master local[8] \\
        --py-files dist/rio_cogeo_spark.zip \\
        scripts/submit_job.py /root/testdata/sf0.001 /tmp/submit_out

Builds the resumable tile pyramid (atomic level commits + per-partition
lineage manifests), validates it, and prints one JSON status line. On a
real cluster only --master changes (the library ships via --py-files —
no installation on executors needed).
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/submit_out"
    max_zoom = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    spark = (
        SparkSession.builder.appName("rio_cogeo_spark_submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # imports resolve from the --py-files zip on the driver AND executors
    from rio_cogeo_spark.operators.translate import TileJobPlan, tiles_meta  # noqa: F401
    from rio_cogeo_spark.operators.validate import cog_validate
    from rio_cogeo_spark.sources.pages import read_pyramid, resumable_pyramid
    from rio_cogeo_spark.synth import synth_pages

    pages = synth_pages(spark, sf_dir)
    plan, manifests = resumable_pyramid(pages, out_dir, max_zoom=max_zoom)
    tiles = read_pyramid(spark, out_dir)
    meta = tiles_meta(tiles, plan)
    ok, errors, warnings = cog_validate(tiles, meta, {"format": "parquet"})

    print(json.dumps({
        "status": "ok" if ok else "invalid",
        "zooms": [m["zoom"] for m in manifests],
        "n_tiles": {m["zoom"]: m["n_tiles"] for m in manifests},
        "partitions": sum(len(m["partitions"]) for m in manifests),
        "errors": errors,
        "warnings": warnings,
    }))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
