"""Bit-exactness gate for the JVM-expression tile assignment.

Compares the Arrow-UDF tile assignment (grid.tile_index via numpy) against
the Spark-SQL twin (functions.tile.tile_xy_sql via JVM ln/tan) over EVERY
(lon, lat) in every local dataset, at every zoom 0..20. The swap from the
pandas UDF to the JVM expression is only allowed if this prints
mismatches=0 for every (dataset, zoom) — same gate the oracle twins
already pass DuckDB-side (numpy == DuckDB libm on this data).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from rio_cogeo_spark.functions.tile import (tile_assign, tile_assign_udf,
                                            tile_xy_sql)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[12]")
        .appName("verify_tile_expr")
        .config("spark.sql.shuffle.partitions", "12")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from rio_cogeo_spark.synth import synth_pages

    sources = []
    for sf in ("sf0.001", "sf0.01", "sf0.1", "sf1.0"):
        p = f"/root/testdata/{sf}/documents.parquet"
        if os.path.exists(p):
            sources.append(
                (sf, synth_pages(spark, f"/root/testdata/{sf}").select("lat", "lon"))
            )
    # the replicated bench pages (jittered coords, 2M rows)
    for d in sorted(os.listdir("/tmp")):
        if d.startswith("bench_pages_"):
            sources.append((d, spark.read.parquet(f"/tmp/{d}").select("lat", "lon")))

    total_bad = 0
    for name, df in sources:
        df = df.dropna()
        for zoom in range(0, 21):
            u = tile_assign_udf(F.col("lon"), F.col("lat"), zoom)
            t = tile_assign(F.col("lon"), F.col("lat"), zoom)
            tx_sql, ty_sql = tile_xy_sql("lon", "lat", zoom)
            cmp = df.select(
                u["tile_x"].alias("ux"), u["tile_y"].alias("uy"),
                t["tile_x"].alias("jx"), t["tile_y"].alias("jy"),
                F.expr(tx_sql).alias("sx"), F.expr(ty_sql).alias("sy"),
            )
            bad = cmp.filter(
                (F.col("ux") != F.col("sx")) | (F.col("uy") != F.col("sy"))
                | (F.col("ux") != F.col("jx")) | (F.col("uy") != F.col("jy"))
            ).count()
            total_bad += bad
            if bad:
                print(f"MISMATCH {name} zoom={zoom}: {bad}")
        print(f"{name}: zooms 0..20 checked, cumulative mismatches={total_bad}")
    print(f"TOTAL mismatches: {total_bad}")
    spark.stop()
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
