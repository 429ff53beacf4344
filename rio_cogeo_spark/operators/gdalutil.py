"""GDAL command-line utility analogs over the tile grid.

The reference (rio-cogeo) rides on GDAL/rasterio for every raster
utility around the COG pipeline — ``gdalinfo -hist``, ``gdal_translate
-scale``, ``gdallocationinfo``, ``gdal_merge.py``, ``gdaldem
color-relief`` (reference cogeo.py delegates to rasterio dataset reads,
utils.py:125-140 to the block grid). These are their Spark-first forms
over the ``(tile_x, tile_y, value)`` grid: exact integer contracts,
broadcast-only small sides, and the corpus-facing fold pinned so it
never runs twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def raster_hist(
    tiles: DataFrame,
    n_buckets: int = 16,
    value_col: str = "page_count",
    reuse: bool = True,
) -> DataFrame:
    """Value histogram of the tile grid — the ``gdalinfo -hist`` analog
    (GDAL reports a bucketed pixel-value histogram per band). Buckets
    are ``n_buckets`` equal-width integer bins over the OBSERVED
    ``[vmin, vmax]``: ``bucket = min(n−1, ((v − vmin)·n) div (vmax −
    vmin + 1))`` — pure BIGINT, no doubles, and the ``+1`` keeps the
    max value inside the last bucket without a special case.
    Zero-count buckets are emitted (the chi_square full-marginal
    convention). Returns ``(bucket, lo, hi, n_cells)`` where
    ``[lo, hi]`` are the bucket's inclusive integer bounds.

    Scale design: the tile fold is read by the (vmin, vmax) 1-row
    aggregate AND the bucket fold — localCheckpoint-pinned
    (``reuse=True``) so it computes ONCE; both joins broadcast (1-row
    bounds, ``n_buckets``-row bucket spine).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    spark = tiles.sparkSession
    vals = tiles.select(F.col(value_col).cast("long").alias("v"))
    if reuse:
        # the bounds aggregate and the bucket fold both read this
        vals = vals.localCheckpoint(eager=False)
    bounds = vals.agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax")
    )
    width = F.col("vmax") - F.col("vmin") + F.lit(1)
    obs = (
        vals.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.lit(n_buckets - 1),
                F.expr(f"((v - vmin) * {n_buckets}) div (vmax - vmin + 1)"),
            ).cast("long").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_cells"))
    )
    spine = spark.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket")
    ).crossJoin(F.broadcast(bounds))
    return (
        spine.join(F.broadcast(obs), "bucket", "left")
        .select(
            "bucket",
            F.expr(
                f"vmin + (bucket * (vmax - vmin + 1)) div {n_buckets}"
            ).cast("long").alias("lo"),
            F.expr(
                f"vmin + ((bucket + 1) * (vmax - vmin + 1)) div {n_buckets}"
                " - 1"
            ).cast("long").alias("hi"),
            F.coalesce(F.col("n_cells"), F.lit(0)).cast("long")
            .alias("n_cells"),
        )
    )


def raster_hist_sql(
    base_cte: str, n_buckets: int = 16, value_col: str = "page_count"
) -> str:
    """DuckDB twin of :func:`raster_hist` — ``base_cte`` exposes
    ``base`` with ``value_col`` (WITH included)."""
    return f"""{base_cte}
, rh_v AS (SELECT CAST({value_col} AS BIGINT) AS v FROM base)
, rh_b AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM rh_v)
, rh_o AS (SELECT least({n_buckets - 1},
                        ((v - vmin) * {n_buckets}) // (vmax - vmin + 1))
                      AS bucket,
                  COUNT(*) AS n_cells
           FROM rh_v CROSS JOIN rh_b GROUP BY 1)
, rh_s AS (SELECT r.range AS bucket, b.vmin, b.vmax
           FROM range({n_buckets}) r CROSS JOIN rh_b b)
SELECT CAST(s.bucket AS BIGINT) AS bucket,
       CAST(s.vmin + (s.bucket * (s.vmax - s.vmin + 1)) // {n_buckets}
            AS BIGINT) AS lo,
       CAST(s.vmin + ((s.bucket + 1) * (s.vmax - s.vmin + 1))
            // {n_buckets} - 1 AS BIGINT) AS hi,
       CAST(COALESCE(o.n_cells, 0) AS BIGINT) AS n_cells
FROM rh_s s LEFT JOIN rh_o o ON s.bucket = o.bucket"""


def scale_bytes(
    tiles: DataFrame,
    value_col: str = "page_count",
    lo: int = 0,
    hi: int = 255,
    reuse: bool = True,
) -> DataFrame:
    """Linear rescale of the tile values onto ``[lo, hi]`` — the
    ``gdal_translate -scale`` analog (GDAL maps src min/max onto the
    dst range; the classic byte-ification before visual tiling).
    Exact integer contract: ``scaled = lo + ((v − vmin)·(hi − lo))
    div max(1, vmax − vmin)`` — the ``max(1, ·)`` makes a constant
    input map to ``lo`` (GDAL's degenerate-range behavior) instead of
    dividing by zero. Returns ``(tile_x, tile_y, v, scaled)``.

    Scale design: the (vmin, vmax) 1-row aggregate broadcasts back
    onto the pinned tile fold; the rescale is one projection.
    """
    if hi < lo:
        raise ValueError(f"hi must be >= lo, got [{lo}, {hi}]")
    base = tiles.select(
        F.col("tile_x").cast("long").alias("tile_x"),
        F.col("tile_y").cast("long").alias("tile_y"),
        F.col(value_col).cast("long").alias("v"),
    )
    if reuse:
        base = base.localCheckpoint(eager=False)
    bounds = base.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    return base.crossJoin(F.broadcast(bounds)).select(
        "tile_x", "tile_y", "v",
        F.expr(
            f"{lo} + ((v - vmin) * {hi - lo}) div greatest(1, vmax - vmin)"
        ).cast("long").alias("scaled"),
    )


def scale_bytes_sql(
    base_cte: str, value_col: str = "page_count", lo: int = 0, hi: int = 255
) -> str:
    """DuckDB twin of :func:`scale_bytes`."""
    return f"""{base_cte}
, sb_v AS (SELECT tile_x, tile_y, CAST({value_col} AS BIGINT) AS v
           FROM base)
, sb_b AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM sb_v)
SELECT tile_x, tile_y, v,
       CAST({lo} + ((v - vmin) * {hi - lo})
            // greatest(1, vmax - vmin) AS BIGINT) AS scaled
FROM sb_v CROSS JOIN sb_b"""


def locationinfo(
    tiles: DataFrame,
    points: DataFrame,
    zoom: int,
    value_col: str = "page_count",
) -> DataFrame:
    """Point query against the tile grid — the ``gdallocationinfo``
    analog: for each named (lon, lat) point, the value of the tile it
    falls in (NULL when the tile is absent — GDAL's nodata report).
    ``points`` must expose ``(name, lon, lat)``. Returns
    ``(name, tile_x, tile_y, value)``.

    Scale design: the point set is tiny and BROADCASTS as the build
    side of an INNER join against the streamed tile table (one corpus
    scan, zero tile shuffle); the absent-point NULLs come from a
    point-bounded left join of the point spine onto those hits — the
    big side never carries the outer join.
    """
    from .translate import assign_tiles

    pts = assign_tiles(points, zoom).select(
        "name", F.col("tile_x").cast("long").alias("tile_x"),
        F.col("tile_y").cast("long").alias("tile_y"),
    )
    hits = tiles.select(
        F.col("tile_x").cast("long").alias("tile_x"),
        F.col("tile_y").cast("long").alias("tile_y"),
        F.col(value_col).cast("long").alias("value"),
    ).join(F.broadcast(pts), ["tile_x", "tile_y"], "inner")
    return (
        pts.join(F.broadcast(hits.select("name", "value")), "name", "left")
        .select("name", "tile_x", "tile_y", "value")
    )


def locationinfo_sql(
    base_cte: str,
    points_values: str,
    tx_sql: str,
    ty_sql: str,
    value_col: str = "page_count",
) -> str:
    """DuckDB twin of :func:`locationinfo`. ``points_values`` is a SQL
    VALUES list ``(name, lon, lat)``; ``tx_sql``/``ty_sql`` are the
    shared tile-index expressions over ``lon``/``lat``
    (:func:`rio_cogeo_spark.functions.tile.tile_xy_sql`)."""
    return f"""{base_cte}
, li_p AS (SELECT name, {tx_sql} AS tile_x, {ty_sql} AS tile_y
           FROM (VALUES {points_values}) pts(name, lon, lat))
SELECT p.name AS name, p.tile_x, p.tile_y,
       CAST(b.{value_col} AS BIGINT) AS value
FROM li_p p LEFT JOIN base b USING (tile_x, tile_y)"""


def mosaic(
    a: DataFrame,
    b: DataFrame,
    value_col: str = "page_count",
) -> DataFrame:
    """Priority mosaic of two tile grids — the ``gdal_merge.py`` analog
    (last-listed wins in GDAL; here grid ``a`` wins where both are
    present, the documented priority). Returns ``(tile_x, tile_y,
    value, src)`` with ``src ∈ {'a', 'b'}``.

    Scale design: ONE co-partitioned full-outer shuffle join on the
    tile key (both sides tile-bounded — never corpus-bounded); the
    coalesce is a projection.
    """
    pa = a.select(
        F.col("tile_x").cast("long").alias("tile_x"),
        F.col("tile_y").cast("long").alias("tile_y"),
        F.col(value_col).cast("long").alias("_va"),
    )
    pb = b.select(
        F.col("tile_x").cast("long").alias("tile_x"),
        F.col("tile_y").cast("long").alias("tile_y"),
        F.col(value_col).cast("long").alias("_vb"),
    )
    return pa.join(pb, ["tile_x", "tile_y"], "full_outer").select(
        "tile_x", "tile_y",
        F.coalesce(F.col("_va"), F.col("_vb")).cast("long").alias("value"),
        F.when(F.col("_va").isNotNull(), F.lit("a")).otherwise(F.lit("b"))
        .alias("src"),
    )


def mosaic_sql(a_cte: str, b_cte: str, value_col: str = "page_count") -> str:
    """DuckDB twin of :func:`mosaic`. ``a_cte``/``b_cte`` are SELECTs
    exposing ``(tile_x, tile_y, value_col)``."""
    return f"""
WITH mo_a AS ({a_cte}), mo_b AS ({b_cte})
SELECT COALESCE(a.tile_x, b.tile_x) AS tile_x,
       COALESCE(a.tile_y, b.tile_y) AS tile_y,
       CAST(COALESCE(a.{value_col}, b.{value_col}) AS BIGINT) AS value,
       CASE WHEN a.{value_col} IS NOT NULL THEN 'a' ELSE 'b' END AS src
FROM mo_a a FULL OUTER JOIN mo_b b
  ON a.tile_x = b.tile_x AND a.tile_y = b.tile_y"""


def color_relief(
    tiles: DataFrame,
    breaks: "list[tuple[int, str]]",
    value_col: str = "page_count",
) -> DataFrame:
    """Classified relief of the tile values — the ``gdaldem
    color-relief`` analog in its EXACT-class form (GDAL's default
    interpolates colors between ramp entries; the ``-exact-color-entry``
    mode assigns the band, which is the form a class map needs).
    ``breaks`` is an ascending list of ``(threshold, label)``; a cell
    gets the label of the LARGEST threshold ≤ its value, or
    ``'below'`` when under the first. Pure projection — the ramp is a
    plan literal; zero joins, zero shuffles. Returns
    ``(tile_x, tile_y, v, cls)``.
    """
    if not breaks:
        raise ValueError("breaks must be non-empty")
    ts = [t for t, _ in breaks]
    if ts != sorted(ts) or len(set(ts)) != len(ts):
        raise ValueError("break thresholds must be strictly ascending")
    expr = F.lit("below")
    for t, label in breaks:  # ascending: later (larger) wins
        expr = F.when(F.col("v") >= F.lit(t), F.lit(label)).otherwise(expr)
    return tiles.select(
        F.col("tile_x").cast("long").alias("tile_x"),
        F.col("tile_y").cast("long").alias("tile_y"),
        F.col(value_col).cast("long").alias("v"),
    ).withColumn("cls", expr)


def color_relief_sql(
    base_cte: str,
    breaks: "list[tuple[int, str]]",
    value_col: str = "page_count",
) -> str:
    """DuckDB twin of :func:`color_relief`."""
    if not breaks:
        raise ValueError("breaks must be non-empty")
    cases = " ".join(
        f"WHEN v >= {t} THEN '{label}'" for t, label in reversed(breaks)
    )
    return f"""{base_cte}
SELECT tile_x, tile_y, CAST({value_col} AS BIGINT) AS v,
       CASE {cases} ELSE 'below' END AS cls
FROM base"""
