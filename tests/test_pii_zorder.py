"""PII scrubbing + Z-order layout (round 3 additions)."""

import pytest
from pyspark.sql import functions as F

from rio_cogeo_spark.functions.text import pii_scrub
from rio_cogeo_spark.functions.tile import morton_key


def test_pii_scrub_goldens(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.org thanks"),
            (2, "server 192.168.1.250 then id 123456789 done"),
            (3, "a@b.io or c@d.co and 10.0.0.1"),
            (4, "nothing personal here 123 1.2 12.34.56"),
            (5, "user999@example.com has account 88887777666"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_ips"], rows[1]["n_ids"]) == (1, 0, 0)
    assert "<EMAIL>" in rows[1]["clean_text"]
    assert (rows[2]["n_emails"], rows[2]["n_ips"], rows[2]["n_ids"]) == (0, 1, 1)
    assert "<IP>" in rows[2]["clean_text"] and "<ID>" in rows[2]["clean_text"]
    assert (rows[3]["n_emails"], rows[3]["n_ips"]) == (2, 1)
    assert (rows[4]["n_emails"], rows[4]["n_ips"], rows[4]["n_ids"]) == (0, 0, 0)
    assert rows[4]["clean_text"] == "nothing personal here 123 1.2 12.34.56"
    # digits inside a redacted email are not double-counted as an ID run
    assert (rows[5]["n_emails"], rows[5]["n_ids"]) == (1, 1)
    assert "999" not in rows[5]["clean_text"]


def test_pii_scrub_drop_raw_text(spark):
    df = spark.createDataFrame([(1, "x@y.io")], "doc_id long, text string")
    out = pii_scrub(df, keep_text=False)
    assert "text" not in out.columns and "clean_text" in out.columns


def test_morton_key_goldens(spark):
    """Interleave goldens: (x, y) -> x bits on even positions, y on odd."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 5), (65535, 65535)],
        "x long, y long",
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    assert got[(2, 0)] == 4
    # 3=0b11, 5=0b101 -> interleave = 0b100111 = 39
    assert got[(3, 5)] == 39
    assert got[(65535, 65535)] == (1 << 32) - 1


def test_morton_locality_beats_rowmajor(spark):
    """The point of Z-order: a k x k window spans a bounded Morton range,
    while row-major spans nearly the whole key space across rows."""
    n = 64
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x long, y long")
    keyed = df.select(
        "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
    )
    win = keyed.filter(
        (F.col("x") >= 8) & (F.col("x") < 16) & (F.col("y") >= 8) & (F.col("y") < 16)
    )
    zmin, zmax = win.agg(F.min("z"), F.max("z")).first()
    # an aligned 8x8 window occupies exactly one contiguous 64-key block
    assert zmax - zmin == 63
    rowmajor_span = (15 * n + 15) - (8 * n + 8)
    assert (zmax - zmin) < rowmajor_span


def test_write_tiles_zorder_roundtrip(spark, tmp_path):
    from rio_cogeo_spark.operators.translate import (
        cog_translate,
        write_tiles_zorder,
    )
    from rio_cogeo_spark.synth import synth_pages

    pages = synth_pages(spark, "/root/testdata/sf0.001")
    tiles, _ = cog_translate(pages, max_zoom=6, overview_level=1)
    path = str(tmp_path / "ztiles")
    write_tiles_zorder(tiles, path, num_partitions=4)
    back = spark.read.parquet(path)
    assert back.count() == tiles.count()
    assert "zkey" in back.columns
    # zkey matches a fresh recompute for every row
    bad = back.filter(
        F.col("zkey") != morton_key(F.col("tile_x"), F.col("tile_y"))
    ).count()
    assert bad == 0
    # mass conserved per zoom vs the source tiles
    a = {r["zoom"]: r["s"] for r in
         tiles.groupBy("zoom").agg(F.sum("page_count").alias("s")).collect()}
    b = {r["zoom"]: r["s"] for r in
         back.groupBy("zoom").agg(F.sum("page_count").alias("s")).collect()}
    assert a == b
