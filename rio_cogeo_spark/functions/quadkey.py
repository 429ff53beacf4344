"""Quadkey codec — Bing-maps tile addressing over the quad grid.

The third tile-key scheme beside row-major COG order (translate.py
write_tiles) and the Z-order BIGINT key (functions/tile.morton_key):
a base-4 STRING whose digit i is the quadrant at zoom i+1
(digit = x_bit | y_bit << 1, MSB first). Its defining property — the
quadkey of any ancestor is a PREFIX of its descendants' quadkeys —
turns pyramid subtree reads into string-prefix range scans
(``LIKE 'qk%'`` / min-max pruning on a sorted column) and makes the
parent relation ``substr(qk, 1, z-1)``, which is why serving stacks
key tile stores this way (morecantile/mercantile expose the same codec,
reference dependency surface).

Spark side: pure CASE/concat expressions over bit tests — whole-stage
codegen, no UDF; :func:`quadkey_sql` emits the textually identical
ANSI form so DuckDB produces byte-identical strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quadkey(tile_x: Column, tile_y: Column, zoom: int) -> Column:
    """(tile_x, tile_y) at ``zoom`` → quadkey string (length == zoom).

    Zoom 0 has one tile and the empty quadkey; digit order is MSB
    first, so ``substr(quadkey, 1, k)`` is the zoom-k ancestor's key.
    """
    if zoom < 0:
        raise ValueError(f"zoom must be >= 0, got {zoom}")
    if zoom == 0:
        return F.lit("")
    x = tile_x.cast("long")
    y = tile_y.cast("long")
    digits = []
    for i in range(zoom, 0, -1):
        b = i - 1
        d = (
            F.shiftright(x, b).bitwiseAND(F.lit(1))
            + F.shiftright(y, b).bitwiseAND(F.lit(1)) * F.lit(2)
        )
        digits.append(d.cast("string"))
    return F.concat(*digits)


def quadkey_sql(x_expr: str, y_expr: str, zoom: int) -> str:
    """DuckDB/ANSI twin of :func:`quadkey` — same digit expressions,
    byte-identical output. ``x_expr``/``y_expr`` should be simple
    column references (each appears ``zoom`` times)."""
    if zoom < 0:
        raise ValueError(f"zoom must be >= 0, got {zoom}")
    if zoom == 0:
        return "''"
    parts = []
    for i in range(zoom, 0, -1):
        b = i - 1
        parts.append(
            f"CAST((({x_expr} >> {b}) & 1) + ((({y_expr} >> {b}) & 1) * 2)"
            " AS VARCHAR)"
        )
    return "(" + " || ".join(parts) + ")"


def quadkey_decode(qk: str) -> "tuple[int, int, int]":
    """Driver-side inverse: quadkey string → (tile_x, tile_y, zoom).
    Raises on characters outside 0-3."""
    x = y = 0
    for ch in qk:
        d = ord(ch) - ord("0")
        if not 0 <= d <= 3:
            raise ValueError(f"invalid quadkey digit {ch!r} in {qk!r}")
        x = (x << 1) | (d & 1)
        y = (y << 1) | (d >> 1)
    return x, y, len(qk)
