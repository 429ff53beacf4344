"""Geohash codec — the base-32 public-standard cousin of the quadkey
(functions/quadkey.py) and the Z-order BIGINT key (functions/tile.py
morton_key): latitude/longitude bisection bits interleaved LON-FIRST,
grouped in fives, mapped through the ``0123456789bcdefghjkmnpqrstuvwxyz``
alphabet (Niemeyer 2008; the scheme every geo store from Redis to ES
exposes). Same prefix property as the quadkey — an ancestor's geohash
prefixes its descendants' — so cell joins and bbox scans become string
prefix ranges.

Spark side: the fixed-point encode is pure integer/bit/concat
expressions (whole-stage codegen, no UDF); :func:`geohash_sql` emits the
textually identical ANSI form so DuckDB produces byte-identical strings.

Exactness: the bisection index is ``floor((lon+180)/360 * 2^k)`` clamped
to ``2^k − 1`` — one multiply + floor over IEEE doubles, identical on
both engines (the same derivation contract as grid.tile_index); all
downstream ops are integer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_counts(precision: int) -> "tuple[int, int]":
    """(lon_bits, lat_bits) for a geohash of ``precision`` chars —
    5·precision total, lon gets the extra bit on odd totals."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    return lon_bits, total - lon_bits


def geohash(lat: Column, lon: Column, precision: int = 7) -> Column:
    """(lat, lon) → geohash string of ``precision`` chars (1..12)."""
    if not (1 <= precision <= 12):
        raise ValueError(f"precision must be in 1..12, got {precision}")
    lon_bits, lat_bits = _bit_counts(precision)
    # bisection fixed-point indexes (clamped to the top cell)
    ix = F.least(
        F.floor((lon.cast("double") + F.lit(180.0)) / F.lit(360.0)
                * F.lit(float(2 ** lon_bits))).cast("long"),
        F.lit(2 ** lon_bits - 1),
    )
    iy = F.least(
        F.floor((lat.cast("double") + F.lit(90.0)) / F.lit(180.0)
                * F.lit(float(2 ** lat_bits))).cast("long"),
        F.lit(2 ** lat_bits - 1),
    )
    # interleave MSB-first, lon first: bit j of the stream (j = 0 is
    # the most significant) comes from lon when j is even
    chars = []
    for c in range(precision):
        code = F.lit(0)
        for b in range(5):
            j = c * 5 + b  # global bit position, MSB first
            if j % 2 == 0:
                src, nbits = ix, lon_bits
                pos = j // 2
            else:
                src, nbits = iy, lat_bits
                pos = j // 2
            bit = F.shiftright(src, nbits - 1 - pos).bitwiseAND(F.lit(1))
            code = code + bit * F.lit(1 << (4 - b))
        chars.append(code)
    # map each 5-bit code through the alphabet: substr(alphabet,
    # code+1, 1) — 1-based, same text as the SQL twin
    out = [
        F.lit(BASE32).substr((code + F.lit(1)).cast("int"), F.lit(1))
        for code in chars
    ]
    return F.concat(*out)


def geohash_sql(lat_expr: str, lon_expr: str, precision: int = 7) -> str:
    """DuckDB/ANSI twin of :func:`geohash` — identical fixed-point and
    bit expressions, byte-identical strings. ``lat_expr``/``lon_expr``
    should be simple column references."""
    if not (1 <= precision <= 12):
        raise ValueError(f"precision must be in 1..12, got {precision}")
    lon_bits, lat_bits = _bit_counts(precision)
    ix = (f"least(CAST(floor(({lon_expr} + 180.0) / 360.0 * "
          f"{float(2 ** lon_bits)!r}) AS BIGINT), {2 ** lon_bits - 1})")
    iy = (f"least(CAST(floor(({lat_expr} + 90.0) / 180.0 * "
          f"{float(2 ** lat_bits)!r}) AS BIGINT), {2 ** lat_bits - 1})")
    parts = []
    for c in range(precision):
        terms = []
        for b in range(5):
            j = c * 5 + b
            if j % 2 == 0:
                src, nbits, pos = ix, lon_bits, j // 2
            else:
                src, nbits, pos = iy, lat_bits, j // 2
            terms.append(
                f"((({src}) >> {nbits - 1 - pos}) & 1) * {1 << (4 - b)}"
            )
        code = " + ".join(terms)
        parts.append(f"substr('{BASE32}', CAST(({code}) AS INT) + 1, 1)")
    return " || ".join(parts)


def geohash_decode_bounds(gh: str) -> "tuple[float, float, float, float]":
    """Driver-side decode: geohash → (lon_min, lat_min, lon_max,
    lat_max) cell bounds. The inverse contract for
    :func:`geohash`-encoded keys (prefix scans need the bbox of a
    prefix; this is how a consumer turns a geohash range back into
    coordinates)."""
    if not gh:
        raise ValueError("geohash must be non-empty")
    lon_lo, lon_hi = -180.0, 180.0
    lat_lo, lat_hi = -90.0, 90.0
    even = True
    for ch in gh:
        try:
            code = BASE32.index(ch)
        except ValueError:
            raise ValueError(f"invalid geohash char: {ch!r}") from None
        for b in range(4, -1, -1):
            bit = (code >> b) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2.0
                lon_lo, lon_hi = (mid, lon_hi) if bit else (lon_lo, mid)
            else:
                mid = (lat_lo + lat_hi) / 2.0
                lat_lo, lat_hi = (mid, lat_hi) if bit else (lat_lo, mid)
            even = not even
    return lon_lo, lat_lo, lon_hi, lat_hi
