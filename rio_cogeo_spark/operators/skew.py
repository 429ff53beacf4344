"""Skew handling: explicit salted two-phase aggregation (SURVEY.md §4).

Spark's hash aggregates already do map-side partial aggregation, which
absorbs key skew for algebraic aggregates; explicit salting matters for
(a) ``applyInPandas``-style holistic per-group operators (see
operators/raster.py salt_partials) and (b) joins on skewed keys. This
module provides the generic salted groupBy used by both, plus a helper
that surfaces per-key row counts so jobs can *measure* their skew.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, keys: List[str], n_salt: int = 16) -> DataFrame:
    """Two-phase count: groupBy(keys + salt) partials, then final
    groupBy(keys). Result identical to a direct groupBy count.

    The salt MUST be a per-row source independent of the group key —
    ``rand(seed)`` here — so a hot key's rows actually fan out across
    ``n_salt`` partial groups. (A salt derived from the key alone hashes
    every row of the hot key to the same partial group, silently
    disabling the skew split.)
    """
    salted = df.withColumn("_salt", (F.rand(42) * n_salt).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(*keys).agg(F.sum("_c").alias("count"))


def key_skew_report(df: DataFrame, keys: List[str], top: int = 10) -> DataFrame:
    """Top-N hottest keys with share of total — the 'measure, don't
    guess' input for deciding n_salt."""
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("share", F.round(F.col("rows") / F.lit(total), 6))
        .orderBy(F.col("rows").desc())
        .limit(top)
    )
