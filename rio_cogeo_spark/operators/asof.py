"""As-of (most-recent-at-or-before) join — an operator Spark lacks
natively (pyspark_guide 'Common OLAP patterns').

Implementation is the shuffle-lean union-tag trick, all JVM-side:
union the left (probe) and right (state) rows with a tag, window over
(key, ts) ordered with state rows first at equal timestamps, and carry
the latest state forward with ``last(ignorenulls=True)``. One shuffle on
the key — no UDF, no per-group pandas merge — so it scales to any
probe-side cardinality; the right side is typically much smaller and
rides the same shuffle.

Semantics: for each left row, the right row with the greatest
``right.ts <= left.ts`` for the same key (ties: the state at exactly
left.ts wins) — identical to DuckDB's ``ASOF JOIN`` (the oracle).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: List[str],
    how: str = "inner",
) -> DataFrame:
    """Join each ``left`` row to the most recent ``right`` row at or
    before its timestamp.

    left: probe rows (key ``on``, time ``ts``, any payload).
    right: state rows (key ``on``, time ``ts``, ``value_cols``).
    how: 'inner' drops left rows with no prior state; 'left' keeps them
    with NULL state.
    """
    lcols = [c for c in left.columns]
    tagged_left = left.select(
        *lcols, F.lit(1).alias("_tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(on),
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols
          if c not in (on, ts)],
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).select(*lcols, "_tag", *[f"_r_{c}" for c in value_cols])

    unioned = tagged_left.unionByName(tagged_right)
    # state rows (_tag 0) sort before probe rows at the same timestamp →
    # a probe at t sees state at exactly t
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols, "_tag",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_tag") == 1).drop("_tag")
    for c in value_cols:
        out = out.withColumnRenamed(f"_asof_{c}", c)
    if how == "inner":
        out = out.filter(F.col(value_cols[0]).isNotNull())
    elif how != "left":
        raise ValueError(f"unknown how: {how}")
    return out
