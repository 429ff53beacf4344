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
    # Carry ALL value columns inside one non-null struct marker so that
    # (a) a state row whose values are NULL still registers as the most
    # recent match (last(ignorenulls) skips NULL *structs*, i.e. probe
    # rows, never NULL-valued state), and (b) 'no prior state' is the
    # struct being NULL — not value_cols[0] IS NULL, which would conflate
    # a NULL-valued match with no match (DuckDB ASOF JOIN semantics).
    marker = F.struct(*[F.col(c) for c in value_cols])
    marker_type = right.select(marker.alias("_r")).schema["_r"].dataType
    tagged_left = left.select(
        *lcols, F.lit(1).alias("_tag"),
        F.lit(None).cast(marker_type).alias("_r"),
    )
    tagged_right = right.select(
        F.col(on),
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols
          if c not in (on, ts)],
        F.lit(0).alias("_tag"),
        marker.alias("_r"),
    ).select(*lcols, "_tag", "_r")

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
        F.last("_r", ignorenulls=True).over(w).alias("_asof"),
    )
    out = carried.filter(F.col("_tag") == 1).drop("_tag")
    if how == "inner":
        out = out.filter(F.col("_asof").isNotNull())
    elif how != "left":
        raise ValueError(f"unknown how: {how}")
    for c in value_cols:
        out = out.withColumn(c, F.col(f"_asof.{c}"))
    return out.drop("_asof")
