"""Range (interval) join — the other join Spark lacks natively
(pyspark_guide 'Common OLAP patterns': bucketize the range key +
equi-join on bucket + filter).

Naively, ``a JOIN b ON a.key = b.key AND abs(a.ts - b.ts) <= w`` plans as
an equi-join on key with a residual filter — fine when keys are selective,
quadratic inside a hot key. The bucketized form equi-joins on
(key, time_bucket) with each left row probing its own and both adjacent
buckets (bucket width = window), so per-bucket work is bounded by local
density — the standard interval-join decomposition used by stream
processors.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    window_seconds: int,
    left_cols: List[str],
    right_cols: List[str],
) -> DataFrame:
    """All (left, right) pairs with equal ``on`` and
    ``|left.ts - right.ts| <= window_seconds``.

    Output columns: left_cols + right_cols (caller aliases for
    uniqueness). One shuffle per side on (key, bucket).
    """
    w = window_seconds

    def bucketize(df: DataFrame, probe: bool) -> DataFrame:
        b = F.floor(F.unix_timestamp(ts) / w).cast("long")
        if not probe:
            return df.withColumn("_bucket", b)
        # probe side visits its own bucket and both neighbors
        return df.withColumn(
            "_bucket", F.explode(F.array(b - 1, b, b + 1))
        )

    lt = bucketize(left, probe=True).select(
        F.col(on).alias("_k"), F.col("_bucket"),
        F.unix_timestamp(ts).alias("_lts"), *left_cols,
    )
    rt = bucketize(right, probe=False).select(
        F.col(on).alias("_k"), F.col("_bucket"),
        F.unix_timestamp(ts).alias("_rts"), *right_cols,
    )
    joined = lt.join(rt, ["_k", "_bucket"], "inner").filter(
        F.abs(F.col("_lts") - F.col("_rts")) <= w
    )
    return joined.select(*left_cols, *right_cols).dropDuplicates(
        left_cols + right_cols
    )
