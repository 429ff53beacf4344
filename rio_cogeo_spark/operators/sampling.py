"""Deterministic sampling / splitting for training-mix construction.

A 100 TB corpus is never sampled with ``rand()``: the sample must be
REPRODUCIBLE (resumable jobs, auditable mixes) and CONSISTENT across
engines and reruns. Standard trick: hash the stable row key to a uniform
[0, 1) value and threshold it. Everything here is a stateless JVM
projection — no shuffle, no state, embarrassingly parallel, and the
same row always lands on the same side of every threshold, so a rerun
or a backfill produces byte-identical samples.

The hash is the md5-prefix construction shared with
``rolling_fingerprint`` (functions/text.py): identical in Spark and
DuckDB, so every op here has an exact SQL twin.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rio_cogeo_spark.functions.text import MD5_60_SQL, md5_60

_U_MOD = 1_000_000  # 6 decimal digits of uniformity — plenty for rates


def uniform_hash(key: Column) -> Column:
    """Deterministic uniform [0, 1) from a stable key column: 60-bit md5
    prefix mod 10^6, scaled. Cross-engine identical (twin:
    :func:`uniform_hash_sql`)."""
    h = md5_60(key.cast("string"))
    return (h % _U_MOD).cast("double") / F.lit(float(_U_MOD))


def uniform_hash_sql(key: str) -> str:
    h = MD5_60_SQL.format(c=f"CAST({key} AS VARCHAR)")
    return (
        f"CAST({h} % {_U_MOD} AS DOUBLE) / CAST({_U_MOD} AS DOUBLE)"
    )


def sample_stratified(
    docs: DataFrame,
    rates: Dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its uniform
    hash < the stratum's rate — the training-mix primitive ("3x en,
    0.5x the tail"). Rows in strata absent from ``rates`` keep with
    ``default_rate``. Pure projection + filter: scales linearly, prunes
    at the scan when ``strata_col`` is a partition column."""
    u = uniform_hash(F.col(key_col))
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(r))).otherwise(
            rate
        )
    return docs.filter(u < rate)


def split_assign(
    docs: DataFrame,
    weights: Optional[List[Tuple[str, float]]] = None,
    key_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: cumulative-weight bins
    over the uniform hash. Weights need not sum to 1 (normalized).
    A row's split never changes across reruns or engines."""
    weights = weights or [("train", 0.98), ("val", 0.01), ("test", 0.01)]
    total = sum(w for _, w in weights)
    u = uniform_hash(F.col(key_col))
    expr = F.lit(weights[-1][0])  # remainder bucket
    acc = 0.0
    conds = []
    for name, w in weights[:-1]:
        acc += w / total
        conds.append((name, acc))
    for name, bound in reversed(conds):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    return docs.withColumn(out_col, expr)


def split_assign_sql(
    key: str,
    weights: Optional[List[Tuple[str, float]]] = None,
) -> str:
    """DuckDB twin of :func:`split_assign`'s split expression."""
    weights = weights or [("train", 0.98), ("val", 0.01), ("test", 0.01)]
    total = sum(w for _, w in weights)
    u = uniform_hash_sql(key)
    acc = 0.0
    cases = []
    for name, w in weights[:-1]:
        acc += w / total
        cases.append(
            f"WHEN {u} < CAST({acc!r} AS DOUBLE) THEN '{name}'"
        )
    return (
        "CASE " + " ".join(cases) + f" ELSE '{weights[-1][0]}' END"
    )
