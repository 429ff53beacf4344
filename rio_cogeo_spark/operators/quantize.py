"""Int8 embedding quantization + integer-dot ANN — the memory/bandwidth
configuration of a 100 TB embedding store.

Symmetric per-corpus absmax quantization (the faiss/SQ8-style scalar
quantizer): one global aggregate finds ``amax = max |x|`` over every
dimension of every vector, then each component maps to
``clamp(floor(x * 127 / amax + 0.5), -127, 127)`` — a pure projection.
The quantized table is 4x smaller than float32 (8x vs float64), scans
4x faster, and scoring becomes an INTEGER dot product (exact, order-
independent — so unlike the float cosine contracts, which compare at
6dp, the ``ann_int8`` contract query is hash-exact on raw BIGINTs).

``floor(x + 0.5)`` rather than ``round`` on both engines: round()'s
half-way rule differs across engines (half-even vs half-away), floor's
does not — the twin expressions are textually identical.

Scale shape: the quantize pass is one scalar-aggregate broadcast + one
``transform`` projection (no shuffle); the brute top-k mirrors
similarity.ann_bruteforce_topk (queries broadcast, corpus never
shuffles, per-query TakeOrdered) with the IVF/LSH routing from
similarity.py as the scale path — quantization composes with either
(route first, score int8 inside the probed lists).

All-zero corpora have no scale (amax = 0 → NaN components); quantizing
nothing is not meaningful input and is not defended.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rio_cogeo_spark.functions.vector import as_double_array


def quantize_embeddings(
    emb: DataFrame,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """→ ``(id_col, q_embedding array<long>, amax double)``.

    One global absmax aggregate, broadcast back as a 1-row cross join
    (BroadcastNestedLoop of one row), then a pure ``transform``
    projection — the corpus never shuffles.
    """
    v = as_double_array(F.col(col))
    amax_df = emb.agg(
        F.max(F.array_max(F.transform(v, F.abs))).alias("amax")
    )
    qv = F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127.0),
            F.least(
                F.lit(127.0),
                F.floor(x * F.lit(127.0) / F.col("amax") + F.lit(0.5)),
            ),
        ).cast("long"),
    )
    return emb.crossJoin(F.broadcast(amax_df)).select(
        F.col(id_col), qv.alias("q_embedding"), "amax"
    )


def int_dot(a, b):
    """Exact integer dot product of two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ann_int8_topk(
    emb: DataFrame,
    k: int = 10,
    n_queries: int = 5,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force top-k by int8 dot product, queries drawn from the
    corpus (``vec_id < n_queries``), self-matches excluded.

    Output ``(query_id, vec_id, rank, qdot)`` — all integers, so the
    oracle comparison is exact, not rounded. Ties break by vec_id.
    """
    q = quantize_embeddings(emb, col, id_col)
    queries = F.broadcast(
        q.filter(F.col(id_col) < n_queries).select(
            F.col(id_col).alias("query_id"),
            F.col("q_embedding").alias("q_vec"),
        )
    )
    pairs = q.crossJoin(queries).filter(F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col),
        int_dot(F.col("q_embedding"), F.col("q_vec")).alias("qdot"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("qdot"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "qdot")
    )
