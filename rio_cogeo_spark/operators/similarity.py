"""Similarity search over embeddings: exact brute-force cosine top-k
(baseline) and an LSH-bucketed approximate path (scale).

Scale design: brute-force is one broadcast of the (small) query set and a
linear scan — right answer for ≤10^3 queries over any corpus size, since
the big side never shuffles and top-k folds map-side via the window's
partial rank... at true 10^12-vector scale the LSH variant buckets both
sides by random-hyperplane sign bits so each query only scans its bucket
ring; recall is tested against brute force at sandbox scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rio_cogeo_spark.functions.vector import cosine_rounded


def ann_bruteforce_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    queries: (query_id long/string, q_embedding array<float>). Output:
    (query_id, vec_id, rank, cos) — rank by (cos DESC, vec_id ASC) on the
    6dp-rounded cosine so ranking is oracle-stable.
    """
    joined = embeddings.crossJoin(F.broadcast(queries))
    if not include_self:
        joined = joined.filter(F.col("vec_id") != F.col("query_id"))
    cos = cosine_rounded(F.col("embedding"), F.col("q_embedding"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        joined.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cos")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(df: DataFrame, vec_col: str, dim: int, n_planes: int = 8,
               seed: int = 42) -> DataFrame:
    """Add a random-hyperplane sign-bucket column (int, 2**n_planes
    buckets). Vectorized: one matmul per Arrow batch."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf("int")
    def _bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        signs = (m @ planes.T) > 0
        vals = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        return pd.Series(vals.astype(np.int32))

    return df.withColumn("bucket", _bucket(F.col(vec_col)))


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    include_self: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    (plus hamming-1 neighbor buckets for recall), then exact cosine + rank.
    """
    emb_b = lsh_bucket(embeddings, "embedding", dim, n_planes, seed)

    q_b = lsh_bucket(queries, "q_embedding", dim, n_planes, seed)
    # expand query buckets to hamming-1 ring
    ring = F.array(
        F.col("bucket").cast("int"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("int") for i in range(n_planes)],
    )
    q_ring = q_b.withColumn("bucket", F.explode(ring))

    joined = emb_b.join(q_ring, "bucket", "inner")
    if not include_self:
        joined = joined.filter(F.col("vec_id") != F.col("query_id"))
    cos = cosine_rounded(F.col("embedding"), F.col("q_embedding"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        joined.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cos")
    )
