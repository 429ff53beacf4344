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


def ivf_build_centroids(embeddings: DataFrame, vec_col: str = "embedding",
                        list_col: str = "label") -> np.ndarray:
    """IVF coarse quantizer: one centroid per inverted list. Uses the
    existing ``label`` partition as the list assignment (k-means-free;
    swap in any clustering at ingest). Returns (n_lists, dim)."""
    rows = (
        embeddings.groupBy(list_col)
        .agg(F.transform(
            F.aggregate(
                F.collect_list(vec_col),
                F.array_repeat(F.lit(0.0), F.size(F.first(vec_col))),
                lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b.cast("double")),
            ),
            lambda x: x / F.count(F.lit(1)),
        ).alias("centroid"))
        .orderBy(list_col)
        .collect()
    )
    return np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in rows])


def ivf_assign_lists(embeddings: DataFrame, centroids: np.ndarray,
                     vec_col: str = "embedding") -> DataFrame:
    """Add ``ivf_list`` = nearest centroid by cosine (one Lloyd step —
    the routing rule MUST be distance-based so that a query near vector v
    probes v's list; an arbitrary partition column is not routable).
    Vectorized: one matmul per Arrow batch."""
    norm_c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        return pd.Series((m @ norm_c.T).argmax(axis=1).astype(np.int32))

    return embeddings.withColumn("ivf_list", _assign(F.col(vec_col)))


def ann_ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 3,
    list_col: str = "label",
    include_self: bool = False,
) -> DataFrame:
    """IVF ANN: vectors are re-assigned to their nearest coarse centroid
    (seeded from ``list_col`` means); each query probes only its
    ``n_probe`` nearest inverted lists, then exact cosine + rank within
    them. Candidates shrink from |corpus| to ~n_probe/n_lists of it —
    the structure that scales to 10^12 vectors (lists = partitions)."""
    spark = embeddings.sparkSession
    centroids = ivf_build_centroids(embeddings, "embedding", list_col)
    norm_c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    indexed = ivf_assign_lists(embeddings, centroids)

    qrows = queries.collect()
    probe_rows = []
    for r in qrows:
        v = np.asarray(r["q_embedding"], dtype=np.float64)
        sims = norm_c @ (v / np.linalg.norm(v))
        for lst in np.argsort(-sims)[:n_probe]:
            probe_rows.append((r["query_id"], int(lst),
                               [float(x) for x in r["q_embedding"]]))
    probes = spark.createDataFrame(
        probe_rows, "query_id long, ivf_list int, q_embedding array<double>"
    )
    joined = indexed.join(F.broadcast(probes), "ivf_list", "inner")
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
