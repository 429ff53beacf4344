"""Round-6 phase profiler: isolates the expensive sub-stages of the hot
bench queries with the noop sink (guide §1.4) so optimization targets the
measured cost, not the guessed one. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python scripts/profile_r06.py [probe ...]

Each probe prints one line: {"probe": name, "sec": min_of_2}.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPS = int(os.environ.get("PROFILE_REPS", "2"))


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_r06")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = min(int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
               int(os.environ.get("SPARK_GRAFT_MAX_EFFECTIVE", "12")))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    only = set(sys.argv[1:])

    probes: dict[str, object] = {}

    def probe(name, fn):
        if only and not any(name.startswith(p) for p in only):
            return
        best = None
        for _ in range(REPS):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({"probe": name, "sec": round(best, 3)}), flush=True)
        probes[name] = round(best, 3)

    # ---------------- minhash phases ----------------
    from rio_cogeo_spark.operators import dedup as DD

    probe("minhash/0_docs_scan", lambda: noop(docs))
    probe("minhash/1_signatures", lambda: noop(
        DD.minhash_signatures(docs, 128, 3, 42)))
    probe("minhash/1_signatures_sig_only", lambda: noop(
        DD.minhash_signatures(docs, 128, 3, 42).select("doc_id", "sig")))

    def _mh_bands():
        sigs = DD.minhash_signatures(docs, 128, 3, 42)
        noop(DD._band_table(sigs, 64, 2))
    probe("minhash/2_sig_plus_banding", _mh_bands)

    def _mh_cands():
        sigs = DD.minhash_signatures(docs, 128, 3, 42).persist()
        banded = DD._band_table(sigs, 64, 2)
        grouped = (banded.groupBy("band", "bucket")
                   .agg(F.collect_list("doc_id").alias("ids"))
                   .filter(F.size("ids") >= 2))
        cands = (grouped.select(F.explode("ids").alias("doc_a"), "ids")
                 .select("doc_a", F.explode("ids").alias("doc_b"))
                 .filter(F.col("doc_a") < F.col("doc_b"))
                 .dropDuplicates(["doc_a", "doc_b"]))
        noop(cands)
        sigs.unpersist()
    probe("minhash/3_sig_band_cands", _mh_cands)
    probe("minhash/4_full", lambda: noop(
        DD.minhash_lsh_pairs(docs, threshold=0.5, num_hashes=128, bands=64)))

    # ---------------- contamination phases ----------------
    from rio_cogeo_spark.operators.contamination import contamination_hits
    from rio_cogeo_spark.operators.dedup import shingles_col

    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    benchm = docs.filter(F.col("doc_id") % 97 == 0)
    probe("contam/1_bench_shingles_distinct", lambda: noop(
        benchm.select(F.explode(shingles_col(F.col("text"), 3)).alias("s")).distinct()))
    probe("contam/2_corpus_shingles", lambda: noop(
        corpus.select("doc_id", F.explode(shingles_col(F.col("text"), 3)).alias("s"))))
    probe("contam/3_full", lambda: noop(contamination_hits(corpus, benchm, n=3)))

    # ---------------- lm_score phases ----------------
    from rio_cogeo_spark.operators.passages import ngrams_col
    from rio_cogeo_spark.operators.rarity import bigram_lm, token_rarity

    def _lm_tf():
        tf = (docs.select("doc_id",
                          F.explode(ngrams_col(F.col("text"), 2)).alias("bigram"))
              .groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("tf")))
        noop(tf)
    probe("lm/1_tf", _lm_tf)
    probe("lm/2_full", lambda: noop(bigram_lm(docs, broadcast_model=False)))
    probe("rarity/full", lambda: noop(token_rarity(docs)))

    # ---------------- ann phases ----------------
    from rio_cogeo_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q_emb = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding"))
    probe("ann/0_emb_scan", lambda: noop(emb))
    from rio_cogeo_spark.functions.vector import cosine_rounded
    probe("ann/1_cos_only", lambda: noop(
        emb.crossJoin(F.broadcast(q_emb))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                cosine_rounded(F.col("embedding"), F.col("q_embedding")).alias("cos"))))
    probe("ann/2_full", lambda: noop(SIM.ann_bruteforce_topk(emb, q_emb, k=10)))

    # ---------------- tile-grid phases ----------------
    pages_cache = None
    for d in sorted(os.listdir("/tmp")):
        if d.startswith("bench_pages_40_"):
            pages_cache = f"/tmp/{d}"
    if pages_cache and "1.0" in sf_dir:
        pages = spark.read.parquet(pages_cache)
        from rio_cogeo_spark.operators import focal as FC
        from rio_cogeo_spark.operators.translate import base_tiles

        probe("grid/0_pages_scan", lambda: noop(pages))
        probe("grid/1_assign", lambda: noop(
            __import__("rio_cogeo_spark.operators.translate", fromlist=["assign_tiles"]).assign_tiles(pages, 10)))
        probe("grid/2_base_tiles", lambda: noop(base_tiles(pages, 10)))
        bt = base_tiles(pages, 10)
        probe("grid/3_hotspots", lambda: noop(FC.hotspots(bt, 10)))
        probe("grid/4_dilate", lambda: noop(FC.dilate_tiles(bt, 10)))
        probe("grid/5_compact", lambda: noop(
            FC.compact_tiles(FC.dilate_tiles(bt, 10), 10, min_zoom=6)))

    print(json.dumps({"all": probes}))
    spark.stop()


if __name__ == "__main__":
    main()
