"""Round-6 experiment batch 2: rarity vocab-direct, exact_dedup join form,
knn/pyramid/frontier/search probes. Value-checked via exceptAll."""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

_PPB = 1_000_000_000
_PPM = 1_000_000
REPS = int(os.environ.get("PROFILE_REPS", "2"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn):
    best = None
    for _ in range(REPS):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"exp": name, "sec": round(best, 3)}), flush=True)


def check_equal(name, a, b):
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(json.dumps({"equal": name, "a_minus_b": d1, "b_minus_a": d2}), flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    spark = (
        SparkSession.builder.master("local[12]")
        .appName("exp2_r06")
        .config("spark.sql.shuffle.partitions", "12")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    only = set(sys.argv[1:])

    def want(n):
        return not only or n in only

    from rio_cogeo_spark.functions.text import tokens_col

    if want("rarity"):
        from rio_cogeo_spark.operators.rarity import token_rarity
        from rio_cogeo_spark.operators.search import build_postings

        def rarity_v2(docs, rare_cnt=2):
            toks = tokens_col(F.col("text"))
            tf = build_postings(docs)
            # vocab straight off the exploded tokens (one agg, not two)
            vocab = (
                docs.select(F.explode(toks).alias("term"))
                .groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
            )
            # grand total == total token occurrences == sum of per-doc
            # token counts — a scan-only branch, no explode
            total = docs.select(toks.alias("_t")).agg(
                F.sum(F.size("_t")).alias("total"))
            joined = (
                tf.join(F.broadcast(vocab), "term")
                .crossJoin(F.broadcast(total))
                .withColumn("freq_ppb", F.expr(f"(cnt * {_PPB}) div total"))
            )
            return (
                joined.groupBy("doc_id")
                .agg(
                    F.sum("tf").alias("n_tokens"),
                    F.expr("sum(tf * freq_ppb) div sum(tf)").alias("mean_tok_freq_ppb"),
                    F.expr(
                        f"(sum(CASE WHEN cnt <= {int(rare_cnt)} THEN tf ELSE 0 END)"
                        f" * {_PPM}) div sum(tf)"
                    ).alias("rare_frac_ppm"),
                )
                .select("doc_id", "n_tokens", "mean_tok_freq_ppb", "rare_frac_ppm")
            )

        cur = token_rarity(docs)
        new = rarity_v2(docs)
        timed("rarity/current", lambda: noop(cur))
        timed("rarity/v2", lambda: noop(new))
        check_equal("rarity/v2", cur, new)

    if want("dedup"):
        from rio_cogeo_spark.operators.dedup import exact_dedup, fingerprint

        def exact_dedup_v2(docs):
            keep = (
                docs.select(fingerprint(F.col("text")).alias("fp"), "doc_id")
                .groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
                .select("doc_id")
            )
            return docs.join(keep, "doc_id", "left_semi")

        cur = exact_dedup(docs)
        new = exact_dedup_v2(docs)
        timed("dedup/current", lambda: noop(cur))
        timed("dedup/v2", lambda: noop(new))
        check_equal("dedup/v2", cur, new)

    if want("probe"):
        pages_cache = None
        for d in sorted(os.listdir("/tmp")):
            if d.startswith("bench_pages_40_"):
                pages_cache = f"/tmp/{d}"
        pages = spark.read.parquet(pages_cache)
        from rio_cogeo_spark.operators import join as J
        from rio_cogeo_spark.operators.translate import cog_translate
        from rio_cogeo_spark.operators.graph import crawl_frontier
        from rio_cogeo_spark.operators.search import search_topk
        from rio_cogeo_spark.synth import MEGACITIES

        qrows = [(f"Q{cid:02d}", float(lat), float(lon))
                 for cid, _, lat, lon in MEGACITIES[:10]]
        qdf = spark.createDataFrame(
            qrows, "query_id string, q_lat double, q_lon double")
        timed("probe/knn_kring", lambda: noop(
            J.knn_kring(pages, qdf, k=10, ring=2)))
        # knn pieces
        from rio_cogeo_spark.operators.join import cell_id, _knn_topk
        from rio_cogeo_spark.functions.tile import k_ring_cells
        qc = (qdf.withColumn("cell", cell_id(F.col("q_lon"), F.col("q_lat"), J.KNN_ZOOM))
              .withColumn("cell", F.explode(k_ring_cells(F.col("cell"), 2)))
              .select("query_id", "q_lat", "q_lon", "cell"))
        wc = pages.withColumn("cell", cell_id(F.col("lon"), F.col("lat"), J.KNN_ZOOM))
        jn = wc.join(F.broadcast(qc), "cell", "inner")
        timed("probe/knn_join_only", lambda: noop(jn))
        def _cnt():
            print("  knn candidates:", jn.count(), flush=True)
        _cnt()
        timed("probe/pyramid_translate", lambda: cog_translate(
            pages, max_zoom=10, overview_level=6)[0].count())
        timed("probe/frontier", lambda: noop(crawl_frontier(
            docs.selectExpr("doc_id % 9973 AS src", "(doc_id * 31 + 7) % 9973 AS dst"),
            spark.range(0, 5).selectExpr("id AS host"), max_hops=4, iterations=3)))
        timed("probe/search", lambda: noop(
            search_topk(docs, ["spark", "hash", "window"], k=20)))
        timed("probe/pip", lambda: noop(
            J.point_in_polygon(pages, J.build_admin_areas(stars=True))))

    spark.stop()


if __name__ == "__main__":
    main()
