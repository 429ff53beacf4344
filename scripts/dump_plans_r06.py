"""Dump .explain('formatted') for the bench queries into plans/r06/.

Usage: python scripts/dump_plans_r06.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt for each (default: all).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    spark = (
        SparkSession.builder.master("local[12]")
        .appName("dump_plans_r06")
        .config("spark.sql.shuffle.partitions", "12")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages_cache = None
    for d in sorted(os.listdir("/tmp")):
        if d.startswith("bench_pages_40_"):
            pages_cache = f"/tmp/{d}"
    pages = spark.read.parquet(pages_cache) if pages_cache else None

    from rio_cogeo_spark.operators import dedup as DD
    from rio_cogeo_spark.operators import join as J
    from rio_cogeo_spark.operators import similarity as SIM
    from rio_cogeo_spark.operators import focal as FC
    from rio_cogeo_spark.operators.contamination import contamination_hits
    from rio_cogeo_spark.operators.rarity import bigram_lm, token_rarity
    from rio_cogeo_spark.operators.translate import base_tiles, cog_translate
    from rio_cogeo_spark.operators.graph import crawl_frontier
    from rio_cogeo_spark.synth import MEGACITIES
    import __spark_entry__ as entry

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q_emb = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding"))
    qrows = [(f"Q{cid:02d}", float(lat), float(lon))
             for cid, _, lat, lon in MEGACITIES[:10]]
    queries_df = spark.createDataFrame(
        qrows, "query_id string, q_lat double, q_lon double")

    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    benchm = docs.filter(F.col("doc_id") % 97 == 0)

    builders = {
        "minhash_lsh": lambda: DD.minhash_lsh_pairs(
            docs, threshold=0.5, num_hashes=128, bands=64, eager_release=False),
        "contamination": lambda: contamination_hits(corpus, benchm, n=3),
        "lm_score": lambda: bigram_lm(docs, broadcast_model=False),
        "rarity_score": lambda: token_rarity(docs),
        "ann_topk": lambda: SIM.ann_bruteforce_topk(emb, q_emb, k=10),
        "clean_corpus": lambda: entry.q_clean_corpus(spark, sf_dir),
        "frontier": lambda: crawl_frontier(
            docs.selectExpr("doc_id % 9973 AS src", "(doc_id * 31 + 7) % 9973 AS dst"),
            spark.range(0, 5).selectExpr("id AS host"), max_hops=4, iterations=3),
    }
    if pages is not None:
        bt = base_tiles(pages, 10)
        builders.update({
            "pyramid": lambda: cog_translate(
                pages, max_zoom=10, overview_level=6, persist_levels=False)[0],
            "pip_join": lambda: J.point_in_polygon(
                pages, J.build_admin_areas(stars=True)),
            "knn_kring": lambda: J.knn_kring(pages, queries_df, k=10, ring=2),
            "base_tiles": lambda: base_tiles(pages, 10),
            "hotspots": lambda: FC.hotspots(bt, 10),
            "compact": lambda: FC.compact_tiles(
                FC.dilate_tiles(bt, 10), 10, min_zoom=6),
            "viewport": lambda: FC.assemble_viewport(
                FC.compact_tiles(FC.dilate_tiles(bt, 10), 10, min_zoom=6),
                10, (2**10 // 3, 2**10 // 4, 2**10 // 3 + 39, 2**10 // 4 + 39),
                min_zoom=6),
        })

    outdir = REPO / "plans" / "r06"
    outdir.mkdir(parents=True, exist_ok=True)
    for name, build in builders.items():
        if only and name not in only:
            continue
        try:
            df = build()
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR: {e}"
        (outdir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
