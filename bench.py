"""Headline benchmark: tile-assignment + pyramid + spatial-join throughput.

Runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32) over
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1), scaling the pages
table to ~2M points via deterministic replication (FIXTURES.md §1
pages_bench), and prints ONE JSON line:

  {"metric": "...", "value": <pages/sec>, "unit": "pages/sec",
   "queries": {name: sec, ...}, "sf": ..., ...}

``value`` is the BASELINE.md headline: end-to-end tile-assignment +
spatial-join throughput (pages/sec) — n_pages / (t_pyramid + t_pip_join).
Two-parallelism scaling evidence is produced by scripts/scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from rio_cogeo_spark.operators import dedup as DD
from rio_cogeo_spark.operators import join as J
from rio_cogeo_spark.operators import similarity as SIM
from rio_cogeo_spark.operators.translate import cog_translate
from rio_cogeo_spark.synth import MEGACITIES, synth_pages_scaled

BENCH_ZOOM = 10
BENCH_LEVELS = 6
TARGET_PAGES = int(os.environ.get("SPARK_GRAFT_TARGET_PAGES", "2000000"))
# min-of-k per timed section: this VM's wall-time varies 3-4x minute to
# minute under outside contention, so a single-pass number is decided by
# whichever window it lands in (BENCH_r02 fell 16% below r01 on identical
# code). The minimum of k replicates of identical deterministic work is
# the least-contended observation — the same protocol BENCH/BASELINE.md
# already uses for the scaling sessions.
BENCH_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rio_cogeo_spark_bench")
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


def materialize(df) -> int:
    """Force full computation; returns row count (cheap final agg)."""
    return df.count()


def run_bench(spark: SparkSession, sf_dir: str) -> dict:
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name, fn, reset=None):
        """Record min-of-BENCH_REPS wall time for ``fn`` (result of the
        last rep kept). ``reset`` runs UNtimed before each rep so cache
        state is identical across reps (e.g. clearCache before each
        pyramid build — no rep may reuse a prior rep's persisted levels).
        """
        out, best = None, None
        for _ in range(max(1, BENCH_REPS)):
            if reset is not None:
                reset()
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        counts[name] = out
        return out

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    target = int(os.environ.get("SPARK_GRAFT_TARGET_PAGES", str(TARGET_PAGES)))
    replicate = max(1, target // max(n_docs, 1))
    # Materialize the bench input to parquet and scan from disk: Spark's
    # single-JVM columnar cache is slower AND noisier than a parquet scan
    # with pushdown (measured: PIP 5.5s from parquet vs 9-25s from cache
    # at local[8]/20M rows), and storage-scan input matches the real
    # pipeline shape.
    import hashlib
    import tempfile

    # cache key covers the dataset AND the scale target — a different
    # SPARK_GRAFT_SF_DIR with the same replicate must not silently reuse
    # stale pages from another dataset
    fp = hashlib.md5(f"{os.path.abspath(sf_dir)}|{target}".encode()).hexdigest()[:10]
    pages_path = os.path.join(
        tempfile.gettempdir(), f"bench_pages_{replicate}_{fp}"
    )
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        (
            synth_pages_scaled(spark, sf_dir, replicate=replicate)
            .select("doc_id", "url", "lang", "n_chars", "lat", "lon")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(pages_path)
        )
    pages = spark.read.parquet(pages_path)
    n_pages = pages.count()

    # per-zoom build time FIRST on its own lineage (levels unpersisted as
    # we go) so the numbers aren't cache hits from the pyramid run
    def _per_zoom() -> dict:
        from rio_cogeo_spark.operators.translate import base_tiles, default_bands, next_level

        bands = default_bands()
        t: dict[str, float] = {}
        t0 = time.time()
        level = base_tiles(pages, BENCH_ZOOM, bands).cache()
        level.count()
        t[f"zoom_{BENCH_ZOOM}"] = time.time() - t0
        for z in range(BENCH_ZOOM - 1, BENCH_ZOOM - BENCH_LEVELS - 1, -1):
            t0 = time.time()
            nxt = next_level(level, z, 2, bands).cache()
            nxt.count()
            t[f"zoom_{z}"] = time.time() - t0
            level.unpersist()
            level = nxt
        level.unpersist()
        return t

    for _ in range(max(1, BENCH_REPS)):
        zt = _per_zoom()
        for name, dt in zt.items():
            timings[name] = round(min(dt, timings.get(name, float("inf"))), 3)

    # 1. pyramid: tile assign (Arrow UDF) + base agg + overview chain
    def _pyramid():
        tiles, _ = cog_translate(
            pages, max_zoom=BENCH_ZOOM, overview_level=BENCH_LEVELS
        )
        return materialize(tiles)

    # clearCache before each rep: no rep may inherit a prior rep's
    # persisted levels; later sections start cache-free too (pages itself
    # streams from parquet)
    timed("pyramid", _pyramid, reset=spark.catalog.clearCache)
    spark.catalog.clearCache()

    # 2. point-in-polygon broadcast join (cell prefilter + ray-cast refine)
    areas = J.build_admin_areas(stars=True)
    timed("pip_join", lambda: materialize(J.point_in_polygon(pages, areas)))

    if os.environ.get("SPARK_GRAFT_HEADLINE_ONLY"):
        headline_sec = timings["pyramid"] + timings["pip_join"]
        return {
            "metric": "tile-assignment+pyramid+spatial-join throughput",
            "value": round(n_pages / headline_sec, 1),
            "unit": "pages/sec",
            "queries": timings,
            "sf": sf_dir,
            "n_pages": n_pages,
            "replicate": replicate,
            "counts": counts,
            "bench_reps": BENCH_REPS,
        }

    # 3. kNN via k-ring expansion (10 queries)
    qrows = [
        (f"Q{cid:02d}", float(lat), float(lon)) for cid, _, lat, lon in MEGACITIES[:10]
    ]
    queries_df = spark.createDataFrame(qrows, "query_id string, q_lat double, q_lon double")
    timed("knn_kring", lambda: materialize(J.knn_kring(pages, queries_df, k=10, ring=2)))

    # 4. minhash-LSH dedup over documents
    timed(
        "minhash_lsh",
        lambda: materialize(
            DD.minhash_lsh_pairs(docs, threshold=0.5, num_hashes=128, bands=64)
        ),
    )

    # 4b. repetition signal + benchmark contamination over documents
    # (JVM-expression text ops; contamination broadcasts the benchmark
    # shingle set so the corpus side never shuffles)
    from rio_cogeo_spark.functions.text import repetition_stats
    from rio_cogeo_spark.operators.contamination import contamination_hits

    rep = repetition_stats(F.col("text"))
    timed(
        "repetition",
        lambda: materialize(
            docs.select(
                "doc_id",
                rep["top_bigram_count"].alias("top_bigram_count"),
                rep["dup_bigram_frac"].alias("dup_bigram_frac"),
            )
        ),
    )
    timed(
        "contamination",
        lambda: materialize(
            contamination_hits(
                docs.filter(F.col("doc_id") % 97 != 0),
                docs.filter(F.col("doc_id") % 97 == 0),
                n=3,
            )
        ),
    )

    # 4c. flagship composite: full filtering pipeline in one plan
    import __spark_entry__ as _entry

    timed("clean_corpus", lambda: materialize(_entry.q_clean_corpus(spark, sf_dir)))

    # 4d. inverted-index search (exact-integer tf-idf top-k)
    from rio_cogeo_spark.operators.search import search_topk

    timed(
        "search",
        lambda: materialize(search_topk(docs, ["spark", "hash", "window"], k=20)),
    )

    # 4d'. positional phrase search + corpus token-rarity scoring
    # (round-5 ops: anchor-decomposition phrase match; postings-reusing
    # unigram rarity with broadcast vocab)
    from rio_cogeo_spark.operators.rarity import token_rarity
    from rio_cogeo_spark.operators.search import phrase_topk

    timed(
        "search_phrase",
        lambda: materialize(phrase_topk(docs, ["table", "table"], k=20)),
    )
    timed("rarity_score", lambda: materialize(token_rarity(docs)))

    # 4e. sequence packing + PII scrub over documents (training-data ops)
    from rio_cogeo_spark.functions.text import pii_scrub
    from rio_cogeo_spark.operators.packing import pack_chunks

    timed(
        "pack_chunks",
        lambda: materialize(pack_chunks(docs, context_tokens=2048, n_shards=32)),
    )
    timed(
        "pii_scrub",
        lambda: materialize(
            pii_scrub(docs).select("doc_id", "n_emails", "n_ips", "n_ids")
        ),
    )

    # 4f. late-round-5 ops: corpus bigram-LM scoring (non-broadcast
    # model — the 100 TB configuration), the Gopher gate projection,
    # and the composed crawl-frontier priority
    from rio_cogeo_spark.functions.text import gopher_gate
    from rio_cogeo_spark.operators.graph import crawl_frontier
    from rio_cogeo_spark.operators.rarity import bigram_lm

    timed(
        "lm_score",
        lambda: materialize(bigram_lm(docs, broadcast_model=False)),
    )
    _gg = gopher_gate(F.col("text"))
    timed(
        "gopher",
        lambda: materialize(
            docs.select("doc_id", _gg["gopher_mask"].alias("gopher_mask"))
        ),
    )
    timed(
        "frontier",
        lambda: materialize(
            crawl_frontier(
                docs.selectExpr(
                    "doc_id % 9973 AS src", "(doc_id * 31 + 7) % 9973 AS dst"
                ),
                spark.range(0, 5).selectExpr("id AS host"),
                max_hops=4,
                iterations=3,
            )
        ),
    )

    # 4g. final-session tile-grid suite: Gi* hotspots, quadtree
    # compaction of the dilated cover, and LOD viewport assembly —
    # all bounded by the 4^zoom grid, independent of corpus size
    from rio_cogeo_spark.operators import focal as FC
    from rio_cogeo_spark.operators.translate import base_tiles as _bt

    bt = _bt(pages, BENCH_ZOOM)
    timed("hotspots", lambda: materialize(FC.hotspots(bt, BENCH_ZOOM)))
    timed(
        "compact",
        lambda: materialize(
            FC.compact_tiles(
                FC.dilate_tiles(bt, BENCH_ZOOM), BENCH_ZOOM,
                min_zoom=max(0, BENCH_ZOOM - 4),
            )
        ),
    )
    timed(
        "viewport",
        lambda: materialize(
            FC.assemble_viewport(
                FC.compact_tiles(
                    FC.dilate_tiles(bt, BENCH_ZOOM), BENCH_ZOOM,
                    min_zoom=max(0, BENCH_ZOOM - 4),
                ),
                BENCH_ZOOM,
                (
                    2 ** BENCH_ZOOM // 3,
                    2 ** BENCH_ZOOM // 4,
                    2 ** BENCH_ZOOM // 3 + 39,
                    2 ** BENCH_ZOOM // 4 + 39,
                ),
                min_zoom=max(0, BENCH_ZOOM - 4),
            )
        ),
    )

    # 5. ANN brute-force top-k over embeddings
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q_emb = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    timed("ann_topk", lambda: materialize(SIM.ann_bruteforce_topk(emb, q_emb, k=10)))

    # 6. events hourly rollup — same epoch floor-div expression as the
    # contract query (consistent measurement)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hour = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    timed(
        "events_hourly",
        lambda: materialize(
            ev.groupBy(hour.alias("hour_sec"), "event_type").agg(
                F.count(F.lit(1)), F.sum("value")
            )
        ),
    )

    headline_sec = timings["pyramid"] + timings["pip_join"]
    pages_per_sec = round(n_pages / headline_sec, 1)
    return {
        "metric": "tile-assignment+pyramid+spatial-join throughput",
        "value": pages_per_sec,
        "unit": "pages/sec",
        "queries": timings,
        "sf": sf_dir,
        "n_pages": n_pages,
        "replicate": replicate,
        "counts": counts,
        "bench_reps": BENCH_REPS,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # This sandbox VM advertises 32 CPUs but delivers ~12 effective cores
    # with a steep contention cliff beyond (measured: pure-python burn test
    # 32 procs -> 5x dilation; bench at 8/12/16/32 threads -> 342k/315k/
    # 253k/164k pages/sec). Python-UDF stages run JVM task threads AND
    # Python workers concurrently (2N runnable), so cap the thread count
    # at the measured sweet spot; override with SPARK_GRAFT_MAX_EFFECTIVE.
    max_eff = int(os.environ.get("SPARK_GRAFT_MAX_EFFECTIVE", "12"))
    cpus = min(cpus, max_eff)
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    result = run_bench(spark, sf_dir)
    result["cpus"] = cpus
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
