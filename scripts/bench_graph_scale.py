"""100x-edges scaling probe for the GRAPH suite (triangle_count, k_core,
host_pagerank, host_distance) — the same evidence class as BENCH/SF1.md
(text) and BENCH/SF1_EMBED.md (embeddings) for the link-graph operators.

Input: a deterministic synthetic host digraph with BOUNDED average
degree (~40): ``E`` edges over ``H = E/20`` hosts, two hash families
(src = i mod H, dst = (i*31+7) mod H and (i*17+3) mod H). Growing E
100x grows H 100x at constant degree — the shape of a growing web
crawl, and the regime where degree-ordered triangle counting and the
broadcast-alive k-core peel must stay linear per edge.

PASS rule (as bench_sf1.py): per-EDGE time at 100x <= 10x the 1x
per-edge time.

Usage: python scripts/bench_graph_scale.py   (writes BENCH/GRAPH.md)
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

REPO = Path(__file__).resolve().parents[1]
E_SMALL = int(os.environ.get("SPARK_GRAFT_GRAPH_E", "100000"))
FACTOR = int(os.environ.get("SPARK_GRAFT_GRAPH_FACTOR", "100"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))


def build_edges(spark, n_edges: int):
    h = max(97, n_edges // 20)
    e = spark.range(n_edges).select(
        (F.col("id") % h).alias("src"),
        ((F.col("id") * 31 + 7) % h).alias("dst"),
    ).union(
        spark.range(n_edges).select(
            (F.col("id") % h).alias("src"),
            ((F.col("id") * 17 + 3) % h).alias("dst"),
        )
    ).filter(F.col("src") != F.col("dst"))
    return e, h


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench_graph_scale")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from rio_cogeo_spark.operators.graph import (
        host_distance,
        host_pagerank,
        k_core,
        triangle_count,
    )

    import tempfile

    def materialized(n_edges):
        path = os.path.join(tempfile.gettempdir(), f"graph_scale_v1_{n_edges}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            e, _ = build_edges(spark, n_edges)
            e.repartition(32).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def suite(edges, h):
        seeds = edges.select(F.col("src").alias("host")).filter(
            F.col("host") % 97 == 0
        ).distinct()
        return {
            "triangle_count": lambda: triangle_count(edges).count(),
            "k_core": lambda: k_core(edges, k=8, rounds=3).count(),
            "pagerank": lambda: host_pagerank(edges, iterations=3).count(),
            "host_distance": lambda: host_distance(
                edges, seeds, max_hops=3
            ).count(),
        }

    results, n_edges = {}, {}
    for scale, ne in (("1x", E_SMALL), ("100x", E_SMALL * FACTOR)):
        edges = materialized(ne)
        n = edges.count()
        n_edges[scale] = n
        for name, fn in suite(edges, ne // 20).items():
            best = None
            for _ in range(REPS):
                t0 = time.time()
                fn()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[scale] = round(best, 3)
            print(f"{scale} ({n} edges) {name}: {best:.2f}s", flush=True)

    rows, ok_all = [], True
    for name, t in results.items():
        per_small = t["1x"] / n_edges["1x"]
        per_big = t["100x"] / n_edges["100x"]
        ratio = per_big / per_small
        ok = ratio <= 10.0
        ok_all &= ok
        rows.append(
            f"| {name} | {t['1x']}s | {t['100x']}s | "
            f"{ratio:.2f}x | {'PASS' if ok else 'FAIL'} |"
        )

    out = [
        "# Graph suite 100x-edges scaling probe (scripts/bench_graph_scale.py)",
        "",
        f"Edges: {n_edges['1x']:,} -> {n_edges['100x']:,} "
        f"(bounded average degree ~40; hosts grow with edges — the "
        f"growing-crawl regime).",
        "",
        "PASS rule: per-edge wall at 100x <= 10x the 1x per-edge wall.",
        "",
        "| op | 1x wall | 100x wall | per-edge ratio | verdict |",
        "|---|---|---|---|---|",
        *rows,
        "",
        f"All pass: **{ok_all}**",
        "",
        "```json",
        json.dumps({"results": results, "n_edges": n_edges}),
        "```",
    ]
    (REPO / "BENCH" / "GRAPH.md").write_text("\n".join(out) + "\n")
    print("ALL PASS" if ok_all else "SOME FAIL")


if __name__ == "__main__":
    main()
