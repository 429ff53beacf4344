"""Phase attribution for minhash_lsh at 100x documents (VERDICT r4 #5:
"chase minhash_lsh's 42x wall at 100x docs — confirm it's the band-dedup
sort, not a spill").

Splits minhash_lsh_pairs into its three phases and times each
separately at sf0.1 and sf1 (same deterministic corpus as bench_sf1):

  1. signatures  — per-doc shingling + 128 minhashes (linear work)
  2. band join   — banding explode + (band, bucket) self-join +
                   candidate dropDuplicates (the only super-linear
                   candidate: sort-merge join over docs x bands rows)
  3. verify      — exact-Jaccard re-check of surviving candidates

Also records per-phase shuffle spill (memory+disk) from the Spark
status API, so "sort got slower" and "sort spilled" are distinguishable.

Usage: python scripts/probe_minhash_sf1.py  (appends findings to stdout;
the one-line cause note goes into BENCH/SF1.md by hand)
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("SPARK_GRAFT_SF1_REPLICATE", "100"))


def spill_bytes(spark) -> tuple:
    """Cumulative (memory, disk) shuffle spill over all stages, via the
    JVM status store (Scala Seq walked by index); (-1, -1) if the
    internal API is unavailable."""
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        seq = store.stageList(None)
        mem = disk = 0
        for i in range(seq.size()):
            s = seq.apply(i)
            mem += s.memoryBytesSpilled()
            disk += s.diskBytesSpilled()
        return mem, disk
    except Exception:  # noqa: BLE001 — diagnostics only
        return -1, -1


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe_minhash")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from rio_cogeo_spark.operators import dedup as DD
    from scripts.bench_sf1 import build_docs_sf1

    import tempfile

    big_path = os.path.join(tempfile.gettempdir(), f"sf1_docs_v2_{REPLICATE}")
    if not os.path.exists(os.path.join(big_path, "_SUCCESS")):
        build_docs_sf1(spark, SF_DIR, REPLICATE).repartition(64).write.mode(
            "overwrite"
        ).parquet(big_path)

    out = {}
    for scale, docs in (
        ("sf0.1", spark.read.parquet(f"{SF_DIR}/documents.parquet")),
        ("sf1", spark.read.parquet(big_path)),
    ):
        phases = {}
        s0m, s0d = spill_bytes(spark)

        t0 = time.time()
        sigs = DD.minhash_signatures(docs, 128, 3, 42).persist()
        n_docs = sigs.count()
        phases["signatures"] = round(time.time() - t0, 2)

        rows = 128 // 64
        band_cols = F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), i * rows + 1, rows),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        )
        banded = sigs.select("doc_id", band_cols.alias("bb")).select(
            "doc_id", F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        ).persist()
        t0 = time.time()
        n_banded = banded.count()
        phases["banding"] = round(time.time() - t0, 2)

        a, b = banded.alias("a"), banded.alias("b")
        cands = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .dropDuplicates(["doc_a", "doc_b"])
            .persist()
        )
        t0 = time.time()
        n_cands = cands.count()
        phases["band_join"] = round(time.time() - t0, 2)

        sh_tbl = sigs.select("doc_id", "sh")
        pairs = (
            cands.join(sh_tbl.select(F.col("doc_id").alias("doc_a"),
                                     F.col("sh").alias("sh_a")), "doc_a")
            .join(sh_tbl.select(F.col("doc_id").alias("doc_b"),
                                F.col("sh").alias("sh_b")), "doc_b")
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
        t0 = time.time()
        n_pairs = (
            pairs.withColumn("jaccard", F.round(inter / union, 6))
            .filter(F.col("jaccard") >= 0.5)
            .count()
        )
        phases["verify"] = round(time.time() - t0, 2)

        s1m, s1d = spill_bytes(spark)
        sigs.unpersist()
        banded.unpersist()
        cands.unpersist()
        out[scale] = {
            "n_docs": n_docs, "n_banded": n_banded, "n_cands": n_cands,
            "n_pairs": n_pairs, "phases": phases,
            "spill_mem_bytes": s1m - s0m, "spill_disk_bytes": s1d - s0d,
        }
        print(scale, json.dumps(out[scale]), flush=True)

    print("PROBE_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
