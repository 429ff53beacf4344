"""Round-6 optimization experiments: candidate rewrites, timed with noop
and value-checked against the current implementations (exceptAll both
directions must be 0). Usage:

  SPARK_GRAFT_SF_DIR=... python scripts/exp_r06.py [exp ...]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

REPS = int(os.environ.get("PROFILE_REPS", "2"))
_PPB = 1_000_000_000
_PPM = 1_000_000


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("exp_r06")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )


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
    print(json.dumps({"equal": name, "a_minus_b": d1, "b_minus_a": d2}),
          flush=True)
    return d1 == 0 and d2 == 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = min(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 12)
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    only = set(sys.argv[1:])

    def want(n):
        return not only or n in only

    from rio_cogeo_spark.functions.text import tokens_col
    from rio_cogeo_spark.operators.passages import ngrams_col

    # ---------------- lm_score variants ----------------
    if want("lm"):
        from rio_cogeo_spark.operators.rarity import bigram_lm

        def lm_windows(docs, novel_cnt=1):
            toks = tokens_col(F.col("text"))
            base = docs.select(F.col("doc_id"), toks.alias("_toks"))
            m = F.size(F.col("_toks")) - 1
            gram = F.zip_with(
                F.slice(F.col("_toks"), F.lit(1), m),
                F.slice(F.col("_toks"), F.lit(2), m),
                lambda a, b: F.concat_ws(" ", a, b),
            )
            gram = F.when(F.size(F.col("_toks")) >= 2, gram).otherwise(
                F.array().cast("array<string>"))
            bg = base.select("doc_id", F.explode(gram).alias("bigram"))
            wb = Window.partitionBy("bigram")
            ww = Window.partitionBy("w1")
            s1 = bg.withColumn("cnt2", F.count(F.lit(1)).over(wb)).select(
                "doc_id",
                F.substring_index("bigram", " ", 1).alias("w1"),
                "cnt2",
            )
            s2 = s1.withColumn("cnt1", F.count(F.lit(1)).over(ww)).select(
                "doc_id", "cnt2",
                F.expr(f"(cnt2 * {_PPM}) div cnt1").alias("pred_ppm"),
            )
            return (
                s2.groupBy("doc_id")
                .agg(
                    F.count(F.lit(1)).alias("n_bigrams"),
                    F.expr("sum(pred_ppm) div count(1)").alias("mean_pred_ppm"),
                    F.expr(
                        f"(sum(CASE WHEN cnt2 <= {int(novel_cnt)} THEN 1 ELSE 0 END)"
                        f" * {_PPM}) div count(1)"
                    ).alias("novel_frac_ppm"),
                )
                .select("doc_id", "n_bigrams", "mean_pred_ppm", "novel_frac_ppm")
            )

        cur = bigram_lm(docs, broadcast_model=False)
        new = lm_windows(docs)
        timed("lm/current", lambda: noop(cur))
        timed("lm/windows", lambda: noop(new))
        check_equal("lm/windows", cur, new)

        # wait: cnt1 via count over w1 counts OCCURRENCE rows after s1 has
        # one row per occurrence - correct. But mean = sum(pred)div count:
        # original is sum(tf*pred) div sum(tf) == same on occurrence rows.

    # ---------------- rarity variants ----------------
    if want("rarity"):
        from rio_cogeo_spark.operators.rarity import token_rarity

        def rarity_windows(docs, rare_cnt=2):
            toks = tokens_col(F.col("text"))
            tok = docs.select(F.col("doc_id"), F.explode(toks).alias("term"))
            total_df = docs.select(toks.alias("_t")).agg(
                F.sum(F.size("_t")).cast("long").alias("total"))
            wt = Window.partitionBy("term")
            s1 = tok.withColumn("cnt", F.count(F.lit(1)).over(wt)).select(
                "doc_id", "cnt")
            s2 = s1.crossJoin(F.broadcast(total_df)).withColumn(
                "freq_ppb", F.expr(f"(cnt * {_PPB}) div total"))
            return (
                s2.groupBy("doc_id")
                .agg(
                    F.count(F.lit(1)).alias("n_tokens"),
                    F.expr("sum(freq_ppb) div count(1)").alias(
                        "mean_tok_freq_ppb"),
                    F.expr(
                        f"(sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END)"
                        f" * {_PPM}) div count(1)"
                    ).alias("rare_frac_ppm"),
                )
                .select("doc_id", "n_tokens", "mean_tok_freq_ppb",
                        "rare_frac_ppm")
            )

        cur = token_rarity(docs)
        new = rarity_windows(docs)
        timed("rarity/current", lambda: noop(cur))
        timed("rarity/windows", lambda: noop(new))
        check_equal("rarity/windows", cur, new)

    # ---------------- contamination variants ----------------
    if want("contam"):
        from rio_cogeo_spark.operators.contamination import contamination_hits
        from rio_cogeo_spark.operators.dedup import shingles_col

        corpus = docs.filter(F.col("doc_id") % 97 != 0)
        benchm = docs.filter(F.col("doc_id") % 97 == 0)

        def shingles_from_toks(tcol, n=3):
            m = F.size(tcol) - (n - 1)
            gram = F.slice(tcol, F.lit(1), m)
            for j in range(1, n):
                gram = F.zip_with(
                    gram, F.slice(tcol, F.lit(1 + j), m),
                    lambda a, b: F.concat_ws(" ", a, b))
            return F.when(F.size(tcol) >= n, F.array_distinct(gram)).otherwise(
                F.array().cast("array<string>"))

        def contam_toks(corpus, benchmark, n=3):
            bench_sh = (
                benchmark.select(F.col("text"))
                .select(F.explode(shingles_col(F.col("text"), n)).alias("shingle"))
                .distinct())
            corpus_sh = (
                corpus.select("doc_id", tokens_col(F.col("text")).alias("_toks"))
                .select("doc_id",
                        F.explode(shingles_from_toks(F.col("_toks"), n)).alias("shingle"))
            )
            return (
                corpus_sh.join(F.broadcast(bench_sh), "shingle", "inner")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_hits"))
            )

        cur = contamination_hits(corpus, benchm, n=3)
        new = contam_toks(corpus, benchm, n=3)
        timed("contam/current", lambda: noop(cur))
        timed("contam/toks_materialized", lambda: noop(new))
        check_equal("contam/toks_materialized", cur, new)

        # how much of the time is just the tokenize+shingle projection?
        one = corpus.select(
            "doc_id", tokens_col(F.col("text")).alias("_toks")).select(
            "doc_id", F.explode(shingles_from_toks(F.col("_toks"), 3)).alias("s"))
        timed("contam/shingle_explode_toks_once", lambda: noop(one))

    # ---------------- ann variants ----------------
    if want("ann"):
        from rio_cogeo_spark.functions.vector import (as_double_array, dot,
                                                      cosine_rounded)
        from rio_cogeo_spark.operators.similarity import ann_bruteforce_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q_emb = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"))

        def ann_prenorm(embeddings, queries, k=10):
            e = embeddings.select(
                "vec_id", as_double_array(F.col("embedding")).alias("_e")
            ).withColumn("_na", F.sqrt(dot(F.col("_e"), F.col("_e"))))
            q = queries.select(
                "query_id", as_double_array(F.col("q_embedding")).alias("_q")
            ).withColumn("_nb", F.sqrt(dot(F.col("_q"), F.col("_q"))))
            joined = e.crossJoin(F.broadcast(q)).filter(
                F.col("vec_id") != F.col("query_id"))
            cos = F.round(
                dot(F.col("_e"), F.col("_q")) / (F.col("_na") * F.col("_nb")), 6)
            w = Window.partitionBy("query_id").orderBy(
                F.col("cos").desc(), F.col("vec_id").asc())
            return (
                joined.select("query_id", "vec_id", cos.alias("cos"))
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "vec_id", "rank", "cos")
            )

        cur = ann_bruteforce_topk(emb, q_emb, k=10)
        new = ann_prenorm(emb, q_emb, k=10)
        timed("ann/current", lambda: noop(cur))
        timed("ann/prenorm", lambda: noop(new))
        check_equal("ann/prenorm", cur, new)

    spark.stop()


if __name__ == "__main__":
    main()
