"""Round-6 follow-up experiment: lm_score window plan with subset
partition keys ({w1} vs {w1,w2}) instead of (bigram, w1) — Spark's
TransposeWindow + EnsureRequirements can then serve both windows from
ONE exchange (HashPartitioning(w1) satisfies ClusteredDistribution
([w1,w2])). Timed with noop and value-checked (exceptAll both
directions must be 0) against the current implementation, exactly the
exp_r06.py protocol. Usage:

  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/exp3_r06.py
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

REPS = int(os.environ.get("PROFILE_REPS", "3"))
_PPM = 1_000_000


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("exp3_r06")
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


def bigram_lm_v2(docs, novel_cnt=1, id_col="doc_id", text_col="text"):
    """Candidate: both window counts over column-set partition keys
    ({w1} and {w1,w2}); bigram = 'w1 w2' with whitespace-split tokens,
    so the pair <-> string mapping is a bijection and the counts are
    identical to the bigram/w1-string windows."""
    from rio_cogeo_spark.functions.text import tokens_col
    from rio_cogeo_spark.operators.passages import ngrams_from_tokens

    base = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
    )
    bg = base.select(
        id_col, F.explode(ngrams_from_tokens(F.col("_toks"), 2)).alias("bigram")
    )
    occ = bg.select(
        id_col,
        F.substring_index("bigram", " ", 1).alias("w1"),
        F.substring_index("bigram", " ", -1).alias("w2"),
    )
    ww = Window.partitionBy("w1")
    wb = Window.partitionBy("w1", "w2")
    s = (
        occ.withColumn("cnt1", F.count(F.lit(1)).over(ww))
        .withColumn("cnt2", F.count(F.lit(1)).over(wb))
        .select(
            id_col, "cnt2",
            F.expr(f"(cnt2 * {_PPM}) div cnt1").alias("pred_ppm"),
        )
    )
    return (
        s.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("sum(pred_ppm) div count(1)").alias("mean_pred_ppm"),
            F.expr(
                f"(sum(CASE WHEN cnt2 <= {int(novel_cnt)} THEN 1 ELSE 0 END)"
                f" * {_PPM}) div count(1)"
            ).alias("novel_frac_ppm"),
        )
        .select(id_col, "n_bigrams", "mean_pred_ppm", "novel_frac_ppm")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = min(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 12)
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from rio_cogeo_spark.operators.rarity import bigram_lm

    docs01 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # 10x replicate with disjoint doc_ids -> ~50k docs, the sf1.0 shape
    # bench.py's lm_score timed (bigram distribution identical, corpus
    # counts scale by 10).
    reps = [
        docs01.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
        )
        for i in range(10)
    ]
    docs = reps[0]
    for r in reps[1:]:
        docs = docs.unionByName(r)
    import tempfile
    path = os.path.join(tempfile.gettempdir(), "exp3_docs50k")
    if not os.path.exists(path):
        docs.repartition(24).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    print(json.dumps({"n_docs": docs.count()}), flush=True)

    cur = bigram_lm(docs, broadcast_model=False)
    new = bigram_lm_v2(docs)

    outdir = Path(__file__).resolve().parents[1] / "plans" / "r06"
    (outdir / "exp3_lm_cur.txt").write_text(
        cur._sc._jvm.PythonSQLUtils.explainString(
            cur._jdf.queryExecution(), "formatted")
        if False else cur._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
    )
    (outdir / "exp3_lm_v2.txt").write_text(
        new._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
    )
    for tag in ("cur", "v2"):
        txt = (outdir / f"exp3_lm_{tag}.txt").read_text()
        print(json.dumps({
            "plan": tag,
            "exchanges": txt.count("Exchange"),
            "sorts": txt.count(" Sort "),
        }), flush=True)

    timed("lm_cur", lambda: noop(cur))
    timed("lm_v2", lambda: noop(new))
    ok = check_equal("lm_v2_vs_cur", cur, new)
    print(json.dumps({"verdict": "EQUAL" if ok else "DIFFER"}), flush=True)


if __name__ == "__main__":
    main()
