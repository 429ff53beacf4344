"""Int8 embedding quantization: bounded error, exact integer scoring,
recall against the float-dot ranking (operators/quantize.py).
"""

import numpy as np
from pyspark.sql import functions as F

from rio_cogeo_spark.operators.quantize import (
    ann_int8_topk,
    int_dot,
    quantize_embeddings,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_quantization_bounds_and_error(spark):
    emb = _emb(spark)
    q = quantize_embeddings(emb)
    rows = q.join(emb, "vec_id").select("vec_id", "embedding", "q_embedding", "amax") \
        .limit(50).collect()
    amax = rows[0].amax
    assert amax > 0
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        qv = np.asarray(r.q_embedding, dtype=np.int64)
        assert qv.min() >= -127 and qv.max() <= 127
        # dequantization error bounded by half a quantization step
        back = qv * (amax / 127.0)
        assert np.max(np.abs(back - v)) <= amax / 127.0 * 0.5 + 1e-9


def test_int_dot_is_exact(spark):
    df = spark.createDataFrame(
        [(1, [1, -2, 3], [4, 5, -6])],
        "id long, a array<long>, b array<long>",
    )
    got = df.select(int_dot(F.col("a"), F.col("b")).alias("d")).collect()[0].d
    assert got == 1 * 4 + (-2) * 5 + 3 * (-6)


def test_ann_int8_recall_vs_float_dot(spark):
    emb = _emb(spark)
    k = 10
    got = ann_int8_topk(emb, k=k, n_queries=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.vec_id)
    # float-dot ground truth
    rows = emb.collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    recalls = []
    for qid in by_q:
        qv = vecs[qid]
        scores = sorted(
            ((float(np.dot(v, qv)), vid) for vid, v in vecs.items() if vid != qid),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        truth = {vid for _, vid in scores}
        recalls.append(len(truth & by_q[qid]) / k)
        assert len(by_q[qid]) == k
    assert float(np.mean(recalls)) >= 0.6  # int8 vs float32: high overlap
