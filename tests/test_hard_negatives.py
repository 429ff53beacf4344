"""Hard-negative mining (operators/similarity.py hard_negatives):
component-aware exclusion over a mined candidate pool.
"""

from pyspark.sql import functions as F

from rio_cogeo_spark.operators.similarity import hard_negatives


def _pool(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, vec_id long, cos double"
    )


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_excludes_transitive_dup_mates(spark):
    # pairs 1~2 and 2~3: both 2 AND 3 are in anchor 1's component even
    # though (1,3) was never mined — pair-level exclusion would keep 3.
    pool = _pool(
        spark,
        [(1, 2, 0.99), (1, 3, 0.98), (1, 7, 0.90), (1, 8, 0.80)],
    )
    out = hard_negatives(pool, _pairs(spark, [(1, 2), (2, 3)]), k=10)
    got = [(r.vec_id, r.rank) for r in out.orderBy("rank").collect()]
    assert got == [(7, 1), (8, 2)]


def test_rank_is_dense_after_exclusion_and_self_dropped(spark):
    # self row and dup-mate drop; survivors re-rank densely 1..k
    pool = _pool(
        spark,
        [(5, 5, 1.0), (5, 105, 0.99), (5, 6, 0.95), (5, 7, 0.94), (5, 8, 0.93)],
    )
    out = hard_negatives(pool, _pairs(spark, [(5, 105)]), k=2)
    got = [(r.vec_id, r.rank) for r in out.orderBy("rank").collect()]
    assert got == [(6, 1), (7, 2)]


def test_unpaired_anchor_keeps_full_pool(spark):
    # anchor absent from the pair graph: nothing excluded but self
    pool = _pool(spark, [(9, 1, 0.9), (9, 2, 0.8), (9, 9, 1.0)])
    out = hard_negatives(pool, _pairs(spark, [(1, 2)]), k=10)
    # 1 and 2 are each other's dups, NOT anchor 9's — both stay
    got = [(r.vec_id, r.rank) for r in out.orderBy("rank").collect()]
    assert got == [(1, 1), (2, 2)]


def test_other_anchors_copies_are_legit_negatives(spark):
    # anchor 1's dup (101) excluded; anchor 2's dup (102) kept for 1
    pool = _pool(
        spark,
        [(1, 101, 1.0), (1, 102, 0.97), (1, 3, 0.90)],
    )
    out = hard_negatives(pool, _pairs(spark, [(1, 101), (2, 102)]), k=10)
    got = [(r.vec_id, r.rank) for r in out.orderBy("rank").collect()]
    assert got == [(102, 1), (3, 2)]
