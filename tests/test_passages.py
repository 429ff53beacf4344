"""Repeated-passage detection (corpus-level substring dedup)."""

import pytest
from pyspark.sql import functions as F

from rio_cogeo_spark.operators.passages import (
    ngrams_col,
    repeated_ngram_spans,
)


def test_ngrams_positional(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    got = df.select(ngrams_col(F.col("text"), 2).alias("g")).first()["g"]
    assert got == ["a b", "b c", "c d"]
    short = spark.createDataFrame([("a",)], "text string")
    assert short.select(ngrams_col(F.col("text"), 3).alias("g")).first()["g"] == []


def test_repeated_spans_golden(spark):
    """Two docs share the passage 'x1 x2 x3 x4 x5'; doc 3 is unique."""
    shared = "x1 x2 x3 x4 x5"
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"{shared} epsilon zeta eta theta iota"),
            (3, "nothing repeated in this document at all"),
        ],
        "doc_id long, text string",
    )
    spans = {r["doc_id"]: r for r in
             repeated_ngram_spans(df, n=3, min_count=2).collect()}
    # doc 3 emits nothing
    assert 3 not in spans
    # doc 1: shared passage occupies tokens 2..6 → 3-gram hits at 2,3,4
    assert spans[1]["span_start"] == 2 and spans[1]["span_end"] == 7
    assert spans[1]["n_hits"] == 3
    # doc 2: tokens 0..4 → hits at 0,1,2
    assert spans[2]["span_start"] == 0 and spans[2]["span_end"] == 5
    assert spans[2]["n_hits"] == 3


def test_repeated_spans_merge_vs_split(spark):
    """Hits separated by more than n tokens form two spans; within n,
    one merged span."""
    p1, p2 = "r1 r2 r3", "s1 s2 s3"
    df = spark.createDataFrame(
        [
            (1, f"{p1} a b c d e f g h i j {p2}"),
            (2, f"{p1} k l m n o p q r s t {p2}"),
        ],
        "doc_id long, text string",
    )
    spans = (
        repeated_ngram_spans(df, n=3, min_count=2)
        .filter("doc_id = 1")
        .orderBy("span_start")
        .collect()
    )
    assert len(spans) == 2
    assert spans[0]["span_start"] == 0 and spans[0]["span_end"] == 3
    assert spans[1]["span_start"] == 13 and spans[1]["span_end"] == 16


def test_repeated_spans_full_dup_doc(spark, sf_mid):
    """A verbatim duplicated document is one full-length span on both
    copies."""
    docs = spark.read.parquet(f"{sf_mid}/documents.parquet").limit(20)
    dups = docs.filter("doc_id = 0").withColumn(
        "doc_id", F.lit(999999).cast("long")
    )
    both = docs.unionByName(dups)
    from rio_cogeo_spark.functions.text import token_count

    n_tok = docs.filter("doc_id = 0").select(
        token_count(F.col("text")).alias("n")
    ).first()["n"]
    spans = repeated_ngram_spans(both, n=5, min_count=2)
    full = spans.filter(
        (F.col("doc_id").isin(0, 999999))
        & (F.col("span_start") == 0)
        & (F.col("span_end") == n_tok)
    )
    assert full.count() == 2


def test_repeated_spans_plan_broadcast_hot_set(spark, sf_mid):
    """The hot-hash join must broadcast: the corpus side reaches the
    span window without an extra join shuffle."""
    docs = spark.read.parquet(f"{sf_mid}/documents.parquet")
    plan = repeated_ngram_spans(docs, n=5, min_count=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repeated_spans_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        repeated_ngram_spans(None, n=0)
    with pytest.raises(ValueError):
        repeated_ngram_spans(None, min_count=1)


# --- cut_spans (span application)

def test_cut_spans_golden(spark):
    from rio_cogeo_spark.operators.passages import cut_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "untouched text here")],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [(1, 2, 5, 1)], "doc_id long, span_start long, span_end long, n_hits long"
    )
    rows = {r["doc_id"]: r for r in cut_spans(docs, spans).collect()}
    assert rows[1]["clean_text"] == "a b f g h"
    assert rows[1]["n_tokens_removed"] == 3
    assert rows[2]["clean_text"] == "untouched text here"
    assert rows[2]["n_tokens_removed"] == 0


def test_cut_spans_overlapping_and_full(spark):
    from rio_cogeo_spark.operators.passages import cut_spans

    docs = spark.createDataFrame([(1, "t0 t1 t2 t3 t4")], "doc_id long, text string")
    spans = spark.createDataFrame(
        [(1, 0, 3, 1), (1, 2, 5, 1)],
        "doc_id long, span_start long, span_end long, n_hits long",
    )
    r = cut_spans(docs, spans).first()
    assert r["clean_text"] == "" and r["n_tokens_removed"] == 5


def test_cut_conserves_tokens_end_to_end(spark, sf_mid):
    """Pipeline invariant on real data: removed + kept == original
    token count for every doc."""
    from rio_cogeo_spark.functions.text import token_count
    from rio_cogeo_spark.operators.passages import (
        cut_spans,
        repeated_ngram_spans,
    )

    docs = spark.read.parquet(f"{sf_mid}/documents.parquet")
    spans = repeated_ngram_spans(docs, n=5, min_count=2)
    out = cut_spans(docs, spans)
    joined = out.join(
        docs.select("doc_id", token_count(F.col("text")).alias("orig")), "doc_id"
    )
    kept_len = F.when(
        F.col("clean_text") == "", F.lit(0)
    ).otherwise(F.size(F.split(F.col("clean_text"), r"\s+")))
    bad = joined.filter(
        kept_len + F.col("n_tokens_removed") != F.col("orig")
    ).count()
    assert bad == 0
    assert out.count() == docs.count()


def test_repeated_spans_shuffle_hot_identical(spark, sf_mid):
    """broadcast_hot=False (the 100 TB path) must produce identical
    spans to the broadcast default."""
    docs = spark.read.parquet(f"{sf_mid}/documents.parquet")
    a = repeated_ngram_spans(docs, n=5, min_count=2)
    b = repeated_ngram_spans(docs, n=5, min_count=2, broadcast_hot=False)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
