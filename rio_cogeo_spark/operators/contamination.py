"""Benchmark-contamination check over the ``documents`` table.

A training-data pipeline must detect corpus documents that overlap an
evaluation benchmark (n-gram collision is the standard test — the
"13-gram overlap" rule of GPT-3/The Pile, parameterized here as ``n``
to suit document length). Scale design (100 TB corpus, small benchmark):

* the benchmark's distinct shingle set is tiny (test sets are thousands
  of documents) → **broadcast** it; the corpus side never shuffles;
* corpus shingling is a JVM expression (`shingles_col`) + explode — a
  stateless projection, no Python;
* the per-document hit count is a map-side-combinable groupBy whose key
  cardinality is bounded by |contaminated docs|, not corpus size.

Reference parity note: the reference (rio-cogeo) has no text ops; this
belongs to the beyond-reference LLM-pipeline suite (SURVEY.md §2.9
companion, COVERAGE.md "training-data pipeline" table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rio_cogeo_spark.operators.dedup import shingles_col


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-corpus-document count of distinct word n-grams shared with any
    benchmark document. Returns only contaminated docs:
    ``(doc_id, n_hits)`` with ``n_hits >= 1``.

    ``benchmark`` only needs ``text_col``. Both sides shingle with the
    same distinct n-gram formula as the Jaccard/MinHash dedup suite, so
    "hit" means exactly one shared shingle type (multiplicity ignored,
    as in the standard contamination definition).
    """
    bench_sh = (
        benchmark.select(
            F.explode(shingles_col(F.col(text_col), n)).alias("shingle")
        )
        .distinct()
    )
    corpus_sh = corpus.select(
        F.col(id_col),
        F.explode(shingles_col(F.col(text_col), n)).alias("shingle"),
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle", "inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def contamination_rate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fraction of each contaminated document's shingles that collide
    with the benchmark: ``(doc_id, n_hits, n_shingles, hit_frac)`` —
    the thresholdable form (e.g. drop docs with hit_frac > 0.8)."""
    hits = contamination_hits(corpus, benchmark, n, id_col, text_col)
    sizes = corpus.select(
        F.col(id_col),
        F.size(shingles_col(F.col(text_col), n)).alias("n_shingles"),
    )
    return hits.join(sizes, id_col, "inner").withColumn(
        "hit_frac",
        F.round(
            F.col("n_hits").cast("double")
            / F.greatest(F.col("n_shingles"), F.lit(1)).cast("double"),
            6,
        ),
    )
