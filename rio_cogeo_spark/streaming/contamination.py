"""Streaming benchmark-contamination over a document/page stream.

The batch operator (operators/contamination.py) checks a closed corpus
against an evaluation benchmark; a crawl is open-ended, and the
benchmark is exactly the shape streaming handles best as STATIC state:
a small, fixed table broadcast to every micro-batch (a stream-static
inner join is stateless on the stream side — no streaming state at
all). Per-document hit counts then fold in a watermarked tumbling
window, so the only stateful operator is a bounded windowed aggregation
whose key cardinality is |contaminated docs per window|, never corpus
size.

Spark-first: `stream.join(static)` + `withWatermark` + windowed groupBy
are all built-ins; there is no custom state code. The shingle formula is
shared with the batch operator, so a batch backfill and the stream agree
on what counts as a contaminated document (streaming==batch is
pytest-asserted at two micro-batch sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rio_cogeo_spark.operators.dedup import shingles_col


def contamination_stream(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Per-window, per-document count of distinct word n-grams shared
    with any benchmark document, over a streaming corpus. Output:
    ``(window_sec, doc_id, n_hits)`` with ``n_hits >= 1`` — the
    streaming twin of ``contamination_hits`` with a window column.

    ``benchmark`` is a BATCH DataFrame (the static side); its distinct
    shingle set is broadcast, so each micro-batch is one stateless
    projection + broadcast join before the windowed fold.
    """
    bench_sh = (
        benchmark.select(
            F.explode(shingles_col(F.col(text_col), n)).alias("shingle")
        )
        .distinct()
    )
    corpus_sh = (
        corpus.withWatermark(ts_col, watermark)
        .select(
            F.col(id_col),
            F.col(ts_col),
            F.explode(shingles_col(F.col(text_col), n)).alias("shingle"),
        )
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle", "inner")
        .groupBy(F.window(ts_col, window).alias("w"), id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_sec"),
            id_col,
            "n_hits",
        )
    )


def contamination_batch_windowed(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    window: str = "1 hour",
) -> DataFrame:
    """Batch twin of :func:`contamination_stream` (same plan minus the
    watermark) — the streaming==batch assertion target."""
    bench_sh = (
        benchmark.select(
            F.explode(shingles_col(F.col(text_col), n)).alias("shingle")
        )
        .distinct()
    )
    corpus_sh = corpus.select(
        F.col(id_col),
        F.col(ts_col),
        F.explode(shingles_col(F.col(text_col), n)).alias("shingle"),
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle", "inner")
        .groupBy(F.window(ts_col, window).alias("w"), id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_sec"),
            id_col,
            "n_hits",
        )
    )
