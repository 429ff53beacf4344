"""Document chunking — the embedding-pipeline primitive (chunk → embed
→ index). Splits each document into fixed-token-count chunks.

Scale design (100 TB): the naive form (slice the token array once per
chunk inside a projection) re-evaluates the tokenizer per chunk —
O(L²/chunk_size) work per long document. Instead: posexplode the token
array ONCE (tokenize exactly once per doc), assign each token to
``chunk_idx = pos div chunk_tokens``, and rebuild chunk text with an
order-deterministic grouped aggregate. Exactly ONE shuffle, bounded by
(doc, chunk) key cardinality; map-side combine applies. The aggregate
sorts (pos, token) structs inside each group, so chunk text is
deterministic despite ``collect_list``'s arrival-order semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rio_cogeo_spark.functions.text import tokens_col


def chunk_docs(
    docs: DataFrame,
    chunk_tokens: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Non-overlapping fixed-size chunks:
    ``(doc_id, chunk_idx, chunk_text, n_tokens)``, ordered tokens
    preserved. Sliding/overlapping windows compose from this by unioning
    a second assignment with shifted positions.
    """
    toks = (
        docs.select(
            F.col(id_col),
            F.posexplode(tokens_col(F.col(text_col))).alias("pos", "tok"),
        )
        # `div`: exact integer division (a float `/`+cast can truncate
        # wrong in edge ulps for non-power-of-2 chunk sizes)
        .withColumn("chunk_idx", F.expr(f"pos div {chunk_tokens}").cast("int"))
    )
    return (
        toks.groupBy(id_col, "chunk_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("chunk_text"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def chunk_docs_sql(
    table: str = "documents",
    chunk_tokens: int = 128,
    id_col: str = "doc_id",
    toks_sql: str = None,
) -> str:
    """DuckDB twin of :func:`chunk_docs`."""
    from rio_cogeo_spark.functions.text import TOKENS_SQL

    toks = toks_sql or TOKENS_SQL
    # (value, index) lambda instead of a lateral generate_series —
    # DuckDB table functions reject lateral column parameters
    return rf"""
WITH t AS (SELECT {id_col}, {toks} AS toks FROM {table}),
e AS (SELECT {id_col},
             unnest(list_transform(toks,
                    (x, i) -> {{'pos': i - 1, 'tok': x}})) AS pt
      FROM t),
a AS (SELECT {id_col}, CAST(pt.pos // {chunk_tokens} AS INT) AS chunk_idx,
             pt.pos AS pos, pt.tok AS tok FROM e)
SELECT {id_col}, chunk_idx,
       string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
       COUNT(*) AS n_tokens
FROM a GROUP BY 1, 2"""
