"""Corpus token-rarity quality scoring (the CCNet-family signal that an
LM-perplexity filter approximates: pages made of very common tokens are
boilerplate/word-salad; pages dominated by corpus-rare tokens are noise,
OCR garbage, or other-language leakage).

Per document, over the WHOLE corpus's unigram distribution:

* ``mean_tok_freq_ppb`` — the token-occurrence-weighted mean of each
  token's corpus frequency, in parts-per-billion;
* ``rare_frac_ppm`` — the fraction of the doc's token occurrences whose
  token appears ≤ ``rare_cnt`` times corpus-wide, in parts-per-million.

All arithmetic is exact BIGINT (``div``, never float division), so both
columns hash identically on Spark and DuckDB regardless of partitioning
or summation order. Exact-integer envelope: ``cnt · 10^9`` must fit in
int64, i.e. the hottest token may occur ≤ ~9.2e9 times in the scored
corpus; score per shard (or drop the scale to ppm) beyond that — same
documented-envelope policy as :func:`search.bm25_topk`.

Scale design (100 TB):

* the per-(doc, term) ``tf`` table IS :func:`search.build_postings`'s
  output — a production pipeline materializes postings once (bucketed
  by term) and this operator, the tf-idf search, and BM25 all read it;
  computed inline here it is one explode + one map-side-combinable
  groupBy;
* the vocabulary table (term → corpus count) is a second combinable
  aggregate OVER THE POSTINGS (vocab-bounded, never corpus-bounded) and
  joins back by term — broadcast when the vocabulary fits
  (``broadcast_vocab=True``), else a co-partitioned shuffle join whose
  hot keys are harmless (the build side has exactly one row per term);
* the grand total is a 1-row broadcast aggregate — never a driver
  ``.count()``;
* the final per-doc fold shuffles the (doc, term, tf) postings, whose
  volume is already tf-collapsed — bounded by distinct terms per doc,
  not doc length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rio_cogeo_spark.operators.search import build_postings

_PPB = 1_000_000_000
_PPM = 1_000_000


def token_rarity(
    docs: DataFrame,
    rare_cnt: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Score every document against the corpus unigram distribution.

    Returns ``(id_col, n_tokens, mean_tok_freq_ppb, rare_frac_ppm)``;
    zero-token documents are absent (they have no distribution to
    score). Lower ``mean_tok_freq_ppb`` = rarer vocabulary; high
    ``rare_frac_ppm`` = noise/OCR-garbage candidate.
    """
    tf = build_postings(docs, id_col=id_col, text_col=text_col)
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    joined = (
        tf.join(F.broadcast(vocab) if broadcast_vocab else vocab, "term")
        .crossJoin(F.broadcast(total))
        .withColumn("freq_ppb", F.expr(f"(cnt * {_PPB}) div total"))
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.expr("sum(tf * freq_ppb) div sum(tf)").alias("mean_tok_freq_ppb"),
            F.expr(
                f"(sum(CASE WHEN cnt <= {int(rare_cnt)} THEN tf ELSE 0 END)"
                f" * {_PPM}) div sum(tf)"
            ).alias("rare_frac_ppm"),
        )
        .select(id_col, "n_tokens", "mean_tok_freq_ppb", "rare_frac_ppm")
    )


def token_rarity_sql(
    table: str = "documents",
    rare_cnt: int = 2,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`token_rarity` (same exact-BIGINT formulas)."""
    from rio_cogeo_spark.functions.text import TOKENS_SQL

    return rf"""
WITH tok AS (SELECT {id_col}, unnest({TOKENS_SQL}) AS term FROM {table}),
tf AS (SELECT {id_col}, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
vocab AS (SELECT term, SUM(tf) AS cnt FROM tf GROUP BY 1),
tot AS (SELECT SUM(cnt) AS total FROM vocab)
SELECT {id_col},
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       CAST(SUM(tf * ((cnt * {_PPB}) // total)) // SUM(tf) AS BIGINT)
           AS mean_tok_freq_ppb,
       CAST((SUM(CASE WHEN cnt <= {int(rare_cnt)} THEN tf ELSE 0 END)
        * {_PPM}) // SUM(tf) AS BIGINT) AS rare_frac_ppm
FROM tf JOIN vocab USING (term) CROSS JOIN tot
GROUP BY 1"""
