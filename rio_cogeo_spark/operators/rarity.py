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


def lang_mix(
    docs: DataFrame,
    sep: str = "\n\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document language-mix report over paragraphs — the
    mC4/CCNet mixed-language page filter: pages whose paragraphs
    disagree on language (embedded widgets, comment sections, scraped
    mashups) are low-quality for monolingual training mixes. Each
    paragraph gets the shared marker-based :func:`functions.text.lang_id`;
    the report is ``(id_col, n_paras, n_langs, major_lang,
    major_frac_ppm)`` with the majority fraction in exact ppm ints
    (ties on the paragraph-language count break to the
    lexicographically smallest language, so results hash cross-engine).
    Blank paragraphs are ignored; docs with zero non-blank paragraphs
    are absent.

    Scale design: one explode (corpus-width but projection-only — the
    language ID is a pure JVM expression), one map-side-combinable
    count per (doc, lang), one per-doc fold whose group size is
    bounded by the language-tag cardinality; the majority pick is a
    combinable struct-min, never a per-doc window sort.
    """
    from rio_cogeo_spark.functions.text import lang_id

    pat = "\\Q" + sep + "\\E"
    paras = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), pat)).alias("para"),
        )
        .filter(F.length(F.trim(F.col("para"))) > 0)
    )
    counts = (
        paras.select(
            id_col, lang_id(F.col("para").alias("text")).alias("plang")
        )
        .groupBy(id_col, "plang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("n").alias("n_paras"),
            F.count(F.lit(1)).alias("n_langs"),
            F.min(
                F.struct((-F.col("n")).alias("nn"), F.col("plang"))
            ).alias("best"),
        )
        .select(
            id_col, "n_paras", "n_langs",
            F.col("best.plang").alias("major_lang"),
            F.expr("(-best.nn * 1000000) div n_paras").alias("major_frac_ppm"),
        )
    )


def lang_mix_sql(
    table: str = "documents",
    sep: str = "\n\n",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`lang_mix` (LANG_ID_SQL reads a column
    literally named ``text``, so the paragraph aliases to it)."""
    from rio_cogeo_spark.functions.text import LANG_ID_SQL

    sep_lit = sep.replace("'", "''")
    return rf"""
WITH paras AS (SELECT {id_col},
                      unnest(string_split(text, '{sep_lit}')) AS para
               FROM {table}),
pl AS (SELECT {id_col}, {LANG_ID_SQL.replace('text', 'para')} AS plang
       FROM (SELECT {id_col}, para FROM paras
             WHERE length(trim(para)) > 0)),
cnt AS (SELECT {id_col}, plang, COUNT(*) AS n FROM pl GROUP BY 1, 2),
agg AS (SELECT {id_col},
               CAST(SUM(n) AS BIGINT) AS n_paras,
               CAST(COUNT(*) AS BIGINT) AS n_langs,
               MIN(STRUCT_PACK(nn := -n, plang := plang)) AS best
        FROM cnt GROUP BY 1)
SELECT {id_col}, n_paras, n_langs,
       best.plang AS major_lang,
       CAST((-best.nn * 1000000) // n_paras AS BIGINT) AS major_frac_ppm
FROM agg"""
