"""Vocabulary coverage / OOV-rate scoring over the document corpus.

The tokenizer-coverage analytic a training-data pipeline runs before
committing to a vocabulary: how much of each document falls outside the
top-N term vocabulary?  High-OOV documents are either foreign-language,
boilerplate-junk, or domain-shifted — all three are exactly what the
curation tier wants surfaced (the operator composes with doc_lang_id /
doc_quality the way CCNet composes LM perplexity with lang-ID).

Tokenization is the corpus-stats convention shared with operators/
search.py, tfidf.py, textstats.py: lowercase whitespace split, empty
tokens dropped.

Plan shape (100 TB posture):
  * vocabulary = top ``vocab_size`` terms by (count DESC, term ASC) — a
    map-side-combinable term aggregate then ORDER BY + LIMIT
    (TakeOrderedAndProject: per-partition heap, k-row driver merge, no
    global sort); the tie rule makes the vocabulary a total-order cut,
    deterministic on both engines;
  * the vocabulary is BROADCAST back to the token stream (vocab_size
    rows), so the per-doc rollup is the only other shuffle — two
    exchanges total, both partial-aggregated;
  * the OOV rate is exact integer arithmetic: basis points =
    (10000 * n_oov) div n_tokens — no float division anywhere, so the
    DuckDB oracle (``//``) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["oov_rates", "oov_rates_oracle_sql"]


def oov_rates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50,
) -> DataFrame:
    """(id, n_tokens, n_oov, oov_bp) per document with >=1 token; the
    vocabulary is the corpus's own top-``vocab_size`` term set."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    vocab = (
        words.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(vocab_size)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    joined = words.join(F.broadcast(vocab), "term", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .withColumn("oov_bp", F.expr("(10000 * n_oov) div n_tokens"))
    )


def oov_rates_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50,
) -> str:
    return f"""
WITH words AS (
  SELECT {id_col},
         unnest(string_split_regex(lower({text_col}), '\\s+')) AS term
  FROM {table}
),
w AS (SELECT * FROM words WHERE term <> ''),
vocab AS (
  SELECT term FROM (
    SELECT term, count(*) AS cnt FROM w GROUP BY term
  ) ORDER BY cnt DESC, term ASC LIMIT {vocab_size}
)
SELECT w.{id_col},
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST((10000 * sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS oov_bp
FROM w LEFT JOIN vocab v USING (term)
GROUP BY w.{id_col}
"""
