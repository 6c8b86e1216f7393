"""Vocabulary growth: the Heaps'-law curve of a corpus.

How fast does the vocabulary grow as the corpus grows?  The answer
(Heaps' law: V(n) ~ K * n^beta, public) drives tokenizer vocab
sizing, OOV-rate forecasts at 100x scale, and the dedup smell test —
a corpus whose vocabulary SATURATES early is template-heavy, one
whose curve stays steep is genuinely diverse.  This is the
corpus-card panel next to lexical diversity (doc_lexical_diversity
scores ONE doc; this scores the corpus trajectory).

``vocab_growth`` orders documents by id (the corpus's ingest order),
splits that order into ``n_bins`` equal slices, and reports per slice

  (bin, n_docs, n_tokens, n_new_words, cum_words)

where a word is NEW in the slice of its corpus-wide FIRST occurrence
(min doc id — the ngram_novelty attribution discipline applied to
the unigram vocabulary).  ``cum_words`` is the running vocabulary
size: exactly V(n) at the slice boundaries.

100 TB plan shape: ONE word-keyed min aggregate (map-side
combinable; Zipf-head words collapse in partial agg) + a doc-keyed
token-count aggregate, both rolled into ``n_bins`` rows; the running
total is a window over the TINY bin table.  No corpus-sized window,
no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["vocab_growth", "vocab_growth_oracle_sql"]


def vocab_growth(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bins: int = 10,
) -> DataFrame:
    """Per-slice vocabulary growth — see module doc.  Bin boundaries
    come from the max id (one 1-row aggregate broadcast back), so the
    slices are equal spans of the ingest order."""
    words = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.expr(f"filter(split(lower({text_col}), '\\\\s+'),"
                   " x -> x != '')")
        ).alias("w"),
    )
    dom = df.agg(
        (F.max(F.col(id_col)) + 1).cast("long").alias("_n")
    )
    binned_docs = (
        df.select(F.col(id_col).alias("_id"))
        .crossJoin(F.broadcast(dom))
        .select(
            "_id",
            F.least(
                F.expr(f"(_id * {n_bins}) div _n"), F.lit(n_bins - 1)
            ).cast("long").alias("bin"),
        )
    )
    tokens_per_bin = (
        words.join(binned_docs, "_id")
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    )
    docs_per_bin = binned_docs.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    first_seen = (
        words.groupBy("w")
        .agg(F.min("_id").alias("_fid"))
        .join(
            binned_docs.withColumnRenamed("_id", "_fid").withColumnRenamed(
                "bin", "_fbin"
            ),
            "_fid",
        )
        .groupBy(F.col("_fbin").alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_new_words"))
    )
    cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        docs_per_bin.join(tokens_per_bin, "bin", "left")
        .join(first_seen, "bin", "left")
        .select(
            "bin",
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_new_words", F.lit(0))
            .cast("long")
            .alias("n_new_words"),
        )
        .withColumn(
            "cum_words", F.sum("n_new_words").over(cum).cast("long")
        )
    )


def vocab_growth_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bins: int = 10,
) -> str:
    """DuckDB SQL replicating ``vocab_growth`` exactly (same integer
    bin arithmetic, same min-id first-occurrence attribution)."""
    return f"""
        WITH vgw_dom AS (
          SELECT max({id_col}) + 1 AS n FROM {table}
        ),
        vgw_docs AS (
          SELECT {id_col} AS _id,
                 least(({id_col} * {n_bins}) // n, {n_bins} - 1) AS bin
          FROM {table}, vgw_dom
        ),
        vgw_words AS (
          SELECT d.{id_col} AS _id, u.w
          FROM {table} d,
               UNNEST(list_filter(string_split_regex(
                 lower(d.{text_col}), '\\s+'), x -> x <> '')) AS u(w)
        ),
        vgw_tok AS (
          SELECT b.bin, count(*) AS n_tokens
          FROM vgw_words w JOIN vgw_docs b USING (_id) GROUP BY 1
        ),
        vgw_nd AS (
          SELECT bin, count(*) AS n_docs FROM vgw_docs GROUP BY 1
        ),
        vgw_first AS (
          SELECT b.bin, count(*) AS n_new_words
          FROM (SELECT w, min(_id) AS _fid FROM vgw_words GROUP BY 1) f
          JOIN vgw_docs b ON f._fid = b._id
          GROUP BY 1
        )
        SELECT d.bin,
               CAST(d.n_docs AS BIGINT) AS n_docs,
               CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(f.n_new_words, 0) AS BIGINT) AS n_new_words,
               CAST(sum(coalesce(f.n_new_words, 0))
                    OVER (ORDER BY d.bin ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_words
        FROM vgw_nd d
        LEFT JOIN vgw_tok t USING (bin)
        LEFT JOIN vgw_first f USING (bin)
    """
