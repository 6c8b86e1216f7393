"""Per-document top-k characteristic terms (TF-IDF family).

Keyword extraction over a corpus: for each document, the k terms with the
highest term-frequency x inverse-document-frequency score.  Used in
curation to tag documents with topical signatures, route near-duplicate
clusters, and build the "what is this cluster about" views a 100 TB
corpus needs.

The score is the log-free TF-IDF variant ``tf * (N / df)``: one IEEE
division and one multiplication, both correctly-rounded and therefore
bit-identical across engines (a ``ln`` would be libm-dependent — the same
class of last-digit divergence q2's rounding fix closed).  Ranking
happens on the exact double; only the REPORTED score is rounded (6dp
contract).

Design for 100 TB:
- term-frequency: explode words, ``groupBy(id, term).count()`` — ONE
  shuffle, map-side combinable (partial aggregation).
- document-frequency: second aggregation over the (id, term) pairs —
  output is |vocab| rows, tiny relative to the corpus, so the join back
  is broadcast-able (AQE converts it at runtime; at web-scale vocab it
  degrades gracefully to a shuffle join on term).
- N (corpus size) is a 1-row aggregate attached as a broadcast
  cross-join — the scalar-subquery discipline of q11/q15/q22, never a
  driver collect.
- top-k: ``row_number`` windowed by document — partitioned, local sort,
  no global window.  Ties break on the term string so the selected set
  is unique and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k terms per document by ``tf * (N / df)``.

    Returns (id, term, tf, df, tfidf) with tfidf rounded to 6dp; the
    rank is computed on the exact double and ties break on term asc.
    Tokenization is lowercase whitespace splitting (the corpus-stats
    convention of operators/textstats.py).
    """
    from deepseek_ocr_rs_spark.operators.rebalance import rebalance_for_arrow

    # the token explode runs in the scan stage; a single-split local scan
    # would serialize it (no-op at cluster scale)
    df = rebalance_for_arrow(df)
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = df.agg(F.count("*").cast("double").alias("n_docs"))
    score = F.col("tf") * (F.col("n_docs") / F.col("df"))
    w = Window.partitionBy(id_col).orderBy(score.desc(), F.col("term"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(score, 6).alias("tfidf"),
        )
    )


def tfidf_topk_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> str:
    """DuckDB SQL replicating ``tfidf_topk`` (same tokenizer, same exact
    double ranking, same tie-break)."""
    return f"""
        WITH words AS (
          SELECT {id_col},
                 unnest(string_split_regex(lower({text_col}), '\\s+')) AS term
          FROM {table}
        ),
        tf AS (
          SELECT {id_col}, term, count(*) AS tf
          FROM words WHERE term <> '' GROUP BY 1, 2
        ),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM {table})
        SELECT {id_col}, term, tf, df,
               round(tf * (n_docs / df), 6) AS tfidf
        FROM (
          SELECT t.{id_col}, t.term, t.tf, d.df, n.n_docs,
                 row_number() OVER (
                   PARTITION BY t.{id_col}
                   ORDER BY (t.tf * (n.n_docs / d.df)) DESC, t.term
                 ) AS rn
          FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
        )
        WHERE rn <= {k}
    """
