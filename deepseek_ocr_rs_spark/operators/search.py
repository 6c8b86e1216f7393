"""Term search over the corpus: inverted index + BM25 top-k retrieval.

A curation stack needs *term* search next to vector search
(operators/similarity.py): audit queries ("which documents mention X"),
contamination sweeps keyed on benchmark phrases, and cluster labeling all
retrieve by keyword.  The reference's analog is its prompt/query routing
discipline — requests address content by exact token identity, never by
fuzzy match (crates/server/src/routes.rs request parsing), and every
scoring decision is a pure function of explicit state
(crates/core/src/sampling.rs:104-118).

Two operators:

  posting_lists   the classic inverted index: ``term -> (df, sorted
                  doc_ids)``.  One explode + two map-side-combinable
                  aggregations; the posting list is built with
                  ``sort_array(collect_list(...))`` so the layout is a
                  pure function of the data (partitioning-invariant),
                  then serialized as a ``-``-joined string — the same
                  type-stable cross-engine hash contract ann_pq_codes
                  uses (a naked array<long> column is unhashable by the
                  driver's pandas canonicalizer; see CORRECTNESS_r04).

  bm25_topk       top-k documents for a bag of query terms under BM25
                  with the LOG-FREE rational idf
                  ``(N - df + 0.5) / (df + 0.5)``.  ``ln`` is
                  libm-dependent (the last-ulp cross-engine divergence
                  class that q2's rounding fix and tfidf's log-free score
                  already closed); the rational idf is one subtraction
                  and one division, both correctly-rounded IEEE and
                  therefore bit-identical across engines.  Per-term
                  scores are summed by a LEFT-TO-RIGHT fold in term-asc
                  order (``F.aggregate`` over a sorted array | DuckDB
                  ``list_reduce`` over ``list(... ORDER BY term)``), so
                  the total is order-independent of partitioning and
                  bit-exact cross-engine — a plain double SUM would be
                  neither.

Design for 100 TB:
- The only corpus-wide shuffles are the (id, term) and (term) hash
  aggregations — both partial-aggregated map-side.
- ``bm25_topk`` filters the exploded words to the query's terms BEFORE
  the tf aggregation, so the per-query shuffle carries only matching
  (id, term) pairs; df for the query terms falls out of the same
  aggregate (docs containing the term == rows of tf).
- N and avgdl are 1-row aggregates attached as broadcast cross-joins
  (the scalar-subquery discipline of q11/q15/q22) — never a collect.
- The final top-k is ``ORDER BY score LIMIT k`` —
  TakeOrderedAndProject (per-partition heap + driver merge of k rows),
  no global sort, no single-partition window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def _words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Lowercase whitespace tokens — the corpus-stats convention shared
    with operators/tfidf.py and operators/textstats.py."""
    from deepseek_ocr_rs_spark.operators.rebalance import rebalance_for_arrow

    # the token explode runs in the scan stage; spread a single-split
    # local scan (no-op at cluster scale)
    df = rebalance_for_arrow(df)
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).where(F.col("term") != "")


def posting_lists(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
) -> DataFrame:
    """Inverted index: (term, df, postings) with postings sorted asc.

    ``postings`` is the sorted doc-id list joined with ``-`` into one
    string: type-stable under every consumer's canonicalizer (the
    ann_pq_codes contract) and loss-free — ids are integers, so
    ``split('-')`` recovers the exact list.

    ``min_df`` drops hapax terms (at web scale the df=1 tail dominates
    the vocabulary but serves no retrieval purpose; the cut also bounds
    the index size).  Postings for a pathological stop-word are one
    array per term — at 100 TB cap or stripe such terms upstream
    (they are exactly the high-df rows this operator makes visible).
    """
    tf = _words(df, id_col, text_col).groupBy("term", id_col).agg(
        F.count("*").alias("tf")
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.col(id_col))),
                    lambda x: x.cast("string"),
                ),
                "-",
            ).alias("postings"),
        )
        .where(F.col("df") >= min_df)
    )


def posting_lists_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
) -> str:
    """DuckDB SQL replicating ``posting_lists`` exactly."""
    return f"""
        WITH words AS (
          SELECT {id_col},
                 unnest(string_split_regex(lower({text_col}), '\\s+')) AS term
          FROM {table}
        ),
        tf AS (
          SELECT term, {id_col}, count(*) AS tf
          FROM words WHERE term <> '' GROUP BY 1, 2
        )
        SELECT term, count(*) AS df,
               array_to_string(list({id_col} ORDER BY {id_col}), '-')
                 AS postings
        FROM tf
        GROUP BY term
        HAVING count(*) >= {min_df}
    """


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents for ``query_terms`` under rational-idf BM25.

    Returns (id, n_hit_terms, bm25) ordered by (bm25 desc, id); bm25 is
    rounded to 6dp for display, ranking happens on the exact double.
    Only documents matching >= 1 query term are scored (standard BM25
    retrieval semantics).
    """
    terms = sorted({t.lower() for t in query_terms if t})
    if not terms:
        raise ValueError("query_terms must contain at least one term")
    # words feeds dl AND tf_q; dl feeds tok_total AND the score join —
    # unpersisted, the token explode would execute once per branch
    words = _words(df, id_col, text_col).persist()
    dl = words.groupBy(id_col).agg(F.count("*").alias("dl")).persist()
    tf_q = (
        words.where(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_q = tf_q.groupBy("term").agg(F.count("*").alias("df"))
    # N over ALL docs; avgdl = exact integer token total / N (docs with no
    # tokens have no dl row but still count in N — dl sum is unaffected).
    n_docs = df.agg(F.count("*").cast("double").alias("n_docs"))
    tok_total = dl.agg(F.sum("dl").cast("double").alias("tok_total"))
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    avgdl = F.col("tok_total") / F.col("n_docs")
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl))
    )
    scored = (
        tf_q.join(F.broadcast(df_q), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(tok_total))
        .withColumn("term_score", idf * tf_part)
    )
    # Order-fixed fold (term asc) => bit-exact total on every engine and
    # every partitioning; 0.0 + x == x so the init value is harmless.
    total = F.aggregate(
        F.array_sort(F.collect_list(F.struct("term", "term_score"))),
        F.lit(0.0),
        lambda acc, s: acc + s["term_score"],
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_hit_terms"),
            total.alias("_bm25_exact"),
        )
        .orderBy(F.col("_bm25_exact").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col, "n_hit_terms", F.round("_bm25_exact", 6).alias("bm25")
        )
    )


def bm25_topk_oracle_sql(
    table: str,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB SQL replicating ``bm25_topk`` bit-for-bit: same expression
    tree, same fold order (list_reduce over list(... ORDER BY term) with
    a 0.0 seed mirrors F.aggregate's left fold)."""
    terms = sorted({t.lower() for t in query_terms if t})
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
        WITH words AS (
          SELECT {id_col},
                 unnest(string_split_regex(lower({text_col}), '\\s+')) AS term
          FROM {table}
        ),
        w AS (SELECT * FROM words WHERE term <> ''),
        dl AS (SELECT {id_col}, count(*) AS dl FROM w GROUP BY 1),
        tf_q AS (
          SELECT {id_col}, term, count(*) AS tf
          FROM w WHERE term IN ({in_list}) GROUP BY 1, 2
        ),
        df_q AS (SELECT term, count(*) AS df FROM tf_q GROUP BY 1),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM {table}),
        tok AS (SELECT CAST(sum(dl) AS DOUBLE) AS tok_total FROM dl),
        scored AS (
          SELECT t.{id_col}, t.term,
                 ((n.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * ((t.tf * {k1 + 1.0!r}) /
                    (t.tf + {k1!r} * ({1.0 - b!r} + {b!r}
                     * (l.dl / (k.tok_total / n.n_docs))))) AS term_score
          FROM tf_q t
          JOIN df_q d USING (term)
          JOIN dl l USING ({id_col})
          CROSS JOIN n CROSS JOIN tok k
        )
        SELECT {id_col}, n_hit_terms, round(bm25_exact, 6) AS bm25
        FROM (
          SELECT {id_col}, count(*) AS n_hit_terms,
                 list_reduce(
                   list_prepend(0.0, list(term_score ORDER BY term)),
                   (acc, s) -> acc + s) AS bm25_exact
          FROM scored GROUP BY {id_col}
        )
        ORDER BY bm25_exact DESC, {id_col}
        LIMIT {k}
    """


def phrase_match(
    df: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positional phrase search: docs containing the words of ``phrase``
    CONSECUTIVELY, via the anchor-join trick over a positional index.
    Returns ``(id, n_matches, first_pos)`` (0-based token position).

    The classic positional-index evaluation: explode the cleaned token
    stream with positions, join against the tiny (idx, term) phrase
    table (broadcast), and reduce each candidate to an ``anchor =
    pos - idx``; a full phrase occurrence at position ``a`` is exactly
    an anchor group where every phrase slot 0..k-1 matched —
    ``count(DISTINCT idx) = k``.  Repeated phrase words fall out
    naturally (a token matching two slots contributes two anchors).

    Design for 100 TB:
    - the phrase table is k rows — always broadcast; the token stream
      is filtered to phrase words BY the join before any shuffle, so
      the (id, anchor) aggregation carries only candidate positions
      (for rare phrases, a vanishing fraction of the corpus);
    - two map-side-combinable hash aggregations ((id, anchor) then id)
      are the only exchanges — no self-join of the token stream on
      pos+1 chains, whose k-1 join rounds would each reshuffle the
      full stream.
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one word")
    k = len(terms)
    spark = df.sparkSession
    ptab = spark.createDataFrame(
        list(enumerate(terms)), "idx int, pterm string"
    )
    from deepseek_ocr_rs_spark.operators.rebalance import rebalance_for_arrow

    toks = rebalance_for_arrow(df).select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("pos", "term"),
    )
    cand = toks.join(
        F.broadcast(ptab), toks.term == ptab.pterm
    ).select(
        id_col, (F.col("pos") - F.col("idx")).alias("anchor"), "idx"
    )
    anchors = (
        cand.groupBy(id_col, "anchor")
        .agg(F.countDistinct("idx").alias("n_idx"))
        .where(F.col("n_idx") == k)
    )
    return anchors.groupBy(id_col).agg(
        F.count("*").alias("n_matches"),
        F.min("anchor").cast("long").alias("first_pos"),
    )


def phrase_match_oracle_sql(
    table: str,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replica of :func:`phrase_match` (same cleaned-stream
    positions via list_filter + generate_subscripts, same anchor
    counting)."""
    terms = [t.replace("'", "''") for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one word")
    values = ", ".join(f"({i}, '{t}')" for i, t in enumerate(terms))
    return f"""
WITH pm_tok AS (
  SELECT {id_col},
         unnest(toks) AS term,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM (
    SELECT {id_col},
           list_filter(string_split_regex(lower({text_col}), '\\s+'),
                       x -> x <> '') AS toks
    FROM {table}
  )
), pm_ph (idx, pterm) AS (
  VALUES {values}
), pm_anchor AS (
  SELECT t.{id_col}, t.pos - p.idx AS anchor
  FROM pm_tok t JOIN pm_ph p ON t.term = p.pterm
  GROUP BY t.{id_col}, t.pos - p.idx
  HAVING count(DISTINCT p.idx) = {len(terms)}
)
SELECT {id_col},
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(anchor) AS BIGINT) AS first_pos
FROM pm_anchor
GROUP BY {id_col}
""".strip()


def _varbyte_len(gap):
    """Column expr: bytes a non-negative int64 gap takes under classic
    varbyte (7 payload bits per byte; 0 still costs one byte).  A CASE
    over integer thresholds — no log(), so integer-exact on every
    engine (the same libm-avoidance as the rational BM25 idf)."""
    return (
        F.when(gap < 128, 1)
        .when(gap < 16384, 2)
        .when(gap < 2097152, 3)
        .when(gap < 268435456, 4)
        .when(gap < 34359738368, 5)
        .otherwise(6)
        .cast("long")
    )


def postings_compression(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
) -> DataFrame:
    """Index-compression economics per term: delta-gap + varbyte sizing
    of each posting list.  Returns
    ``(term, df, raw_bytes, varbyte_bytes, max_gap)`` where

    * ``raw_bytes``     = 8 * df (uncompressed int64 postings),
    * ``varbyte_bytes`` = total classic-varbyte bytes of the gap
      sequence (first gap = first doc id, then successive deltas),
    * ``max_gap``       = the widest delta (the term's clustering
      signal: low max_gap == the term concentrates in an id range).

    At web scale the inverted index is often larger than the text it
    indexes unless gap-compressed; this operator prices that decision
    per term so index planning (which terms to stripe, which to cut by
    ``min_df``) is driven by measured bytes, not guesses — the same
    measure-don't-guess discipline the reference applies to its decode
    paths (benchsuite orchestration).

    100 TB plan shape: the (term, id) tf aggregate is the only corpus
    shuffle; the LAG window and the final per-term rollup both run on
    the SAME term-hash partitioning, so Catalyst plans exactly ONE
    exchange after the tf aggregate — verified in the plan audit.  All
    arithmetic is int64 CASE/sum — no floats, no Python.
    """
    from pyspark.sql import Window

    tf = _words(df, id_col, text_col).groupBy("term", id_col).agg(
        F.count("*").alias("tf")
    )
    w = Window.partitionBy("term").orderBy(F.col(id_col))
    gap = F.col(id_col) - F.coalesce(
        F.lag(id_col).over(w), F.lit(0)
    )
    sized = tf.select(
        "term",
        F.col(id_col),
        gap.alias("gap"),
    ).select(
        "term",
        "gap",
        _varbyte_len(F.col("gap")).alias("vb"),
    )
    return (
        sized.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            (F.count("*") * 8).cast("long").alias("raw_bytes"),
            F.sum("vb").cast("long").alias("varbyte_bytes"),
            F.max("gap").cast("long").alias("max_gap"),
        )
        .where(F.col("df") >= min_df)
    )


def postings_compression_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
) -> str:
    """DuckDB SQL replicating ``postings_compression`` exactly (same
    LAG-over-term gap chain, same varbyte CASE ladder)."""
    return f"""
        WITH words AS (
          SELECT {id_col},
                 unnest(string_split_regex(lower({text_col}), '\\s+')) AS term
          FROM {table}
        ),
        tf AS (
          SELECT term, {id_col} FROM words WHERE term <> ''
          GROUP BY 1, 2
        ),
        gaps AS (
          SELECT term,
                 {id_col} - coalesce(
                   lag({id_col}) OVER (PARTITION BY term ORDER BY {id_col}),
                   0) AS gap
          FROM tf
        ),
        sized AS (
          SELECT term, gap,
                 CASE WHEN gap < 128 THEN 1
                      WHEN gap < 16384 THEN 2
                      WHEN gap < 2097152 THEN 3
                      WHEN gap < 268435456 THEN 4
                      WHEN gap < 34359738368 THEN 5
                      ELSE 6 END AS vb
          FROM gaps
        )
        SELECT term,
               CAST(count(*) AS BIGINT) AS df,
               CAST(count(*) * 8 AS BIGINT) AS raw_bytes,
               CAST(sum(vb) AS BIGINT) AS varbyte_bytes,
               CAST(max(gap) AS BIGINT) AS max_gap
        FROM sized
        GROUP BY term
        HAVING count(*) >= {min_df}
    """
