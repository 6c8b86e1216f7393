"""C4-style cross-corpus span deduplication (boilerplate removal).

The C4 pipeline (Raffel et al. 2020, public) removed any three-sentence
span occurring more than once in the corpus; modern web curation stacks
keep a variant of it next to whole-document dedup (operators/dedup.py)
because navigation chrome, cookie banners and licence footers repeat
across *different* documents that are nowhere near whole-doc duplicates.
Same discipline family as the reference's strict corpus-level equality
gates (SURVEY §6); there is no single-document analog in the reference —
this is corpus infrastructure the 100 TB pipeline needs.

``span_dedup`` chunks each document's token stream into consecutive
non-overlapping ``span_words``-word spans, bans every span that occurs in
at least ``min_docs`` DISTINCT documents, and reassembles each document
from its surviving spans in original order.

100 TB posture:
* tokenize + chunk are map-side lambda expressions (no Python, no UDF);
* the span-frequency count is a two-phase hash aggregate with map-side
  partial ``count distinct`` — the only full shuffle, keyed on the span
  text (high cardinality, naturally balanced);
* the banned set is the tiny threshold-crossing tail of the frequency
  distribution, so the removal join is a BROADCAST left-anti — the corpus
  side never shuffles for it.  If a corpus ever produced a banned set too
  big to broadcast, drop the ``F.broadcast`` hint and it degrades to a
  plain shuffled anti-join with identical semantics;
* reassembly groups by doc_id — same key the corpus is usually already
  laid out on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spans_expr(text_col: str, k: int) -> str:
    """SQL expr: array<struct<pos:int, span:string>> of consecutive
    non-overlapping k-word spans (ragged tail kept as a short span)."""
    toks = f"filter(split({text_col}, ' '), x -> x != '')"
    n = f"cast(ceil(size({toks}) / cast({k} as double)) as int)"
    return (
        f"CASE WHEN size({toks}) > 0 THEN "
        f"transform(sequence(0, {n} - 1), i -> named_struct("
        f"'pos', cast(i as int), "
        f"'span', array_join(slice({toks}, i * {k} + 1, {k}), ' '))) "
        f"ELSE cast(array() as array<struct<pos:int, span:string>>) END"
    )


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 3,
    min_docs: int = 4,
) -> DataFrame:
    """Remove every ``span_words``-word span occurring in >= ``min_docs``
    distinct documents; returns (id, clean_text, n_spans, n_removed).

    Deterministic and partitioning-invariant: the banned set is a pure
    function of corpus content, and reassembly sorts surviving spans by
    their original position."""
    spans = df.select(
        F.col(id_col),
        F.explode(F.expr(_spans_expr(text_col, span_words))).alias("_s"),
    ).select(id_col, F.col("_s.pos").alias("pos"), F.col("_s.span").alias("span"))

    banned = (
        spans.groupBy("span")
        .agg(F.countDistinct(id_col).alias("_d"))
        .where(F.col("_d") >= min_docs)
        .select("span")
    )

    kept = (
        spans.join(F.broadcast(banned), "span", "left_anti")
        .groupBy(id_col)
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(pos, span))), x -> x.span), ' ')"
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("_n_kept"),
        )
    )
    totals = spans.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_spans"))

    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(kept, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            (
                F.coalesce("n_spans", F.lit(0))
                - F.coalesce("_n_kept", F.lit(0))
            )
            .cast("long")
            .alias("n_removed"),
        )
    )


def span_dedup_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 3,
    min_docs: int = 4,
) -> str:
    """DuckDB SQL replicating ``span_dedup`` exactly (same chunking, same
    ragged-tail handling, same threshold, same in-order reassembly)."""
    k = span_words
    return f"""
        WITH t AS (
          SELECT {id_col},
                 list_filter(string_split({text_col}, ' '),
                             x -> x <> '') AS toks
          FROM {table}
        ), s AS (
          SELECT {id_col}, CAST(i AS INT) AS pos,
                 array_to_string(
                   list_slice(toks, i * {k} + 1, i * {k} + {k}), ' ') AS span
          FROM t, UNNEST(range(0, CAST(ceil(len(toks) / {k}.0) AS BIGINT)))
               AS u(i)
          WHERE len(toks) > 0
        ), banned AS (
          SELECT span FROM s GROUP BY span
          HAVING count(DISTINCT {id_col}) >= {min_docs}
        ), kept AS (
          SELECT {id_col},
                 string_agg(span, ' ' ORDER BY pos) AS clean_text,
                 count(*) AS n_kept
          FROM s ANTI JOIN banned USING (span)
          GROUP BY {id_col}
        ), tot AS (
          SELECT {id_col}, count(*) AS n_spans FROM s GROUP BY {id_col}
        )
        SELECT d.{id_col},
               coalesce(kept.clean_text, '') AS clean_text,
               CAST(coalesce(tot.n_spans, 0) AS BIGINT) AS n_spans,
               CAST(coalesce(tot.n_spans, 0)
                    - coalesce(kept.n_kept, 0) AS BIGINT) AS n_removed
        FROM {table} d
        LEFT JOIN tot USING ({id_col})
        LEFT JOIN kept USING ({id_col})
    """
