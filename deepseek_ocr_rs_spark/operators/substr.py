"""Exact-substring duplicate span detection (ExactSubstr dedup).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better", public) deduplicate at the SUBSTRING level: any span of >= k
tokens that occurs more than once in the corpus is marked (and usually
cut), catching the long verbatim quotes / licence blocks / templated
passages that whole-document and fixed-chunk dedup (operators/dedup.py,
operators/spandedup.py) both miss.  Their implementation is a corpus
suffix array; a literal suffix array is a single-machine design (one
giant sorted index), so this module re-expresses the same semantics
Spark-first:

1. **Sliding k-grams** — every position i of every doc emits the
   k-token window starting there (stride 1; the C4-style variant in
   spandedup.py uses stride k).  Pure lambda expressions, no Python.
2. **Corpus frequency** — one hash aggregation on the gram text counts
   every occurrence corpus-wide (within-doc repeats count, exactly as a
   suffix array would see them).  This is the only corpus-wide shuffle,
   keyed on the gram — high cardinality, naturally balanced.
3. **Mark + merge** — positions whose gram occurs >= min_count times
   are duplicated; overlapping/adjacent marked windows [i, i+k) merge
   into MAXIMAL duplicated spans per doc via gaps-and-islands (one
   doc-partitioned window pass, never a global sort).

Equivalence note: a position's k-gram repeats iff the position lies in
some repeated substring of length >= k, so merged islands are exactly
the maximal token intervals every suffix-array implementation reports.

100 TB posture: the gram aggregation carries (gram, count) with
map-side partial combine; the join back is gram-keyed (same exchange
Catalyst just produced); island merging is doc-partitioned (docs are
the natural partition key and no doc's position list outgrows a task).
The gram strings themselves can be md5'd before the shuffle if gram
bytes dominate; at k=8 words they are ~50 bytes — cheaper than the
digest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grams_expr(toks_col: str, k: int) -> str:
    """SQL expr over a MATERIALIZED token-array column: an
    array<struct<pos:int, gram:string>> of ALL k-token sliding windows
    (stride 1); docs with < k tokens emit nothing.  Takes a column name,
    not the tokenizer expression, so the split/filter chain is projected
    once per row instead of being re-inlined at each of its three use
    sites (the expression-duplication failure mode the plan guard
    exists for)."""
    return (
        f"CASE WHEN size({toks_col}) >= {k} THEN "
        f"transform(sequence(0, size({toks_col}) - {k}), i -> named_struct("
        f"'pos', cast(i as int), "
        f"'gram', array_join(slice({toks_col}, i + 1, {k}), ' '))) "
        f"ELSE cast(array() as array<struct<pos:int, gram:string>>) END"
    )


def duplicate_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans per doc: every token interval
    [span_start, span_end) (token indices, end exclusive) whose every
    k-window occurs >= ``min_count`` times corpus-wide.

    Returns (id, span_start, span_end, span_tokens, n_windows) sorted
    semantics-free (caller orders); deterministic and
    partitioning-invariant — the marked set is a pure function of
    corpus content and island merging is per-doc.
    """
    # r06 kernel: the interpreted sliding-window chunker (named_struct +
    # slice + array_join per position) ran TWICE (freq and the mark join
    # both re-ran the lineage) — 12.1 s at sf1.0 for ~2.4M windows.  One
    # Arrow pass emits (id, pos, gram) and is persisted for its two
    # consumers; the corpus-frequency shuffle and the island merge are
    # unchanged.
    import pandas as pd

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    id_type = dict(df.dtypes)[id_col]

    def windows(batches):
        for pdf in batches:
            ids, poss, grams_out = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in (text or "").split(" ") if t]
                for i in range(len(toks) - k + 1):
                    ids.append(did)
                    poss.append(i)
                    grams_out.append(" ".join(toks[i:i + k]))
            yield pd.DataFrame(
                {id_col: ids, "pos": poss, "gram": grams_out}
            )

    grams = (
        rebalance_for_arrow(df.select(id_col, text_col))
        .mapInPandas(
            windows, schema=f"{id_col} {id_type}, pos int, gram string"
        )
        .persist()
    )

    freq = grams.groupBy("gram").agg(F.count("*").alias("_c"))
    marked = (
        grams.join(freq.where(F.col("_c") >= min_count), "gram")
        .select(id_col, "pos")
    )

    # gaps-and-islands: a new island starts when this window no longer
    # overlaps/abuts the furthest end reached so far (pos > max_prev_end;
    # ends are pos + k, so consecutive marked positions always chain)
    wd = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        wd.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = marked.withColumn(
        "_new", F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1)
        .otherwise(0)
    ).withColumn(
        "_isl",
        F.sum("_new").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(id_col, "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select(
            id_col,
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start"))
            .cast("int")
            .alias("span_tokens"),
            F.col("n_windows").cast("long").alias("n_windows"),
        )
    )


def cut_duplicate_substrings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """ExactSubstr APPLY step: re-emit every doc with its duplicated
    spans (as found by :func:`duplicate_substring_spans`) cut out at
    token granularity — the Lee et al. 2022 policy of dropping every
    marked occurrence (their released tool cuts all copies; "keep one"
    needs a global occurrence order that doesn't distribute).

    Returns ``(id, clean_text, n_tokens int, n_tokens_removed int,
    n_spans_cut int)`` — one row per INPUT doc (docs with no duplicated
    span pass through with zero counters, so the output is a drop-in
    replacement corpus).

    Scale shape: the span finder's two exchanges, plus ONE doc-keyed
    join of (doc, span-list).  Span lists per doc are tiny (bounded by
    n_tokens/k islands); token filtering is a JVM lambda over the
    already-materialized token array — no Python, no extra window.
    """
    spans = duplicate_substring_spans(
        df, id_col=id_col, text_col=text_col, k=k, min_count=min_count
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans"),
        F.count("*").cast("int").alias("n_spans_cut"),
    )
    toked = df.select(
        F.col(id_col),
        F.expr(f"filter(split({text_col}, ' '), x -> x != '')").alias("_toks"),
    )
    joined = toked.join(per_doc, id_col, "left")
    kept = F.filter(
        F.col("_toks"),
        lambda _tok, i: ~F.exists(
            F.col("_spans"),
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    return joined.select(
        id_col,
        F.when(F.col("_spans").isNull(), F.array_join("_toks", " "))
        .otherwise(F.array_join(kept, " "))
        .alias("clean_text"),
        F.size("_toks").alias("n_tokens"),
        F.when(F.col("_spans").isNull(), F.lit(0))
        .otherwise(F.size("_toks") - F.size(kept))
        .cast("int")
        .alias("n_tokens_removed"),
        F.coalesce("n_spans_cut", F.lit(0)).alias("n_spans_cut"),
    )


def substring_spans_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> str:
    """DuckDB SQL replicating ``duplicate_substring_spans`` exactly:
    same sliding windows, same corpus count, same island merge."""
    return f"""
        WITH toks AS (
          SELECT {id_col},
                 list_filter(string_split({text_col}, ' '), x -> x <> '')
                   AS w
          FROM {table}
        ),
        grams AS (
          SELECT {id_col}, CAST(i AS INT) AS pos,
                 array_to_string(w[i + 1 : i + {k}], ' ') AS gram
          FROM toks, LATERAL unnest(range(0, len(w) - {k} + 1)) AS t(i)
          WHERE len(w) >= {k}
        ),
        freq AS (
          SELECT gram FROM grams GROUP BY gram
          HAVING count(*) >= {min_count}
        ),
        marked AS (
          SELECT g.{id_col}, g.pos FROM grams g JOIN freq USING (gram)
        ),
        flagged AS (
          SELECT {id_col}, pos,
                 CASE WHEN max(pos + {k}) OVER (
                        PARTITION BY {id_col} ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      IS NULL
                      OR pos > max(pos + {k}) OVER (
                        PARTITION BY {id_col} ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 THEN 1 ELSE 0 END AS new_isl
          FROM marked
        ),
        islands AS (
          SELECT {id_col}, pos,
                 sum(new_isl) OVER (PARTITION BY {id_col} ORDER BY pos
                                    ROWS UNBOUNDED PRECEDING) AS isl
          FROM flagged
        )
        SELECT {id_col},
               CAST(min(pos) AS INTEGER) AS span_start,
               CAST(max(pos) + {k} AS INTEGER) AS span_end,
               CAST(max(pos) + {k} - min(pos) AS INTEGER) AS span_tokens,
               CAST(count(*) AS BIGINT) AS n_windows
        FROM islands
        GROUP BY {id_col}, isl
    """


def substring_cut_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> str:
    """DuckDB SQL replicating ``cut_duplicate_substrings``: the span
    CTEs of :func:`substring_spans_oracle_sql`, then a per-token
    anti-join on position containment and an ordered re-agg."""
    spans = substring_spans_oracle_sql(
        table=table, id_col=id_col, text_col=text_col, k=k,
        min_count=min_count,
    )
    return f"""
        WITH spans AS ({spans}),
        toks AS (
          SELECT {id_col},
                 list_filter(string_split({text_col}, ' '), x -> x <> '')
                   AS w
          FROM {table}
        ),
        tokens AS (
          SELECT {id_col}, CAST(i AS INT) AS pos, w[i + 1] AS tok
          FROM toks, LATERAL unnest(range(0, len(w))) AS t(i)
        ),
        kept AS (
          SELECT t.{id_col}, t.pos, t.tok
          FROM tokens t
          WHERE NOT EXISTS (
            SELECT 1 FROM spans s
            WHERE s.{id_col} = t.{id_col}
              AND t.pos >= s.span_start AND t.pos < s.span_end
          )
        ),
        agg AS (
          SELECT {id_col},
                 string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                 count(*) AS n_kept
          FROM kept GROUP BY {id_col}
        ),
        nsp AS (
          SELECT {id_col}, CAST(count(*) AS INT) AS n_spans_cut
          FROM spans GROUP BY {id_col}
        )
        SELECT d.{id_col},
               COALESCE(a.clean_text, '') AS clean_text,
               CAST(len(d.w) AS INT) AS n_tokens,
               CAST(len(d.w) - COALESCE(a.n_kept, 0) AS INT)
                 AS n_tokens_removed,
               COALESCE(nsp.n_spans_cut, 0) AS n_spans_cut
        FROM toks d
        LEFT JOIN agg a USING ({id_col})
        LEFT JOIN nsp USING ({id_col})
    """
