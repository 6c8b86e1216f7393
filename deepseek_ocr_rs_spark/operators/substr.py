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
    toked = df.select(
        F.col(id_col),
        F.expr(f"filter(split({text_col}, ' '), x -> x != '')").alias("_toks"),
    )
    grams = toked.select(
        F.col(id_col),
        F.explode(F.expr(_grams_expr("_toks", k))).alias("_g"),
    ).select(id_col, F.col("_g.pos").alias("pos"), F.col("_g.gram").alias("gram"))

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
