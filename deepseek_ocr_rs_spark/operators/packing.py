"""Token-stream sequence packing: the pretraining concat-and-cut plan.

LLM pretraining concatenates the tokenized corpus into one stream (in a
deterministic document order) and cuts it into fixed-``budget`` training
sequences; a document may straddle a cut (GPT-2/3, T5 "packing" — public
recipes).  Planning that layout for 100 TB needs, per document: which
sequence (pack) it starts in, at what offset, and how many of its tokens
spill past the pack boundary.  All of that is a pure function of the
GLOBAL prefix sum of token counts in document order.

The naive Spark form — ``sum().over(Window.orderBy(id))`` with no
partition key — collapses into a SINGLE reducer (Catalyst warns about
exactly this), a non-starter at scale.  ``pack_sequences`` instead runs
the classic two-phase distributed scan, entirely in DataFrame ops:

  1. bucket documents by ``id // bucket_size`` (deterministic, order-
     preserving since ids sort numerically);
  2. per-bucket token sums — a tiny aggregate (n_buckets rows);
  3. exclusive prefix over the bucket sums — a window over the TINY
     bucket-sums table (single partition of n_buckets rows, not corpus
     rows; at 10^12 turns with bucket_size 10^6 that is 10^6 rows — still
     driver-free and far under one executor's memory);
  4. broadcast-join bucket offsets back and add the within-bucket
     running sum (window partitioned BY BUCKET — parallel again).

The result equals the global scan exactly (integer arithmetic, no
rounding anywhere), which the DuckDB oracle asserts with a plain global
window — the oracle IS the naive form, the operator is the scalable one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BKT = "_pack_bkt"


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    bucket_size: int = 4096,
) -> DataFrame:
    """Assign each document its place in the packed token stream.

    ``id_col`` must be numeric and unique (the deterministic stream
    order); ``tokens_col`` is the document's token count (> 0 rows and
    0-token rows are both handled).  Returns
    (id, n_tokens, pack_id, pack_off, spill):

    * ``pack_id``  — 0-based index of the budget-sized sequence the
      document STARTS in (floor(start / budget));
    * ``pack_off`` — the document's token offset within that pack;
    * ``spill``    — tokens overflowing past that pack's end (0 when the
      document fits; can exceed ``budget`` for documents longer than a
      whole pack — they straddle several cuts, like the stream does).
    """
    base = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.floor(F.col(id_col) / bucket_size).cast("long").alias(_BKT),
    )

    w_in = (
        Window.partitionBy(_BKT)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive prefix over bucket sums: the window runs over n_buckets
    # rows only (the aggregate's output), never over corpus rows
    w_bkts = (
        Window.orderBy(_BKT)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bucket_offsets = (
        base.groupBy(_BKT)
        .agg(F.sum("n_tokens").alias("_bsum"))
        .select(
            _BKT,
            (F.sum("_bsum").over(w_bkts) - F.col("_bsum")).alias("_boff"),
        )
    )

    packed = (
        base.join(F.broadcast(bucket_offsets), _BKT)
        .withColumn(
            "_start",
            F.col("_boff") + F.sum("n_tokens").over(w_in) - F.col("n_tokens"),
        )
        .select(
            id_col,
            "n_tokens",
            # integer division, not floor(double /): a double mantissa
            # drops token-offset precision past 2^53 — reachable at the
            # 10^12-turn design scale (10^15 stream tokens)
            F.expr(f"_start div {budget}").cast("long").alias("pack_id"),
            (F.col("_start") % budget).cast("long").alias("pack_off"),
            F.greatest(
                F.lit(0).cast("long"),
                F.col("_start") + F.col("n_tokens")
                - (F.expr(f"_start div {budget}") + 1) * budget,
            ).cast("long").alias("spill"),
        )
    )
    return packed


def pack_sequences_oracle_sql(
    table_expr: str,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
) -> str:
    """DuckDB oracle: the NAIVE single-scan global prefix sum — the exact
    semantics the two-phase plan must reproduce.  ``table_expr`` is a
    subquery/CTE body yielding (id, tokens)."""
    return f"""
        WITH t AS ({table_expr}),
        scanned AS (
          SELECT {id_col}, CAST({tokens_col} AS BIGINT) AS n_tokens,
                 CAST(sum({tokens_col}) OVER (
                   ORDER BY {id_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - {tokens_col} AS BIGINT) AS start
          FROM t
        )
        SELECT {id_col}, n_tokens,
               CAST(start // {budget} AS BIGINT) AS pack_id,
               CAST(start % {budget} AS BIGINT) AS pack_off,
               CAST(greatest(0, start + n_tokens
                    - (start // {budget} + 1) * {budget}) AS BIGINT)
                 AS spill
        FROM scanned
    """
