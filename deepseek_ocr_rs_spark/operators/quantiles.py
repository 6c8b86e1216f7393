"""Exact per-group discrete quantiles, computed at histogram scale.

Data cards and length-bucketing policies need EXACT percentiles of
per-document statistics (token counts, char lengths) per source — Spark's
``percentile_approx`` is approximate and engine-specific, so it can never
hash-match an oracle.  This operator computes the discrete quantile
(``value at rank ceil(p*n)`` in sorted order — SQL ``percentile_disc``)
exactly, with a plan that scales:

  1. ``groupBy(group, value).count()`` — map-side combinable; the shuffle
     carries one row per DISTINCT (group, value), not per document.  For
     integer token counts the distinct-value set is tiny (thousands) no
     matter how many billions of documents feed it.
  2. A running-sum window over the aggregated histogram (per group,
     ordered by value) gives cumulative counts; the p-quantile is the
     smallest value whose cumulative count reaches ``ceil(p*n)``.
  3. One conditional aggregate per requested p folds the histogram to a
     single row per group.

Contrast with the naive window-over-rows shape (row_number per document
inside a per-group window): that sorts ALL rows of the largest source in
one partition — a guaranteed straggler at 100 TB.  Here the only
full-data operation is a partial-aggregated count.

Quantile positions are exact rationals (``(n*num + den - 1) div den`` =
``ceil(n * num/den)``), so there is no float anywhere and the oracle hash
is stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["group_disc_quantiles", "disc_quantiles_oracle_sql"]

#: (output column, numerator, denominator)
DEFAULT_PS: list[tuple[str, int, int]] = [
    ("p50", 1, 2),
    ("p90", 9, 10),
    ("p99", 99, 100),
]


def group_disc_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: list[tuple[str, int, int]] | None = None,
) -> DataFrame:
    """Exact discrete quantiles of ``value_col`` per ``group_col``.

    Output: one row per group — ``(group, n_rows, min_v, max_v, <p...>)``
    with every statistic an exact integer of the value column's type.
    NULL values are excluded (the SQL percentile convention).
    """
    ps = DEFAULT_PS if ps is None else ps
    hist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("_qc"))
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    cum = hist.withColumn("_qcum", F.sum("_qc").over(w_cum)).withColumn(
        "_qn", F.sum("_qc").over(w_all)
    )

    def _pick(num: int, den: int) -> Column:
        rank = F.expr(f"(_qn * {num} + {den} - 1) div {den}")
        return F.min(F.when(F.col("_qcum") >= rank, F.col(value_col)))

    aggs = [
        F.max("_qn").alias("n_rows"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    ] + [_pick(num, den).alias(name) for name, num, den in ps]
    return cum.groupBy(group_col).agg(*aggs)


def disc_quantiles_oracle_sql(
    rel_sql: str,
    group_col: str,
    value_col: str,
    ps: list[tuple[str, int, int]] | None = None,
) -> str:
    """DuckDB replica of :func:`group_disc_quantiles` — the same
    histogram + running-sum algorithm (``dq_``-prefixed CTEs)."""
    ps = DEFAULT_PS if ps is None else ps
    picks = ",\n       ".join(
        f"MIN(CASE WHEN dq_cum >= (dq_n * {num} + {den} - 1) // {den}"
        f" THEN {value_col} END) AS {name}"
        for name, num, den in ps
    )
    return f"""
WITH dq_rel AS ({rel_sql}),
dq_hist AS (
  SELECT {group_col}, {value_col}, COUNT(*) AS dq_c
  FROM dq_rel WHERE {value_col} IS NOT NULL
  GROUP BY {group_col}, {value_col}
),
dq_cumrel AS (
  SELECT {group_col}, {value_col}, dq_c,
         CAST(SUM(dq_c) OVER (PARTITION BY {group_col} ORDER BY {value_col}
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS dq_cum,
         CAST(SUM(dq_c) OVER (PARTITION BY {group_col}) AS BIGINT) AS dq_n
  FROM dq_hist
)
SELECT {group_col},
       MAX(dq_n) AS n_rows,
       MIN({value_col}) AS min_v,
       MAX({value_col}) AS max_v,
       {picks}
FROM dq_cumrel
GROUP BY {group_col}
"""
