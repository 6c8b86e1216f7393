"""Classifier calibration: reliability bins + expected calibration error.

Every stage of a curation pipeline trusts scores as probabilities —
quality filters keep docs above a score cut, mixture samplers weight
by classifier confidence, DSIR importance weights divide two model
scores.  A MISCALIBRATED score silently reweights the corpus: a
filter at "0.9 confidence" that is really 70% precise deletes good
documents at triple the expected rate.  The standard diagnostic
(reliability diagrams and Expected Calibration Error — Guo et al.
2017 "On Calibration of Modern Neural Networks"; DeGroot/Fienberg
1983 — public) bins predictions by confidence and compares each bin's
mean score to its empirical accuracy.

``calibration_bins`` works in the repo's integer-bp discipline: scores
are basis points in [0, 10000]; per equal-width bin it reports

  (bin, n, n_pos, mean_score_bp, acc_bp, gap_bp)

with gap = |accuracy - mean score| (floor-div arithmetic, cross-engine
exact), plus ONE summary row ``bin = -1`` whose gap_bp is the ECE —
the n-weighted mean absolute gap (the mergeable-summary convention of
sketch_hll_daily_users' ALL row).

100 TB plan shape: ONE map-side-combinable hash aggregate over the
scored corpus (10 bins = 10 groups; partial aggregation absorbs any
score skew), then the ECE rollup re-aggregates the 10-row bin table.
No window, no Python, no second pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["calibration_bins", "calibration_bins_oracle_sql"]


def calibration_bins(
    df: DataFrame,
    score_col: str = "score_bp",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability bins over (score_bp in [0,10000], label in {0,1});
    see module doc.  Rows with NULL score or label are dropped (they
    carry no calibration evidence)."""
    width = 10000 // n_bins
    binned = (
        df.where(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .select(
            F.least(
                F.expr(f"{score_col} div {width}"), F.lit(n_bins - 1)
            )
            .cast("long")
            .alias("bin"),
            F.col(score_col).cast("long").alias("_s"),
            F.col(label_col).cast("long").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_y").cast("long").alias("n_pos"),
            F.sum("_s").cast("long").alias("_ssum"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            F.expr("cast(_ssum div n as bigint)").alias("mean_score_bp"),
            F.expr("cast((10000 * n_pos) div n as bigint)").alias("acc_bp"),
            F.expr(
                "cast(abs((10000 * n_pos) div n - _ssum div n) as bigint)"
            ).alias("gap_bp"),
        )
    )
    total = binned.agg(
        F.lit(-1).cast("long").alias("bin"),
        F.sum("n").cast("long").alias("n"),
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.expr(
            "cast(sum(mean_score_bp * n) div sum(n) as bigint)"
        ).alias("mean_score_bp"),
        F.expr("cast((10000 * sum(n_pos)) div sum(n) as bigint)").alias(
            "acc_bp"
        ),
        # ECE: n-weighted mean absolute bin gap
        F.expr("cast(sum(n * gap_bp) div sum(n) as bigint)").alias(
            "gap_bp"
        ),
    )
    return binned.unionByName(total)


def calibration_bins_oracle_sql(
    table: str,
    score_col: str = "score_bp",
    label_col: str = "label",
    n_bins: int = 10,
) -> str:
    """DuckDB SQL replicating ``calibration_bins`` exactly (same
    floor-div bins, gaps, and n-weighted ECE)."""
    width = 10000 // n_bins
    return f"""
        WITH cb_rows AS (
          SELECT least({score_col} // {width}, {n_bins} - 1) AS bin,
                 CAST({score_col} AS BIGINT) AS s,
                 CAST({label_col} AS BIGINT) AS y
          FROM {table}
          WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
        ),
        cb_bins AS (
          SELECT bin, count(*) AS n, sum(y) AS n_pos, sum(s) AS ssum
          FROM cb_rows GROUP BY 1
        ),
        cb_out AS (
          SELECT CAST(bin AS BIGINT) AS bin,
                 CAST(n AS BIGINT) AS n,
                 CAST(n_pos AS BIGINT) AS n_pos,
                 CAST(ssum // n AS BIGINT) AS mean_score_bp,
                 CAST(10000 * n_pos // n AS BIGINT) AS acc_bp,
                 CAST(abs(10000 * n_pos // n - ssum // n) AS BIGINT)
                   AS gap_bp
          FROM cb_bins
        )
        SELECT * FROM cb_out
        UNION ALL
        SELECT CAST(-1 AS BIGINT),
               CAST(sum(n) AS BIGINT),
               CAST(sum(n_pos) AS BIGINT),
               CAST(sum(mean_score_bp * n) // sum(n) AS BIGINT),
               CAST(10000 * sum(n_pos) // sum(n) AS BIGINT),
               CAST(sum(n * gap_bp) // sum(n) AS BIGINT)
        FROM cb_out
    """
