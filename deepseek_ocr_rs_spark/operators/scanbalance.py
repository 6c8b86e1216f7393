"""Scan-balance diagnostics: the small-files / hot-file profiler.

At 100 TB the scan layout IS the performance model: a table of
10-million 100 KB files drowns the driver in planning and the
executors in open/close overhead, while one 2 TB file serializes a
stage onto one task per row-group run.  The per-file row profile is
the diagnostic that decides compaction (small files), re-bucketing
(hot files), and `maxPartitionBytes` tuning — and on an ingest
inventory of many tables it is the dataset card's "what am I actually
holding" row.

``scan_balance`` profiles any list of scans using the engine's own
file attribution (``input_file_name()`` — no filesystem access, no
metadata service): per file,

  (file, n_rows, rows_bp, verdict)

with rows_bp the floor-bp share of the total and verdict ``tiny``
(under a tenth of the mean file's rows — the small-files smell),
``heavy`` (over 10x the mean — the hot-file smell), else ``ok``.
Thresholds are integer cross-multiplications: n * rows * 10 < total
and n * rows > 10 * total.

100 TB plan shape: ONE map-side-combinable count per file (the
file-name key has as many values as files — exactly the cardinality
being audited) + a 1-row total broadcast.  No Python, no window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scan_balance", "scan_balance_oracle_sql"]


def scan_balance(scans: Sequence[DataFrame]) -> DataFrame:
    """Per-file row profile over the union of ``scans`` — see module
    doc.  Each input DataFrame must be a direct file scan (so
    ``input_file_name()`` attributes rows)."""
    per = None
    for df in scans:
        part = df.select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias(
                "file"
            )
        )
        per = part if per is None else per.unionByName(part)
    counts = per.groupBy("file").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    total = counts.agg(
        F.sum("n_rows").alias("_tot"), F.count(F.lit(1)).alias("_nf")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "file",
            "n_rows",
            F.expr(
                "cast((10000 * n_rows) div nullif(_tot, 0) as bigint)"
            ).alias("rows_bp"),
            F.when(
                F.col("n_rows") * F.col("_nf") * 10 < F.col("_tot"),
                F.lit("tiny"),
            )
            .when(
                F.col("n_rows") * F.col("_nf") > F.col("_tot") * 10,
                F.lit("heavy"),
            )
            .otherwise(F.lit("ok"))
            .alias("verdict"),
        )
    )


def scan_balance_oracle_sql(tables: Sequence[str]) -> str:
    """DuckDB SQL replicating ``scan_balance`` over registered table
    views — each view is a single ``<table>.parquet`` file in this
    corpus, so the file attribution is the literal basename and the
    oracle stays scale-factor-independent (the harness re-registers
    the views per SF; DuckDB's ``filename=true`` would hardcode one
    SF's paths)."""
    unions = "\n          UNION ALL\n          ".join(
        f"SELECT '{t}.parquet' AS file FROM {t}" for t in tables
    )
    return f"""
        WITH sb_rows AS (
          {unions}
        ),
        sb_counts AS (
          SELECT file, count(*) AS n_rows FROM sb_rows GROUP BY 1
        ),
        sb_tot AS (
          SELECT sum(n_rows) AS tot, count(*) AS nf FROM sb_counts
        )
        SELECT file,
               CAST(n_rows AS BIGINT) AS n_rows,
               CAST(10000 * n_rows // nullif(tot, 0) AS BIGINT) AS rows_bp,
               CASE WHEN n_rows * nf * 10 < tot THEN 'tiny'
                    WHEN n_rows * nf > tot * 10 THEN 'heavy'
                    ELSE 'ok' END AS verdict
        FROM sb_counts, sb_tot
    """
