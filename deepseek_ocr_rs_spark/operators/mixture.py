"""Temperature-based source mixture sampling (data-mixing tier).

LLM training corpora are assembled from heterogeneous sources whose raw
sizes span orders of magnitude; sampling each source proportionally to
``n^alpha`` (multinomial temperature, alpha < 1) upweights small
high-quality sources without flooding the mix with the largest crawl —
the mixing rule of multilingual BERT/XLM-R and the survey's curation
discipline.  The reference's analog is again deterministic sampling from
explicit state (crates/core/src/sampling.rs:104-118): the sampled set
must be a pure function of (corpus statistics, seed).

``temperature_mixture_sample`` derives per-source keep-rates FROM the
corpus itself (unlike ``stratified_sample``, whose fractions are
caller-supplied):

    n_g    = rows in source g                  (exact hash aggregation)
    w_g    = sqrt(n_g)                         (alpha = 0.5; IEEE sqrt is
                                                correctly rounded, hence
                                                bit-identical everywhere)
    W      = sum of w_g in a FIXED left fold ordered by g (the bm25/
             tfidf fold discipline — a plain double SUM would be
             partition-order dependent)
    rate_g = min(1, (target * w_g) / (W * n_g))
    keep   iff md5-hash(key, seed) mod 1e6 < floor(rate_g * 1e6)

Every float op is a single correctly-rounded IEEE operation, so the
DuckDB oracle reproduces the sampled set row-for-row.

Design for 100 TB:
- One aggregation over the corpus produces the (tiny, one row per
  source) rate table; it attaches back by BROADCAST hash join.
- Inclusion is then a pure map-side filter — no shuffle of the corpus,
  no RNG state, stable under retries and repartitioning.
- alpha is fixed at 0.5 because sqrt is the one power IEEE guarantees
  correctly rounded; arbitrary ``pow`` is libm-dependent (the
  cross-engine divergence class the repo's log-free scores avoid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _BUCKETS, _u_col


def mixture_rates(
    df: DataFrame, group_col: str, target_rows: int
) -> DataFrame:
    """(group, n_g, thresh): the per-source inclusion threshold in
    millionths.  NULL-group rows are excluded (they also drop out of the
    sample via the inner rate join)."""
    n = (
        df.where(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count("*").alias("n_g"))
    )
    w = n.withColumn("w_g", F.sqrt(F.col("n_g").cast("double")))
    tot = w.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(group_col, "w_g"))),
            F.lit(0.0),
            lambda acc, s: acc + s["w_g"],
        ).alias("w_total")
    )
    rate = F.least(
        F.lit(1.0),
        (F.lit(float(target_rows)) * F.col("w_g"))
        / (F.col("w_total") * F.col("n_g").cast("double")),
    )
    return w.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_g",
        F.floor(rate * _BUCKETS).cast("long").alias("thresh"),
    )


def temperature_mixture_sample(
    df: DataFrame,
    group_col: str,
    target_rows: int,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Sample ~``target_rows`` rows with per-group rates proportional to
    sqrt(group size) — deterministic, map-side after one stats pass."""
    rates = mixture_rates(df, group_col, target_rows)
    u = _u_col(F.col(key_col), seed)
    # NULL sampling keys would hash engine-dependently (Spark concat_ws
    # skips NULL, SQL '||' nulls out) — exclude them like the oracle does
    return (
        df.where(F.col(key_col).isNotNull())
        .join(F.broadcast(rates.select(group_col, "thresh")), group_col)
        .where((u % _BUCKETS) < F.col("thresh"))
        .drop("thresh")
    )


def temperature_mixture_oracle_sql(
    table: str,
    group_col: str,
    target_rows: int,
    key_col: str,
    select_cols: str,
    seed: int = 42,
) -> str:
    """DuckDB SQL replicating ``temperature_mixture_sample`` row-for-row
    (same sqrt / fixed-fold total / single-division rate / md5 bucket)."""
    return f"""
        WITH n AS (
          SELECT {group_col} AS g, count(*) AS n_g
          FROM {table} WHERE {group_col} IS NOT NULL GROUP BY 1
        ),
        w AS (SELECT g, n_g, sqrt(CAST(n_g AS DOUBLE)) AS w_g FROM n),
        tot AS (
          SELECT list_reduce(list_prepend(0.0, list(w_g ORDER BY g)),
                             (acc, x) -> acc + x) AS w_total
          FROM w
        ),
        r AS (
          SELECT g,
                 CAST(floor(least(1.0,
                        ({float(target_rows)!r} * w_g)
                        / (t.w_total * CAST(n_g AS DOUBLE)))
                      * {_BUCKETS}) AS BIGINT) AS thresh
          FROM w CROSS JOIN tot t
        )
        SELECT {select_cols}
        FROM {table} d JOIN r ON d.{group_col} = r.g
        WHERE d.{key_col} IS NOT NULL
          AND (CAST('0x' || substr(md5(CAST(d.{key_col} AS VARCHAR)
                                       || ':{seed}'), 1, 15) AS BIGINT)
               % {_BUCKETS}) < r.thresh
    """
