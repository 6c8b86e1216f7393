"""Hot-key (skew) defenses: salted joins and co-located bucketed joins.

SURVEY §4 notes the reference has no skew handling to port — its only
load-balancing pattern is MoE expert dispatch
(crates/infer-deepseek/src/transformer/block.rs:1215-1301), which SURVEY
maps to salted repartitioning.  The extraction pipeline already salts its
input shuffle (plans/pipeline.py); this module provides the *join* leg:

* ``salted_join`` — for an equi-join whose key distribution is hot (a few
  values hold most rows: low-cardinality keys, boilerplate duplicates,
  null-ish ids) and whose small side is still too big to broadcast.  The
  big side gets a deterministic per-row salt in [0, n_salts); the small
  side is replicated once per salt value; the join runs on
  (key, salt), so one hot key spreads over n_salts reducers instead of
  melting one task.  Result is exactly the plain join (every big row sees
  the full small-side group for its key).

* ``write_bucketed`` / co-located reads — when the SAME key joins again
  and again (fact-to-fact at 100 TB), pre-bucketing both sides by the key
  lets Spark's bucketed scan skip the exchange entirely; see
  tests/test_skew_bucketing.py for the no-Exchange plan assertion.

AQE's skew-join split (spark.sql.adaptive.skewJoin.enabled) handles
*discovered* skew at runtime for sort-merge joins; ``salted_join`` is the
explicit, planner-independent defense for *known-hot* keys and for
broadcast-ineligible dimension sides.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_skew_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Union[str, Sequence[str]],
    n_salts: int = 16,
    how: str = "inner",
    row_key: Optional[Union[str, Sequence[str]]] = None,
) -> DataFrame:
    """Skew-defused equi-join of ``big`` against ``small`` on ``on``.

    The salt is deterministic per row (retry/partitioning-safe, no
    nondeterministic rand()) and uniform enough to spread a hot key.  The
    small side explodes into all n_salts values, so each (key, salt)
    bucket holds the complete small-side group: the join result is
    row-for-row identical to the unsalted join.  Cost: small side is
    materialized n_salts times — size the salt count to
    (hot-key rows / target task size), not higher.

    ``row_key`` names the column(s) whose hash drives the salt.  Pass a
    unique per-row id (file/offset, event_id, monotonically-increasing id)
    when the hot key's rows may be *exact duplicates*: the default salts
    by a hash of ALL big-side columns, so identical rows always draw the
    same salt and a hot key made of boilerplate duplicate rows would still
    land on a single (key, salt) reducer — correct but un-spread.  With a
    unique row_key the spread is uniform regardless of content duplication.

    ``how`` supports 'inner' and 'left' (every big row carries a salt and
    the small side covers all salts, so left semantics are preserved)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys: List[str] = [on] if isinstance(on, str) else list(on)
    if row_key is None:
        salt_cols = [F.col(c) for c in big.columns]
    else:
        names = [row_key] if isinstance(row_key, str) else list(row_key)
        salt_cols = [F.col(c) for c in names]
    salt = F.pmod(F.hash(*salt_cols), F.lit(n_salts))
    b = big.withColumn(_SALT, salt)
    s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, keys + [_SALT], how).drop(_SALT)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: Optional[str] = None,
) -> None:
    """Persist ``df`` as a bucketed table so future joins/aggregations on
    ``bucket_col`` read pre-partitioned data and skip the exchange — the
    batch analog of co-locating a fact table with its hottest join key.
    (saveAsTable is required: bucket metadata lives in the catalog.)"""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


# ----------------------------------------------------- skew diagnostics


def key_skew_profile(
    df: DataFrame, key_col: str
) -> DataFrame:
    """Log2-bucketed key-frequency histogram — the diagnostic that
    DECIDES when the salted-join / AQE-skew defenses above are needed,
    run before committing a join strategy at 100 TB: one row per
    occupied bucket,

        (bucket, n_keys, n_rows, rows_bp)

    where ``bucket = floor(log2(key_count))`` (bucket 0 = singleton
    keys, bucket 20 = keys with ~1M rows — the melt-one-reducer tier),
    ``n_rows`` the total rows those keys hold and ``rows_bp`` their
    share of the table in floor basis points.  A healthy join key puts
    its mass in low buckets; mass in high buckets is exactly the skew
    a plain hash join serializes onto single reducers.

    NULL keys get bucket -1 (their own row): NULLs are the classic
    accidental hot key, so the profile must show them, not drop them.

    100 TB plan shape: ONE shuffle (the per-key count — map-side
    combinable), then the bucket rollup re-aggregates the tiny counts
    table; the log2 is ``length(bin(c)) - 1`` (the HLL register trick),
    integer-exact on both engines.  NO global sort anywhere — a ranked
    Gini would funnel |keys| rows through one window; the histogram
    carries the same decision signal fully parallel.
    """
    counts = df.groupBy(
        F.col(key_col).alias("_k")
    ).agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("_t"))
    bucket = F.when(F.col("_k").isNull(), F.lit(-1)).otherwise(
        F.length(F.bin(F.col("c"))) - 1
    )
    return (
        counts.select(bucket.alias("bucket"), "c")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("c").cast("long").alias("n_rows"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_keys",
            "n_rows",
            F.expr("cast((10000 * n_rows) div _t as bigint)").alias(
                "rows_bp"
            ),
        )
    )


def key_skew_profile_oracle_sql(table: str, key_col: str) -> str:
    """DuckDB SQL replicating ``key_skew_profile`` exactly (same
    length(bin()) log2, same floor-division basis points)."""
    return f"""
        WITH ks_counts AS (
          SELECT {key_col} AS _k, count(*) AS c
          FROM {table} GROUP BY 1
        ),
        ks_buckets AS (
          SELECT CASE WHEN _k IS NULL THEN -1
                      ELSE length(bin(c)) - 1 END AS bucket,
                 count(*) AS n_keys, sum(c) AS n_rows
          FROM ks_counts GROUP BY 1
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(n_keys AS BIGINT) AS n_keys,
               CAST(n_rows AS BIGINT) AS n_rows,
               CAST(10000 * n_rows //
                    (SELECT sum(c) FROM ks_counts) AS BIGINT) AS rows_bp
        FROM ks_buckets
    """


def join_explosion_profile(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Exact pre-join cardinality profile: what WILL an equi-join of
    ``a`` and ``b`` on ``key_col`` produce, before paying for it?

    The join's output size is sum_k cA(k) * cB(k) — computable from
    the two per-key count tables at a tiny fraction of the join's own
    cost (counts are map-side combinable; the count-table join is
    |keys|-sized, not |rows|-sized).  At 100 TB this is the guard that
    catches a join explosion (a boilerplate digest, a default user id,
    an unexpected m:n key) BEFORE it melts the shuffle — the decision
    input for broadcast/salt/bucket strategies, complementing
    ``key_skew_profile`` (one-sided histogram) with the two-sided
    product view.

    Output: the ``top_k`` keys by contribution,
      (key, n_a, n_b, contribution, share_bp, total_rows)
    ordered deterministically by (contribution DESC, key) via
    TakeOrderedAndProject — no full sort.  ``total_rows`` (the same on
    every row) is the exact join cardinality; NULL keys are excluded
    exactly as the equi-join itself would drop them.
    """
    ca = (
        a.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("_ca"))
    )
    cb = (
        b.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("_cb"))
    )
    contrib = ca.join(cb, "k").select(
        "k",
        F.col("_ca").cast("long").alias("n_a"),
        F.col("_cb").cast("long").alias("n_b"),
        (F.col("_ca") * F.col("_cb")).cast("long").alias("contribution"),
    )
    total = contrib.agg(
        F.coalesce(F.sum("contribution"), F.lit(0)).alias("_tot")
    )
    return (
        contrib.crossJoin(F.broadcast(total))
        .orderBy(F.col("contribution").desc(), F.col("k"))
        .limit(top_k)
        .select(
            F.col("k").alias(key_col),
            "n_a",
            "n_b",
            "contribution",
            F.expr(
                "cast((10000 * contribution) div nullif(_tot, 0) as bigint)"
            ).alias("share_bp"),
            F.col("_tot").cast("long").alias("total_rows"),
        )
    )


def join_explosion_oracle_sql(
    a_sql: str,
    b_sql: str,
    key_col: str,
    top_k: int = 10,
) -> str:
    """DuckDB SQL replicating ``join_explosion_profile`` exactly (same
    contribution product, same (contribution DESC, key) top-k)."""
    return f"""
        WITH je_ca AS (
          SELECT {key_col} AS k, count(*) AS ca FROM {a_sql}
          WHERE {key_col} IS NOT NULL GROUP BY 1
        ),
        je_cb AS (
          SELECT {key_col} AS k, count(*) AS cb FROM {b_sql}
          WHERE {key_col} IS NOT NULL GROUP BY 1
        ),
        je_c AS (
          SELECT k, CAST(ca AS BIGINT) AS n_a, CAST(cb AS BIGINT) AS n_b,
                 CAST(ca * cb AS BIGINT) AS contribution
          FROM je_ca JOIN je_cb USING (k)
        ),
        je_t AS (SELECT coalesce(sum(contribution), 0) AS tot FROM je_c)
        SELECT k AS {key_col}, n_a, n_b, contribution,
               CAST(10000 * contribution // nullif(tot, 0) AS BIGINT)
                 AS share_bp,
               CAST(tot AS BIGINT) AS total_rows
        FROM je_c, je_t
        ORDER BY contribution DESC, k
        LIMIT {top_k}
    """
