"""Length-bucketed dynamic batching (the fairseq/T5 ``--max-tokens`` plan).

Sequence packing (operators/packing.py) concatenates documents into
fixed windows for pretraining; FINE-TUNING and inference serving instead
pad each example to its batch's longest member, so the batch plan itself
decides the pad waste.  The standard cure is length bucketing: group
examples into coarse length buckets, shuffle within the bucket, and cut
batches whose size is the token budget divided by the bucket's pad
target — long sequences travel in small batches, short ones in large
batches, and the pad waste is bounded by the bucket width.  Reference
analog: the serving loop's per-request batch shaping around a fixed
context budget (crates/server/src/generation.rs:200-244).

All arithmetic is integer-exact and seeded (the ``md5(key ':' seed)``
60-bit house hash, operators/sampling.py), so the DuckDB oracle replays
the full plan value-exactly.

Scale design (100 TB):
* the dangerous step is "rank within bucket" — a plain
  ``row_number() OVER (PARTITION BY bucket)`` funnels each bucket
  through ONE reducer, and there are only ~n_buckets of them.  Instead
  the plan rides :func:`operators.sharding.assign_global_ids` (the
  two-phase distributed zipWithIndex): ONE composite zero-padded sort
  key ``(bucket | shuffle_u | id)`` range-partitions the whole corpus,
  every partition ranks locally, and the per-bucket rank is recovered
  as ``global_id - min(global_id) per bucket`` via an n_buckets-row
  broadcast join — no single-reducer window anywhere;
* everything after the rank (batch id, position, pad accounting) is
  map-side column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.sampling import _u_col
from deepseek_ocr_rs_spark.operators.sharding import assign_global_ids

__all__ = ["length_bucket_batches", "length_bucket_batches_oracle_sql"]


def length_bucket_batches(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    bucket_width: int = 64,
    n_buckets: int = 8,
    token_budget: int = 4096,
    seed: int = 0,
) -> DataFrame:
    """Plan padded batches: returns ``(id, n_tokens, bucket_id,
    batch_id, pos_in_batch, pad_target, pad_tokens)``.

    * ``bucket_id = least(n_tokens div bucket_width, n_buckets - 1)``;
    * ``pad_target = (bucket_id + 1) * bucket_width`` — every example in
      the bucket pads to the bucket ceiling (the last, open-ended bucket
      pads to the bucket's own max length would be data-dependent, so it
      keeps the fixed ceiling: callers cap upstream);
    * ``batch_size = max(1, token_budget div pad_target)`` — constant
      per bucket, so ``batch_id = rank div batch_size`` and
      ``pos_in_batch = rank mod batch_size`` with the rank being the
      seeded within-bucket shuffle order;
    * ``pad_tokens = pad_target - min(n_tokens, pad_target)`` — the
      per-example waste the bucketing bounds.

    ``id_col`` must be unique (the assign_global_ids contract).
    """
    if bucket_width <= 0 or n_buckets <= 0 or token_budget <= 0:
        raise ValueError("bucket_width, n_buckets, token_budget must be > 0")
    nt = F.col(n_tokens_col).cast("long")
    bucket = F.least(
        F.expr(f"{n_tokens_col} div {bucket_width}"),
        F.lit(n_buckets - 1),
    ).cast("int")
    keyed = df.select(
        F.col(id_col),
        nt.alias("n_tokens"),
        bucket.alias("bucket_id"),
        _u_col(F.col(id_col), seed).alias("_u"),
    ).withColumn(
        # zero-padded composite => string order == (bucket, u, id) order
        "_bkey",
        F.format_string(
            "%02d|%019d|%019d", F.col("bucket_id"), F.col("_u"),
            F.col(id_col),
        ),
    )
    ids = assign_global_ids(keyed, "_bkey", id_name="_gid")
    base = ids.groupBy(F.col("bucket_id").alias("_b")).agg(
        F.min("_gid").alias("_base")
    )
    return (
        ids.join(F.broadcast(base), ids.bucket_id == F.col("_b"))
        .withColumn("_rank", F.col("_gid") - F.col("_base"))
        .withColumn(
            "pad_target",
            ((F.col("bucket_id") + 1) * bucket_width).cast("long"),
        )
        .withColumn(
            "_bsz",
            F.greatest(
                F.lit(1),
                F.expr(
                    f"{token_budget} div ((bucket_id + 1) * {bucket_width})"
                ),
            ).cast("long"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.col("bucket_id"),
            F.expr("_rank div _bsz").cast("long").alias("batch_id"),
            F.pmod(F.col("_rank"), F.col("_bsz"))
            .cast("long")
            .alias("pos_in_batch"),
            F.col("pad_target"),
            (
                F.col("pad_target")
                - F.least(F.col("n_tokens"), F.col("pad_target"))
            ).cast("long").alias("pad_tokens"),
        )
    )


def length_bucket_batches_oracle_sql(
    table: str,
    id_col: str,
    n_tokens_expr: str,
    bucket_width: int = 64,
    n_buckets: int = 8,
    token_budget: int = 4096,
    seed: int = 0,
) -> str:
    """DuckDB replica: same hash, same bucket/batch arithmetic, with the
    two-phase distributed rank collapsing to a per-bucket row_number."""
    return f"""
WITH lbb_t AS (
  SELECT {id_col} AS id,
         CAST({n_tokens_expr} AS BIGINT) AS n_tokens,
         CAST(LEAST(({n_tokens_expr}) // {bucket_width}, {n_buckets - 1})
              AS INTEGER) AS bucket_id,
         CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR) || ':{seed}'),
              1, 15) AS BIGINT) AS u
  FROM {table}
), lbb_r AS (
  SELECT *,
         row_number() OVER (PARTITION BY bucket_id ORDER BY u, id) - 1
           AS rk,
         CAST((bucket_id + 1) * {bucket_width} AS BIGINT) AS pad_target,
         GREATEST(1, {token_budget} // ((bucket_id + 1) * {bucket_width}))
           AS bsz
  FROM lbb_t
)
SELECT id AS {id_col},
       n_tokens,
       bucket_id,
       CAST(rk // bsz AS BIGINT) AS batch_id,
       CAST(rk % bsz AS BIGINT) AS pos_in_batch,
       pad_target,
       CAST(pad_target - LEAST(n_tokens, pad_target) AS BIGINT)
         AS pad_tokens
FROM lbb_r
""".strip()
