"""MoE-style top-k expert dispatch with per-expert capacity.

The reference's MoE block routes each token to its top-k experts by gate
score and processes each expert's token batch independently
(crates/infer-deepseek/src/transformer/block.rs:1215-1301: softmax gate,
top-k selection, per-expert gather/scatter).  SURVEY §2 maps the routing
(T3) and the load-balancing concern (J5) to Spark; round 3 left T3
concept-only.  This module implements the dispatch itself as pure
DataFrame ops:

* ``topk_expert_dispatch`` — per row (token), rank the expert scores and
  keep the top-k (ties broken by expert index, like the reference's
  stable argsort); then enforce a per-expert CAPACITY: each expert keeps
  at most ``capacity`` tokens, best score first (the standard
  capacity-factor drop used by distributed MoE systems).  Both phases are
  window functions over an exploded (token, expert, score) table —
  map-side explode, two hash-partitioned windows (by token, then by
  expert), no Python anywhere.

100 TB posture: the explode multiplies rows by n_experts BEFORE the
token-window, so project only (id, score) first; the expert window is the
same shuffle shape as any per-key top-k (AQE skew-split applies if one
expert is hot — which is exactly the imbalance the capacity cap bounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_expert_dispatch(
    df: DataFrame,
    n_experts: int = 8,
    k: int = 2,
    capacity: int = 100,
    id_col: str = "vec_id",
    scores_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Route each row to its top-``k`` experts with per-expert capacity.

    ``scores_col`` is an array column; the first ``n_experts`` elements
    are the router logits (analog of the gate projection output).
    Returns (id, expert_id, score, slot) where ``expert_id`` is 0-based,
    ``score`` is the rounded gate score, and ``slot`` in [1, capacity] is
    the token's rank within the expert's batch (score desc, id asc) —
    deterministic, partitioning-independent."""
    routed = (
        df.select(F.col(id_col), F.col(scores_col).alias("_s"))
        .select(
            id_col,
            F.posexplode(F.slice("_s", 1, n_experts)).alias(
                "expert_id", "_score"
            ),
        )
        .withColumn("_score", F.col("_score").cast("double"))
    )
    w_tok = Window.partitionBy(id_col).orderBy(
        F.desc("_score"), F.asc("expert_id")
    )
    topk = routed.withColumn("_rk", F.row_number().over(w_tok)).where(
        F.col("_rk") <= k
    )
    w_exp = Window.partitionBy("expert_id").orderBy(
        F.desc("_score"), F.asc(id_col)
    )
    return (
        topk.withColumn("slot", F.row_number().over(w_exp))
        .where(F.col("slot") <= capacity)
        .select(
            id_col,
            "expert_id",
            F.round("_score", round_to).alias("score"),
            "slot",
        )
    )


def moe_dispatch_oracle_sql(
    table: str = "embeddings",
    n_experts: int = 8,
    k: int = 2,
    capacity: int = 100,
    id_col: str = "vec_id",
    scores_col: str = "embedding",
    round_to: int = 6,
) -> str:
    """DuckDB SQL replicating ``topk_expert_dispatch`` exactly (same
    tie-breaks, same rounding)."""
    return f"""
        WITH routed AS (
          SELECT {id_col},
                 CAST(i - 1 AS INT) AS expert_id,
                 CAST({scores_col}[CAST(i AS INT)] AS DOUBLE) AS score
          FROM {table},
               UNNEST(range(1, {n_experts} + 1)) AS t(i)
        ), topk AS (
          SELECT *, row_number() OVER (
                   PARTITION BY {id_col}
                   ORDER BY score DESC, expert_id ASC) AS rk
          FROM routed
        ), capped AS (
          SELECT {id_col}, expert_id, score,
                 CAST(row_number() OVER (
                   PARTITION BY expert_id
                   ORDER BY score DESC, {id_col} ASC) AS INT) AS slot
          FROM topk WHERE rk <= {k}
        )
        SELECT {id_col}, expert_id, round(score, {round_to}) AS score, slot
        FROM capped WHERE slot <= {capacity}
    """
