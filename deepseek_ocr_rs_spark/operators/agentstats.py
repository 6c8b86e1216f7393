"""Agent-transcript analytics over the (conv_id, turn_idx, role, text,
tool, ts) shape — the BASELINE.json input_hint table.

The reference serves multi-turn agent conversations whose tool-call turns
carry a tool name and a timestamp (chat template tool markers,
``crates/server/src/conversation.rs``); these operators compute the
corpus-level statistics an operator of such a service needs:

  tool_usage_stats   per-tool call counts, conversation reach, and the
                     latency from a tool turn to the NEXT turn in the same
                     conversation (the tool-roundtrip proxy).  One window
                     pass partitioned by conv_id (single shuffle), then a
                     small per-tool hash aggregate.

  tool_call_runs     gaps-and-islands over consecutive tool turns: an
                     agent that calls tools N times in a row with no
                     intervening user/assistant turn is in a tool LOOP.
                     Two row_number windows over the SAME (conv_id,
                     turn_idx) ordering -> one exchange, two in-partition
                     sorts, then a hash aggregate on the island key.

Scale posture (100 TB): both operators shuffle exactly once on conv_id —
the same key the extraction pipeline already ranges on, so under a shared
partitioning they are exchange-free.  Latency arithmetic is integer
milliseconds (unix_millis), so aggregates are exact and order-independent;
the only doubles are final rounded averages of exact integer sums.

Oracle parity: every step (row_number, lead, epoch-ms difference, integer
sums) is replicated verbatim in DuckDB SQL by the *_oracle_sql builders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tool_usage_stats",
    "tool_call_runs",
    "context_window_fit",
    "tool_stats_oracle_sql",
    "tool_runs_oracle_sql",
    "context_fit_oracle_sql",
]


def tool_usage_stats(turns: DataFrame) -> DataFrame:
    """Per-tool usage + roundtrip-latency stats.

    For every role='tool' turn, the latency is the gap (ms) to the next
    turn of ANY role in the same conversation — on agent transcripts the
    turn after a tool call is the model consuming the tool result, so the
    gap prices the tool roundtrip.  Conversations ending on a tool turn
    contribute the call but no gap (lead is NULL at the frontier).

    Output: (tool, n_calls, n_convs, total_gap_ms, avg_gap_ms) with
    total_gap_ms an exact int64 sum and avg_gap_ms = round(total/n, 2) —
    a double division of exact integers, deterministic cross-engine.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # parquet timestamps arrive as TIMESTAMP_NTZ; under the UTC session
    # the cast is the identity wall-clock reading DuckDB's epoch_ms uses
    ts_utc = F.col("ts").cast("timestamp")
    gap = (
        F.unix_millis(F.lead(ts_utc).over(w)) - F.unix_millis(ts_utc)
    ).alias("gap_ms")
    tool_turns = (
        turns.select("conv_id", "turn_idx", "role", "tool", "ts")
        .withColumn("gap_ms", gap)
        .where(F.col("role") == "tool")
    )
    return (
        tool_turns.groupBy("tool")
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.countDistinct("conv_id").alias("n_convs"),
            # DOUBLE, not int64: the oracle's bare SUM(BIGINT) is a DuckDB
            # HUGEINT -> pandas float64; a dtype-sensitive canonicalizer
            # hashes the same exact integer two ways (the ann_sq8_topk
            # CORRECTNESS_r05 failure class).  Exact: values << 2^53.
            F.sum("gap_ms").cast("double").alias("total_gap_ms"),
            # floor(x*100 + 0.5)/100 SPELLED OUT on both engines: sums of
            # exact ms divided by power-of-two counts land EXACTLY on the
            # half-grid, where engine-native round() modes diverge (the q2
            # money discipline, __spark_entry__.py)
            (
                F.floor(F.sum("gap_ms") / F.count("gap_ms") * 100 + 0.5)
                / 100
            ).alias("avg_gap_ms"),
        )
        .orderBy("tool")
    )


def tool_call_runs(turns: DataFrame, min_len: int = 1) -> DataFrame:
    """Consecutive tool-turn runs (agent loops) per conversation.

    Island key: seq - row_number-over-tool-turns, where seq is the turn's
    row_number over ALL turns of the conversation — consecutive tool turns
    (no intervening non-tool turn) share the key even when turn_idx has
    numbering gaps.  Both windows order by the same (conv_id, turn_idx),
    so Catalyst plans ONE exchange.

    Output: (conv_id, first_turn, last_turn, run_len, n_tools), runs of
    length >= min_len, n_tools = distinct tool names inside the run.
    """
    w_all = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = turns.select("conv_id", "turn_idx", "role", "tool").withColumn(
        "seq", F.row_number().over(w_all)
    )
    tool_turns = seq.where(F.col("role") == "tool").withColumn(
        "isl", F.col("seq") - F.row_number().over(w_all)
    )
    return (
        tool_turns.groupBy("conv_id", "isl")
        .agg(
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
            F.count(F.lit(1)).alias("run_len"),
            F.countDistinct("tool").alias("n_tools"),
        )
        .where(F.col("run_len") >= min_len)
        .select("conv_id", "first_turn", "last_turn", "run_len", "n_tools")
    )


def context_window_fit(turns: DataFrame, budget: int) -> DataFrame:
    """Context-assembly fit: the longest SUFFIX of each conversation's
    turns whose whitespace-token total fits ``budget``.

    This is the operation every agent runtime performs before each model
    call — keep the most recent turns that fit the context window, drop
    the oldest (the reference's chat template assembles history the same
    most-recent-first way, ``crates/server/src/conversation.rs``).  The
    suffix-from-the-end cumulative token sum is monotone non-decreasing
    going earlier, so "suffix sums <= budget" IS the maximal suffix —
    no iteration, one window pass.

    Plan shape: ONE window shuffle on conv_id (turn_idx DESC running
    sum) feeding a hash aggregate on the SAME key — Catalyst plans a
    single exchange.  All arithmetic is exact int64 token counts.

    Output per conversation: (conv_id, n_turns, tokens_total, n_kept,
    first_kept_idx, tokens_kept).  ``n_kept = 0`` (NULL first_kept_idx,
    tokens_kept 0) when even the final turn alone exceeds the budget.
    """
    tokens = F.when(F.trim(F.col("text")) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    ).cast("long")
    w_suffix = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = turns.select("conv_id", "turn_idx", tokens.alias("tokens"))
    kept = F.sum("tokens").over(w_suffix) <= F.lit(int(budget))
    flagged = sized.withColumn("kept", kept)
    return (
        flagged.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            # DOUBLE for the three SUM outputs: the oracle's bare
            # SUM(BIGINT) is a DuckDB HUGEINT -> pandas float64 (the
            # ann_sq8_topk CORRECTNESS_r05 failure class); values are
            # token counts << 2^53, so the doubles are exact.
            F.sum("tokens").cast("double").alias("tokens_total"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("double")
            .alias("n_kept"),
            F.min(F.when(F.col("kept"), F.col("turn_idx")))
            .cast("long")
            .alias("first_kept_idx"),
            F.coalesce(
                F.sum(F.when(F.col("kept"), F.col("tokens"))), F.lit(0)
            )
            .cast("double")
            .alias("tokens_kept"),
        )
    )


# --------------------------------------------------------------- oracles
#
# Both oracles take the turns relation as an inline SQL fragment (the
# caller reinterprets its base table into the transcript shape the same
# way on both engines).

def tool_stats_oracle_sql(turns_sql: str) -> str:
    return f"""
WITH turns AS ({turns_sql}),
gapped AS (
  SELECT conv_id, turn_idx, role, tool,
         epoch_ms(LEAD(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx))
           - epoch_ms(ts) AS gap_ms
  FROM turns
)
SELECT tool,
       COUNT(*) AS n_calls,
       COUNT(DISTINCT conv_id) AS n_convs,
       SUM(gap_ms) AS total_gap_ms,
       FLOOR(SUM(gap_ms) / COUNT(gap_ms) * 100 + 0.5) / 100 AS avg_gap_ms
FROM gapped
WHERE role = 'tool'
GROUP BY tool
ORDER BY tool
"""


def tool_runs_oracle_sql(turns_sql: str, min_len: int = 1) -> str:
    return f"""
WITH turns AS ({turns_sql}),
seqd AS (
  SELECT conv_id, turn_idx, role, tool,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS seq
  FROM turns
),
islands AS (
  SELECT conv_id, turn_idx, tool,
         seq - ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS isl
  FROM seqd WHERE role = 'tool'
)
SELECT conv_id,
       MIN(turn_idx) AS first_turn,
       MAX(turn_idx) AS last_turn,
       COUNT(*) AS run_len,
       COUNT(DISTINCT tool) AS n_tools
FROM islands
GROUP BY conv_id, isl
HAVING COUNT(*) >= {min_len}
"""

def context_fit_oracle_sql(turns_sql: str, budget: int) -> str:
    """DuckDB replica of :func:`context_window_fit` (internal CTEs are
    ``cf_``-prefixed so generated callers can't collide)."""
    return f"""
WITH cf_turns AS ({turns_sql}),
cf_sized AS (
  SELECT conv_id, turn_idx,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+'))
              END AS BIGINT) AS tokens
  FROM cf_turns
),
cf_flagged AS (
  SELECT conv_id, turn_idx, tokens,
         SUM(tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                           ROWS UNBOUNDED PRECEDING) <= {int(budget)}
           AS kept
  FROM cf_sized
)
SELECT conv_id,
       COUNT(*) AS n_turns,
       SUM(tokens) AS tokens_total,
       SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS n_kept,
       CAST(MIN(CASE WHEN kept THEN turn_idx END) AS BIGINT)
         AS first_kept_idx,
       COALESCE(SUM(CASE WHEN kept THEN tokens END), 0) AS tokens_kept
FROM cf_flagged
GROUP BY conv_id
"""
