"""Conversation-level dedup and preference mining over the
(conv_id, turn_idx, role, text, tool, ts) transcript shape — the
BASELINE.json input_hint table.

An agent-transcript corpus accumulates three kinds of redundancy a
document-level dedup tier (operators/dedup.py) cannot see, because the
unit of duplication is a TURN SEQUENCE, not a text blob:

  prefix_dedup       a conversation that is an exact turn-prefix of a
                     longer one (a resumed/continued session re-logged
                     from the start, or a client retry that replayed the
                     history and went further).  Training on both double
                     -counts every shared turn.  Detected by cumulative
                     chain signatures: conv A is removed when A's full
                     chain equals B's chain at length len(A).

  collapse_retries   consecutive turns with identical (role, text) in
                     one conversation (client retries / duplicate SSE
                     appends).  Keep the FIRST of each run, re-index the
                     survivors densely.

  preference_pairs   DPO/RLHF pair mining: two conversations whose
                     entire history EXCEPT the final turn is identical
                     but whose final responses differ are a natural
                     preference pair (the reference serves the same
                     multi-turn chat shape this pairing consumes,
                     crates/server/src/conversation.rs).

Chain signatures: turn_sig = md5(coalesce(role,'') || '|' ||
coalesce(text,'')); chain_n = md5(concat of the first n turn_sigs in
(turn_idx) order).  md5 is exact and identical in Spark and DuckDB, so
the oracles replicate every step verbatim (no recall proxies).
Collisions are 2^-64-grade and shared by both engines.  NULL role/text
is treated as '' (a bare concat_ws would SKIP the NULL, making
(role=NULL, text='user') collide with (role='user', text=NULL) across
the field separator).

Scale posture (100 TB, 10^12 turns):
  * every window partitions on conv_id — the SAME key the extraction
    pipeline ranges on, so under a shared partitioning the chain pass is
    exchange-free; nothing here shuffles more than once.
  * the cumulative chain concatenates 32-byte sigs, so a conversation of
    L turns hashes O(L^2/2 * 32) bytes across its rows (incremental
    window buffer, O(L) appends).  Agent transcripts are bounded (the
    context window bounds L at a few thousand); at L=1k that is ~16 MB
    of md5 input per conversation, linear in corpus size overall.  For
    unbounded L, chunk the chain every K turns and chain the chunk
    digests (same algebra, K-fold less re-hashing) — not needed at the
    input_hint's scale.
  * prefix_dedup joins on the 32-char chain digest — near-unique key,
    no skew; output is bounded by the number of duplicated convs.
  * preference_pairs caps candidates per prompt group at ``max_group``
    BEFORE the self-join, so a mega-group (many regenerations of one
    prompt) costs O(K^2), never O(n^2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "chain_signatures",
    "prefix_dedup",
    "collapse_retries",
    "preference_pairs",
    "branch_points",
    "prefix_dedup_oracle_sql",
    "collapse_retries_oracle_sql",
    "preference_pairs_oracle_sql",
    "branch_points_oracle_sql",
]

# Shared SQL fragment: per-turn cumulative chain signatures.  Kept in one
# place so the Spark builders and the DuckDB oracles cannot drift.
_CHAIN_CTE = """
cd_sig AS (
  SELECT conv_id, turn_idx, role, text,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn,
         COUNT(*) OVER (PARTITION BY conv_id) AS n_turns,
         md5(string_agg(
               md5(coalesce(role, '') || '|' || coalesce(text, '')), '')
             OVER (PARTITION BY conv_id ORDER BY turn_idx
                   ROWS UNBOUNDED PRECEDING)) AS chain
  FROM cd_turns
)
"""


def chain_signatures(turns: DataFrame) -> DataFrame:
    """Per-turn cumulative chain signature.

    Output: (conv_id, turn_idx, role, text, rn, n_turns, chain) where
    ``chain`` at row rn is md5 of the concatenated md5(role|text) of the
    first rn turns — the identity of the conversation PREFIX ending
    here.

    Implementation: ONE grouped Arrow stage (applyInPandas on conv_id
    — the same single conv-keyed shuffle a window would pay) running
    an INCREMENTAL hashlib chain: O(1) per turn via md5-state copy.
    The window formulation (running collect_list + array_join + md5
    per row) is semantically identical but O(L^2) per conversation —
    it re-materializes and re-hashes the whole prefix at every row,
    measured 14.6 s at sf0.1 vs ~1 s for this kernel.  SQL oracles
    keep the declarative definition; outputs are bit-identical.
    """
    import hashlib

    import pandas as pd

    fields = {f.name: f.dataType.simpleString() for f in turns.schema.fields}
    schema = (
        f"conv_id {fields['conv_id']}, turn_idx {fields['turn_idx']},"
        f" role {fields['role']}, text {fields['text']},"
        " rn long, n_turns long, chain string"
    )

    def run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("turn_idx", kind="mergesort").reset_index(
            drop=True
        )
        def s(v):
            # None AND the float-NaN pandas substitutes in all-null
            # object->float columns must both read as '' (the SQL
            # coalesce semantics)
            if v is None or (isinstance(v, float) and v != v):
                return ""
            return str(v)

        state = hashlib.md5()
        chains = []
        for role, text in zip(pdf["role"], pdf["text"]):
            sig = hashlib.md5(
                (s(role) + "|" + s(text)).encode("utf-8")
            ).hexdigest()
            state.update(sig.encode("ascii"))
            chains.append(state.copy().hexdigest())
        n = len(pdf)
        return pd.DataFrame(
            {
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"],
                "role": pdf["role"],
                "text": pdf["text"],
                "rn": pd.Series(range(1, n + 1), dtype="int64"),
                "n_turns": pd.Series([n] * n, dtype="int64"),
                "chain": chains,
            }
        )

    # auto-persist (the minhash-signature discipline): every consumer
    # branches the signature table at least twice (prefix vs full rows,
    # node vs child rows), and without the cache Spark re-runs the
    # grouped Python stage once per branch
    return (
        turns.select("conv_id", "turn_idx", "role", "text")
        .groupBy("conv_id")
        .applyInPandas(run, schema=schema)
        .persist()
    )


def prefix_dedup(turns: DataFrame) -> DataFrame:
    """Conversations that are exact turn-prefixes of another conversation.

    Conv A is a duplicate when some conv B (A != B) satisfies
    chain_B(len(A)) == chain_A(len(A)) and either B is strictly longer,
    or B has the same length (identical convs) and a smaller conv_id
    (keep-smallest tie-break).  Output one row per REMOVED conversation:
    (conv_id, n_turns, kept_by) with kept_by the smallest qualifying
    superset id — deterministic under ties.

    Plan: one conv_id window pass -> equi-join on the 32-char digest ->
    min() aggregate.  Never all-pairs; the join key is near-unique.
    """
    sigs = chain_signatures(turns)
    fulls = sigs.where(F.col("rn") == F.col("n_turns")).select(
        F.col("conv_id").alias("dup_id"),
        F.col("n_turns").alias("dup_turns"),
        F.col("chain").alias("full_sig"),
    )
    prefixes = sigs.select(
        F.col("conv_id").alias("sup_id"),
        F.col("rn").alias("sup_rn"),
        F.col("n_turns").alias("sup_turns"),
        F.col("chain").alias("sup_chain"),
    )
    matched = fulls.join(
        prefixes,
        (F.col("full_sig") == F.col("sup_chain"))
        & (F.col("dup_turns") == F.col("sup_rn"))
        & (F.col("dup_id") != F.col("sup_id"))
        & (
            (F.col("sup_turns") > F.col("dup_turns"))
            | (
                (F.col("sup_turns") == F.col("dup_turns"))
                & (F.col("sup_id") < F.col("dup_id"))
            )
        ),
        "inner",
    )
    return (
        matched.groupBy("dup_id")
        .agg(
            F.min("dup_turns").alias("n_turns"),  # constant per dup_id
            F.min("sup_id").alias("kept_by"),
        )
        .select(F.col("dup_id").alias("conv_id"), "n_turns", "kept_by")
    )


def collapse_retries(turns: DataFrame) -> DataFrame:
    """Drop consecutive duplicate (role, text) turns, keep the first.

    A turn survives when it is the first of its conversation or differs
    from the immediately preceding turn in role OR text.  The comparison
    is NULL-SAFE (<=> / IS DISTINCT FROM): a NULL field equals only a
    NULL field, so a real turn following a NULL-text turn of the same
    role is kept, and first-row detection is row_number = 1 rather than
    a NULL lag probe (which would misfire when role itself is NULL).
    Survivors are re-indexed densely (new_turn_idx, 0-based) so
    downstream renderers see a gap-free conversation.  Two windows over
    the SAME (conv_id, turn_idx) ordering -> ONE exchange.

    Output: (conv_id, turn_idx, new_turn_idx, role, text).
    """
    w_ord = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_role = F.lag("role").over(w_ord)
    prev_text = F.lag("text").over(w_ord)
    kept = (
        turns.select("conv_id", "turn_idx", "role", "text")
        .withColumn(
            "_keep",
            (F.row_number().over(w_ord) == 1)
            | ~(
                F.col("role").eqNullSafe(prev_role)
                & F.col("text").eqNullSafe(prev_text)
            ),
        )
        .where(F.col("_keep"))
        .drop("_keep")
    )
    return kept.select(
        "conv_id",
        "turn_idx",
        (F.row_number().over(w_ord) - 1).alias("new_turn_idx"),
        "role",
        "text",
    )


def preference_pairs(turns: DataFrame, max_group: int = 8) -> DataFrame:
    """Preference-pair mining over shared-prompt conversations.

    Two conversations form a (chosen, rejected) pair when their chains
    agree on EVERYTHING except the final turn (same prompt history) and
    the final texts differ.  Chosen = the longer final text; ties break
    to the smaller conv_id.  Single-turn conversations (empty prompt)
    are excluded — an empty shared prefix would pair unrelated convs.

    Skew guard: within each prompt group, candidates are ranked by
    (final length DESC, conv_id ASC) and only the first ``max_group``
    enter the self-join, so a prompt regenerated n times costs
    O(max_group^2), not O(n^2).

    Output: (prompt_sig, chosen_conv, rejected_conv, chosen_len,
    rejected_len), one row per unordered candidate pair.
    """
    sigs = chain_signatures(turns)
    finals = (
        sigs.where(F.col("n_turns") >= 2)
        .groupBy("conv_id")
        .agg(
            # the boolean marks exactly one row; max_by needs an integer
            # ordering key for DuckDB parity (no max_by(V, BOOLEAN) there)
            F.max_by(
                F.col("chain"),
                (F.col("rn") == F.col("n_turns") - 1).cast("int"),
            ).alias("prompt_sig"),
            F.max_by(
                F.col("text"),
                (F.col("rn") == F.col("n_turns")).cast("int"),
            ).alias("final_text"),
        )
        .select(
            "conv_id",
            "prompt_sig",
            F.length("final_text").cast("long").alias("final_len"),
            F.col("final_text"),
        )
    )
    w_grp = Window.partitionBy("prompt_sig").orderBy(
        F.col("final_len").desc(), F.col("conv_id").asc()
    )
    capped = finals.withColumn("grp_rank", F.row_number().over(w_grp)).where(
        F.col("grp_rank") <= int(max_group)
    )
    a = capped.select(
        F.col("prompt_sig"),
        F.col("conv_id").alias("conv_a"),
        F.col("final_text").alias("text_a"),
        F.col("final_len").alias("len_a"),
    )
    b = capped.select(
        F.col("prompt_sig").alias("prompt_sig_b"),
        F.col("conv_id").alias("conv_b"),
        F.col("final_text").alias("text_b"),
        F.col("final_len").alias("len_b"),
    )
    pairs = a.join(
        b,
        (F.col("prompt_sig") == F.col("prompt_sig_b"))
        & (F.col("conv_a") < F.col("conv_b"))
        & (F.col("text_a") != F.col("text_b")),
        "inner",
    )
    a_wins = (F.col("len_a") > F.col("len_b")) | (
        F.col("len_a") == F.col("len_b")
    )  # tie -> smaller conv_id, which is conv_a by the join ordering
    return pairs.select(
        "prompt_sig",
        F.when(a_wins, F.col("conv_a")).otherwise(F.col("conv_b")).alias(
            "chosen_conv"
        ),
        F.when(a_wins, F.col("conv_b")).otherwise(F.col("conv_a")).alias(
            "rejected_conv"
        ),
        F.when(a_wins, F.col("len_a")).otherwise(F.col("len_b")).alias(
            "chosen_len"
        ),
        F.when(a_wins, F.col("len_b")).otherwise(F.col("len_a")).alias(
            "rejected_len"
        ),
    )


def branch_points(turns: DataFrame) -> DataFrame:
    """Divergence points of the corpus's conversation TRIE.

    Every conversation walks the prefix trie whose nodes are (depth,
    chain-signature); a node is a BRANCH POINT when the conversations
    passing through it continue with >= 2 distinct next turns — the
    retry / regeneration / A-B-response points of an agent-transcript
    corpus (and, at shallow depths, shared conversation openings).

    Output per branch node: (depth, prefix_sig, n_convs passing
    through, n_children distinct continuations, n_terminal convs ending
    exactly here).  The child link is lead(chain) over the SAME
    (conv_id, rn) ordering the chain pass already established — no
    second exchange; the rollup groups on the node key itself.
    """
    sigs = chain_signatures(turns)
    w_ord = Window.partitionBy("conv_id").orderBy("rn")
    nodes = sigs.select(
        "conv_id",
        "rn",
        "chain",
        F.lead("chain").over(w_ord).alias("child_chain"),
    )
    return (
        nodes.groupBy(
            F.col("rn").alias("depth"), F.col("chain").alias("prefix_sig")
        )
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.countDistinct("child_chain").alias("n_children"),
            F.sum(
                F.when(F.col("child_chain").isNull(), 1).otherwise(0)
            ).alias("n_terminal"),
        )
        .where(F.col("n_children") >= 2)
    )


# --------------------------------------------------------------- oracles


def prefix_dedup_oracle_sql(turns_sql: str) -> str:
    return f"""
WITH cd_turns AS ({turns_sql}),
{_CHAIN_CTE},
cd_fulls AS (
  SELECT conv_id AS dup_id, n_turns AS dup_turns, chain AS full_sig
  FROM cd_sig WHERE rn = n_turns
)
SELECT f.dup_id AS conv_id,
       MIN(f.dup_turns) AS n_turns,
       MIN(s.conv_id) AS kept_by
FROM cd_fulls f
JOIN cd_sig s
  ON f.full_sig = s.chain AND f.dup_turns = s.rn
 AND f.dup_id <> s.conv_id
 AND (s.n_turns > f.dup_turns
      OR (s.n_turns = f.dup_turns AND s.conv_id < f.dup_id))
GROUP BY f.dup_id
"""


def collapse_retries_oracle_sql(turns_sql: str) -> str:
    return f"""
WITH cd_turns AS ({turns_sql}),
cd_lagged AS (
  SELECT conv_id, turn_idx, role, text,
         ROW_NUMBER() OVER w AS rn,
         LAG(role) OVER w AS prev_role,
         LAG(text) OVER w AS prev_text
  FROM cd_turns
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
cd_kept AS (
  SELECT conv_id, turn_idx, role, text FROM cd_lagged
  WHERE rn = 1
     OR role IS DISTINCT FROM prev_role
     OR text IS DISTINCT FROM prev_text
)
SELECT conv_id, turn_idx,
       ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1
         AS new_turn_idx,
       role, text
FROM cd_kept
"""


def branch_points_oracle_sql(turns_sql: str) -> str:
    return f"""
WITH cd_turns AS ({turns_sql}),
{_CHAIN_CTE},
cd_nodes AS (
  SELECT conv_id, rn, chain,
         LEAD(chain) OVER (PARTITION BY conv_id ORDER BY rn)
           AS child_chain
  FROM cd_sig
)
SELECT rn AS depth, chain AS prefix_sig,
       COUNT(*) AS n_convs,
       COUNT(DISTINCT child_chain) AS n_children,
       CAST(SUM(CASE WHEN child_chain IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_terminal
FROM cd_nodes
GROUP BY rn, chain
HAVING COUNT(DISTINCT child_chain) >= 2
"""


def preference_pairs_oracle_sql(turns_sql: str, max_group: int = 8) -> str:
    return f"""
WITH cd_turns AS ({turns_sql}),
{_CHAIN_CTE},
cd_finals AS (
  SELECT conv_id,
         max_by(chain, CAST(rn = n_turns - 1 AS INT)) AS prompt_sig,
         max_by(text, CAST(rn = n_turns AS INT)) AS final_text,
         CAST(length(max_by(text, CAST(rn = n_turns AS INT))) AS BIGINT)
           AS final_len
  FROM cd_sig WHERE n_turns >= 2
  GROUP BY conv_id
),
cd_capped AS (
  SELECT * FROM (
    SELECT conv_id, prompt_sig, final_text, final_len,
           ROW_NUMBER() OVER (PARTITION BY prompt_sig
                              ORDER BY final_len DESC, conv_id ASC)
             AS grp_rank
    FROM cd_finals
  ) WHERE grp_rank <= {int(max_group)}
)
SELECT a.prompt_sig,
       CASE WHEN a.final_len >= b.final_len THEN a.conv_id
            ELSE b.conv_id END AS chosen_conv,
       CASE WHEN a.final_len >= b.final_len THEN b.conv_id
            ELSE a.conv_id END AS rejected_conv,
       CASE WHEN a.final_len >= b.final_len THEN a.final_len
            ELSE b.final_len END AS chosen_len,
       CASE WHEN a.final_len >= b.final_len THEN b.final_len
            ELSE a.final_len END AS rejected_len
FROM cd_capped a
JOIN cd_capped b
  ON a.prompt_sig = b.prompt_sig
 AND a.conv_id < b.conv_id
 AND a.final_text <> b.final_text
"""
