"""SFT loss-mask span computation over rendered conversations.

Supervised fine-tuning on chat transcripts trains only on assistant
tokens: the collator renders the conversation with the chat template and
masks the loss everywhere except each assistant reply (content + its
trailing EOS separator, so the model learns to stop).  The reference
renders prompts with its deepseek template (conversation/mod.rs:63-88)
but leaves masking to the training stack; at 10^12-turn scale the mask
has to be computed inside the same distributed plan that renders, or the
training job re-tokenizes everything twice.

``loss_mask_spans`` emits one row per turn with the turn's char interval
``[piece_start, piece_end)`` inside the rendered prompt (exactly the
string ``render_conversation(df, template, ...)`` produces for the same
conv) and, for loss-bearing turns, the masked sub-interval
``[mask_start, mask_end)`` = content + trailing separator, excluding the
``"Assistant: "`` role prefix.  Offsets are cumulative sums of piece
lengths over the (conv_id, turn_idx) window — ONE shuffle on conv_id,
the same exchange the renderer uses, everything JVM-side.

The per-turn piece construction replicates the deepseek renderer
(operators/compaction.py ``render_conversation``); the two are pinned
together by tests/test_sft.py's slicing invariant: for every turn,
``rendered_prompt[piece_start:piece_end] == piece``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.compaction import (
    DEFAULT_MAX_RENDER_TURNS,
    get_template,
)


def loss_mask_spans(
    df: DataFrame,
    template: str = "deepseek",
    system_message: str = "",
    max_turns: int = DEFAULT_MAX_RENDER_TURNS,
) -> DataFrame:
    """Per-turn char spans + loss mask for the deepseek-style rendering.

    Input: turns ``(conv_id, turn_idx, role, text, ...)``.  Output one
    row per rendered turn: ``(conv_id, turn_idx, role, piece_start int,
    piece_end int, mask_start int, mask_end int, loss boolean)`` where
    the mask interval is NULL/false for non-assistant and empty turns.
    Only ``style == "deepseek"`` templates have role-prefixed lines to
    mask; other styles raise.
    """
    t = get_template(template)
    if t.get("style") != "deepseek":
        raise ValueError(
            f"loss_mask_spans needs a deepseek-style template, got "
            f"{t.get('style')!r}"
        )
    sys_prompt = t.get("system_template", "").replace(
        "{system_message}", system_message
    )
    prefix_len = len(sys_prompt + t["sep"]) if sys_prompt else 0

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bounded = df.withColumn("_pos", F.row_number().over(w) - 1).where(
        F.col("_pos") < max_turns
    )

    content = F.coalesce(F.trim("text"), F.lit(""))
    pos_sep = F.when(F.col("_pos") % 2 == 0, F.lit(t["sep"])).otherwise(
        F.lit(t["sep2"])
    )
    role_name = (
        F.when(F.lower("role") == "user", F.lit("User"))
        .when(F.lower("role") == "assistant", F.lit("Assistant"))
        .otherwise(F.initcap("role"))
    )
    # deepseek piece, exactly render_conversation's: bare `Role:` for
    # empty turns (no space, no separator), else `Role: content` + sep
    piece = F.when(
        content == "", F.concat(role_name, F.lit(":"))
    ).otherwise(F.concat(role_name, F.lit(": "), content, pos_sep))

    wp = Window.partitionBy("conv_id").orderBy("_pos")
    staged = bounded.select(
        "conv_id",
        "turn_idx",
        "role",
        F.length(piece).alias("_plen"),
        # role prefix `Role: ` — masking starts after it
        (F.length(role_name) + 2).alias("_hdr"),
        ((F.lower("role") == "assistant") & (content != "")).alias("loss"),
        F.col("_pos"),
    )
    start = (
        F.lit(prefix_len)
        + F.coalesce(
            F.sum("_plen").over(
                wp.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
    ).cast("int")
    out = staged.select(
        "conv_id",
        "turn_idx",
        "role",
        start.alias("piece_start"),
        (start + F.col("_plen")).cast("int").alias("piece_end"),
        F.when(F.col("loss"), start + F.col("_hdr"))
        .cast("int")
        .alias("mask_start"),
        F.when(F.col("loss"), start + F.col("_plen"))
        .cast("int")
        .alias("mask_end"),
        "loss",
    )
    return out


def loss_mask_oracle_sql(
    turns_sql: str,
    system_message: str = "",
    sep: str = "\n\n",
    eos: str = "<｜end▁of▁sentence｜>",
) -> str:
    """DuckDB SQL replicating ``loss_mask_spans`` over a turns relation
    ``turns_sql`` with columns (conv_id, turn_idx, role, text).  The
    separator pair defaults to the built-in deepseek template's."""
    prefix_len = len(system_message + sep) if system_message else 0
    return f"""
        WITH turns AS ({turns_sql}),
        staged AS (
          SELECT conv_id, turn_idx, role,
                 row_number() OVER (PARTITION BY conv_id
                                    ORDER BY turn_idx) - 1 AS pos,
                 CASE WHEN lower(role) = 'user' THEN 'User'
                      WHEN lower(role) = 'assistant' THEN 'Assistant'
                      ELSE upper(role[1]) || role[2:] END AS role_name,
                 COALESCE(trim(text), '') AS content
          FROM turns
        ),
        pieces AS (
          SELECT conv_id, turn_idx, role, pos, role_name, content,
                 length(CASE WHEN content = '' THEN role_name || ':'
                             ELSE role_name || ': ' || content ||
                                  CASE WHEN pos % 2 = 0 THEN '{sep}'
                                       ELSE '{eos}' END END) AS plen,
                 length(role_name) + 2 AS hdr,
                 (lower(role) = 'assistant' AND content <> '') AS loss
          FROM staged
        ),
        offs AS (
          SELECT *, {prefix_len} + COALESCE(sum(plen) OVER (
                   PARTITION BY conv_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS pstart
          FROM pieces
        )
        SELECT conv_id, turn_idx, role,
               CAST(pstart AS INT) AS piece_start,
               CAST(pstart + plen AS INT) AS piece_end,
               CAST(CASE WHEN loss THEN pstart + hdr END AS INT)
                 AS mask_start,
               CAST(CASE WHEN loss THEN pstart + plen END AS INT)
                 AS mask_end,
               loss
        FROM offs
    """
