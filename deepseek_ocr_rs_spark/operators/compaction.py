"""Conversation-level operators: chat compaction + template rendering.

P1/W1 (SURVEY §2.2/§2.5): the reference's ``collect_prompt_sections``
(crates/server/src/generation.rs:200-244) keeps only the *latest user turn*
plus the system turns that precede it — a pure window+filter in Spark.

F2/F3: conversation template rendering (crates/core/src/conversation/
mod.rs:53-142) — system prefix, ``role: content`` lines, alternating
separators (W2) — a groupBy-free aggregation via collect_list over a window,
or a JVM-side concat for the supported styles.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# template registry (conversation/mod.rs:163-240 analog): style parameters.
# `style` picks the renderer, mirroring the reference's SeparatorStyle
# (get_prompt dispatch, conversation/mod.rs:54-60).
TEMPLATES: Dict[str, Dict] = {
    "deepseek": {"style": "deepseek", "sep": "\n\n",
                 "sep2": "<｜end▁of▁sentence｜>",
                 "user": "User: ", "assistant": "Assistant: "},
    "plain": {"style": "deepseek", "sep": "\n", "sep2": "\n",
              "user": "", "assistant": ""},
    # render_deepseek_v2 (conversation/mod.rs:88-114): user turns open with
    # the sft marker + newline and close with sep; all other roles emit
    # bare content closed with sep2
    "deepseek_v2": {"style": "deepseek_v2", "sep": "\n\n",
                    "sep2": "<｜end▁of▁sentence｜>",
                    "marker": "<｜sft▁begin｜>\n"},
    # render_alignment (conversation/mod.rs:129-142): even ORIGINAL turn
    # positions emit the literal image slot, odd ones the content; the
    # registered template uses empty separators (mod.rs:238-252)
    "alignment": {"style": "alignment", "sep": "", "sep2": "",
                  "marker": "<image>\n"},
}


def flatten_parts(df: DataFrame, parts_col: str = "parts",
                  out_col: str = "text") -> DataFrame:
    """P3 content flatten: multi-part message -> one text, parts iterated in
    REVERSE order and joined with newlines, exactly ``flatten_content``
    (crates/server/src/generation.rs:246-268).  Pure JVM expressions."""
    flat = F.array_join(
        F.reverse(
            F.filter(F.col(parts_col), lambda p: F.trim(p) != F.lit(""))
        ),
        "\n",
    )
    return df.withColumn(out_col, flat)


def compact_latest_user(df: DataFrame) -> DataFrame:
    """Keep, per conversation: the latest user turn + system turns before it.

    Exactly generation.rs:200-244: rposition(role=='user') then retain
    preceding system messages.  Shuffles once on conv_id; both the window
    and the semi-join reuse that partitioning (no second exchange).
    """
    w = Window.partitionBy("conv_id")
    latest_user = F.max(
        F.when(F.lower("role") == "user", F.col("turn_idx"))
    ).over(w)
    return (
        df.withColumn("_latest_user_idx", latest_user)
        .where(
            F.col("_latest_user_idx").isNotNull()
            & (
                (F.col("turn_idx") == F.col("_latest_user_idx"))
                | (
                    (F.lower("role") == "system")
                    & (F.col("turn_idx") < F.col("_latest_user_idx"))
                )
            )
        )
        .drop("_latest_user_idx")
    )


DEFAULT_MAX_RENDER_TURNS = 100_000


def render_conversation(df: DataFrame, template: str = "plain",
                        max_turns: int = DEFAULT_MAX_RENDER_TURNS
                        ) -> DataFrame:
    """conv_id -> single rendered prompt string (F2/F3).

    Rendering is ORDER-CRITICAL: sort_array over collected (turn_idx, line)
    structs guarantees turn order independent of partitioning (W5).

    Bounded: only the FIRST ``max_turns`` turns of a conversation are
    rendered (explicit truncation semantics — a 10^6-turn conversation must
    not become a single collect_list row).  The cap rides the same
    conv_id window partitioning the aggregation shuffles on, so it adds no
    extra exchange; truncation is reported, never silent.

    Styles (conversation/mod.rs:54-142):
      deepseek/plain  ``role: content`` lines, alternating separators by
                      KEPT-line parity (W2)
      deepseek_v2     user turns open with the sft marker and close with
                      sep; other roles emit bare content closed with sep2
      alignment       even ORIGINAL turn positions emit the image-slot
                      literal, odd ones the content
    """
    t = TEMPLATES[template]
    style = t.get("style", "deepseek")

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_all = Window.partitionBy("conv_id")
    bounded = (
        df.withColumn("_pos", F.row_number().over(w) - 1)
        .withColumn("_n_total", F.count(F.lit(1)).over(w_all))
        .where(F.col("_pos") < max_turns)
    )

    content = F.coalesce(F.trim("text"), F.lit(""))
    if style == "deepseek_v2":
        piece = F.when(
            F.lower("role") == "user",
            F.concat(F.lit(t["marker"]), content, F.lit(t["sep"])),
        ).otherwise(F.concat(content, F.lit(t["sep2"])))
    elif style == "alignment":
        piece = F.when(
            F.col("_pos") % 2 == 0, F.concat(F.lit(t["marker"]),
                                             F.lit(t["sep"]))
        ).otherwise(F.concat(content, F.lit(t["sep2"])))
    else:
        piece = F.concat(
            F.when(F.lower("role") == "user", F.lit(t["user"]))
            .when(F.lower("role") == "assistant", F.lit(t["assistant"]))
            .otherwise(F.concat(F.initcap("role"), F.lit(": "))),
            content,
        )

    collected = (
        bounded.where(content != "")  # P4 filter (skip empty turns)
        .groupBy("conv_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_pos"), piece.alias("line")))
            ).alias("lines"),
            F.max("_n_total").alias("_n_total"),
        )
    )

    if style in ("deepseek_v2", "alignment"):
        # pieces carry their own separators: plain ordered concat
        rendered = F.array_join(
            F.transform(F.col("lines"), lambda x: x["line"]), ""
        )
    else:
        # alternating separator: even lines joined by sep, odd close w/ sep2
        rendered = F.aggregate(
            F.col("lines"),
            F.struct(F.lit("").alias("acc"), F.lit(0).alias("i")),
            lambda acc, x: F.struct(
                F.concat(
                    acc["acc"],
                    F.when(acc["i"] == 0, F.lit("")).otherwise(
                        F.when(acc["i"] % 2 == 1, F.lit(t["sep"])).otherwise(
                            F.lit(t["sep2"])
                        )
                    ),
                    x["line"],
                ).alias("acc"),
                (acc["i"] + 1).alias("i"),
            ),
            lambda acc: acc["acc"],
        )
    return collected.select(
        "conv_id",
        rendered.alias("rendered_prompt"),
        F.size("lines").alias("n_turns_rendered"),
        (F.col("_n_total") > max_turns).alias("truncated"),
    )
