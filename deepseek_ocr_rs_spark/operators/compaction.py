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

# template registry (conversation/mod.rs:163-188 analog): style parameters
TEMPLATES: Dict[str, Dict] = {
    "deepseek": {"sep": "\n\n", "sep2": "<｜end▁of▁sentence｜>",
                 "user": "User: ", "assistant": "Assistant: "},
    "plain": {"sep": "\n", "sep2": "\n", "user": "", "assistant": ""},
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


def render_conversation(df: DataFrame, template: str = "plain") -> DataFrame:
    """conv_id -> single rendered prompt string (F2/F3).

    Rendering is ORDER-CRITICAL: sort_array over collected (turn_idx, line)
    structs guarantees turn order independent of partitioning (W5).
    Alternating separators (W2) are applied by line position parity.
    """
    t = TEMPLATES[template]
    line = F.concat(
        F.when(F.lower("role") == "user", F.lit(t["user"]))
        .when(F.lower("role") == "assistant", F.lit(t["assistant"]))
        .otherwise(F.concat(F.initcap("role"), F.lit(": "))),
        F.coalesce(F.trim("text"), F.lit("")),
    )
    collected = (
        df.where(F.coalesce(F.trim("text"), F.lit("")) != "")  # P4 filter
        .groupBy("conv_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("turn_idx"), line.alias("line")))
            ).alias("lines")
        )
    )
    # alternating separator: even lines joined by sep, odd close with sep2
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
    return collected.select("conv_id", rendered.alias("rendered_prompt"))
