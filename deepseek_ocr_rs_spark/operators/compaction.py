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

# Template registry (conversation/mod.rs:168-188 analog).  `style` picks
# the renderer, mirroring the reference's SeparatorStyle (get_prompt
# dispatch, mod.rs:54-60).  The four BUILT-IN entries replicate the
# reference registry (mod.rs:170-176 + the template fns at mod.rs:195-252)
# with their exact separators and system templates; note the reference's
# registered "deepseekv2" template renders with the DEEPSEEK style
# (deepseek_v2_template() sets SeparatorStyle::DeepSeek, mod.rs:214) — the
# V2 RENDERER is only reachable via a custom-registered template, which the
# repo-extra "deepseek_v2" entry below provides (registered through the
# same registry mechanism a user of register_template would use).
EOS = "<｜end▁of▁sentence｜>"
TEMPLATES: Dict[str, Dict] = {
    # deepseek_template(), mod.rs:195-205
    "deepseek": {"style": "deepseek", "system_template": "{system_message}",
                 "sep": "\n\n", "sep2": EOS},
    # deepseek_v2_template(), mod.rs:207-221 (DeepSeek style, empty sep)
    "deepseekv2": {"style": "deepseek", "system_template": "{system_message}",
                   "sep": "", "sep2": EOS},
    # plain_template(), mod.rs:223-237: bare content + seps[idx % 2],
    # both separators empty
    "plain": {"style": "plain", "system_template": "",
              "sep": "", "sep2": ""},
    # alignment_template(), mod.rs:239-252: even ORIGINAL positions emit
    # the image-slot literal, odd ones the content; empty separators
    "alignment": {"style": "alignment", "system_template": "",
                  "sep": "", "sep2": "", "marker": "<image>\n"},
    # repo extra: exercises render_deepseek_v2 (mod.rs:90-115) — user turns
    # open with the sft marker + newline and close with sep; all other
    # roles emit bare content closed with sep2
    "deepseek_v2": {"style": "deepseek_v2",
                    "system_template": "{system_message}",
                    "sep": "\n\n", "sep2": EOS,
                    "marker": "<｜sft▁begin｜>\n"},
}


def register_template(name: str, params: Dict,
                      override_existing: bool = False) -> None:
    """register_conv_template (conversation/mod.rs:178-186): install a
    template by name; refuses to clobber an existing one unless
    ``override_existing`` (the reference panics, we raise)."""
    if not override_existing and name in TEMPLATES:
        raise ValueError(f"{name} has been registered")
    TEMPLATES[name] = dict(params)


def get_template(name: str) -> Dict:
    """get_conv_template (mod.rs:188-193): a COPY of the registered params
    (the reference clones), so callers can mutate without side effects."""
    if name not in TEMPLATES:
        raise KeyError(f"unknown conversation template {name}")
    return dict(TEMPLATES[name])


def _role_display(role: str) -> str:
    """Map the transcript role column to the display name the reference
    passes to append_message ('User'/'Assistant', inference.rs:218-220)."""
    low = (role or "").lower()
    if low == "user":
        return "User"
    if low == "assistant":
        return "Assistant"
    return low[:1].upper() + low[1:]


def render_prompt(template: str, system_prompt: str, raw_prompt: str) -> str:
    """Pure-function replica of inference.rs:212-225 ``render_prompt``:
    set the system message, append ('User', raw_prompt) and the
    ('Assistant', None) generation trailer, then get_prompt().  Used by
    tests as the hand-checkable reference model; the DataFrame path is
    ``render_conversation(..., add_generation_prompt=True)``."""
    return render_messages(template, system_prompt,
                           [("User", raw_prompt), ("Assistant", None)])


def render_messages(template: str, system_message: str, messages) -> str:
    """Pure-Python ConversationTemplate.get_prompt (mod.rs:53-144): the
    exact reference rendering over (role, message-or-None) pairs.  This is
    the single-row semantic model the distributed renderer and every SQL
    oracle must agree with."""
    t = get_template(template)
    style = t.get("style", "deepseek")
    seps = [t.get("sep", ""), t.get("sep2", "")]
    buf = []
    if style in ("deepseek", "deepseek_v2"):
        sys_prompt = t.get("system_template", "").replace(
            "{system_message}", system_message)
        if sys_prompt:
            buf.append(sys_prompt)
            buf.append(seps[0])
    for idx, (role, message) in enumerate(messages):
        content = (message or "").strip()
        if style == "deepseek":
            if content:
                buf.append(f"{role}: {content}{seps[idx % 2]}")
            else:
                # mod.rs:80-85: bare `role:` — no space, no separator;
                # this is how the trailing generation prompt is produced
                buf.append(f"{role}:")
        elif content:
            if style == "deepseek_v2":
                if role == "User":
                    buf.append(f"{t['marker']}{content}{seps[0]}")
                else:
                    buf.append(f"{content}{seps[1]}")
            elif style == "alignment":
                piece = t["marker"] if idx % 2 == 0 else content
                buf.append(f"{piece}{seps[idx % 2]}")
            else:  # plain
                buf.append(f"{content}{seps[idx % 2]}")
    return "".join(buf)


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
                        max_turns: int = DEFAULT_MAX_RENDER_TURNS,
                        system_message: str = "",
                        add_generation_prompt: bool = False) -> DataFrame:
    """conv_id -> single rendered prompt string (F2/F3), REFERENCE-EXACT:
    each turn's separator comes from its ORIGINAL message index parity
    (``seps[idx % 2]``, mod.rs:79/121/136 — empty turns consume an index
    even when they render nothing), each rendered message carries its own
    TRAILING separator (the reference appends, never joins), and the
    deepseek style renders empty/None turns as a bare ``Role:`` line
    (mod.rs:80-85) instead of dropping them.

    Rendering is ORDER-CRITICAL: sort_array over collected (turn_idx, line)
    structs guarantees turn order independent of partitioning (W5).

    Bounded: only the FIRST ``max_turns`` turns of a conversation are
    rendered (explicit truncation semantics — a 10^6-turn conversation must
    not become a single collect_list row).  The cap rides the same
    conv_id window partitioning the aggregation shuffles on, so it adds no
    extra exchange; truncation is reported, never silent.

    ``system_message``: substituted into the template's system_template
    (mod.rs:64-71); a non-empty result prefixes the prompt followed by
    seps[0].  Applies to the deepseek / deepseek_v2 renderers only — the
    plain/alignment renderers have no system branch in the reference.

    ``add_generation_prompt``: appends the ('Assistant', None) trailer the
    reference's render_prompt adds (inference.rs:212-225) — under the
    deepseek style that renders as the bare generation prompt
    ``Assistant:``; the other renderers skip None messages, so it is a
    no-op for them (exactly as in the reference).

    Styles (conversation/mod.rs:54-144):
      deepseek     ``Role: content`` + seps[idx % 2]; empty turn -> ``Role:``
      deepseek_v2  user turns open with the sft marker and close with
                   sep; other roles emit bare content closed with sep2
      plain        bare content + seps[idx % 2]; empty turns skipped
      alignment    even ORIGINAL positions emit the image-slot literal,
                   odd ones the content, each + seps[idx % 2]

    Per-turn semantics are pinned 1:1 against the pure
    ``render_messages`` model (and hence mod.rs) by pytest.
    """
    t = get_template(template)
    style = t.get("style", "deepseek")

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_all = Window.partitionBy("conv_id")
    bounded = (
        df.withColumn("_pos", F.row_number().over(w) - 1)
        .withColumn("_n_total", F.count(F.lit(1)).over(w_all))
        .where(F.col("_pos") < max_turns)
    )

    content = F.coalesce(F.trim("text"), F.lit(""))
    # seps[idx % 2] on the ORIGINAL index — computed before any empty-turn
    # filtering so empties still consume a position
    pos_sep = F.when(F.col("_pos") % 2 == 0, F.lit(t["sep"])).otherwise(
        F.lit(t["sep2"])
    )
    role_name = (
        F.when(F.lower("role") == "user", F.lit("User"))
        .when(F.lower("role") == "assistant", F.lit("Assistant"))
        .otherwise(F.initcap("role"))
    )
    keep_empty = style == "deepseek"
    if style == "deepseek":
        piece = F.when(
            content == "", F.concat(role_name, F.lit(":"))
        ).otherwise(F.concat(role_name, F.lit(": "), content, pos_sep))
    elif style == "deepseek_v2":
        piece = F.when(
            F.lower("role") == "user",
            F.concat(F.lit(t["marker"]), content, F.lit(t["sep"])),
        ).otherwise(F.concat(content, F.lit(t["sep2"])))
    elif style == "alignment":
        piece = F.when(
            F.col("_pos") % 2 == 0, F.concat(F.lit(t["marker"]), pos_sep)
        ).otherwise(F.concat(content, pos_sep))
    else:  # plain
        piece = F.concat(content, pos_sep)

    kept = bounded if keep_empty else bounded.where(content != "")  # P4
    collected = kept.groupBy("conv_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_pos"), piece.alias("line")))
        ).alias("lines"),
        F.max("_n_total").alias("_n_total"),
    )

    # every piece carries its own trailing separator: plain ordered concat
    rendered = F.array_join(
        F.transform(F.col("lines"), lambda x: x["line"]), ""
    )
    if style in ("deepseek", "deepseek_v2"):
        sys_prompt = t.get("system_template", "").replace(
            "{system_message}", system_message
        )
        if sys_prompt:
            rendered = F.concat(F.lit(sys_prompt + t["sep"]), rendered)
    if add_generation_prompt and style == "deepseek":
        rendered = F.concat(rendered, F.lit("Assistant:"))
    return collected.select(
        "conv_id",
        rendered.alias("rendered_prompt"),
        F.size("lines").alias("n_turns_rendered"),
        (F.col("_n_total") > max_turns).alias("truncated"),
    )
