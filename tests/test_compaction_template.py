"""Conversation-level operators: compaction (P1/W1) + template render (F2/W2)."""

from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.compaction import (
    compact_latest_user,
    render_conversation,
)
from deepseek_ocr_rs_spark.schemas import TRANSCRIPTS_SCHEMA


def _turns(spark, rows):
    full = [
        {"conv_id": c, "turn_idx": i, "role": r, "text": t, "tool": None,
         "ts": None}
        for (c, i, r, t) in rows
    ]
    return spark.createDataFrame(full, TRANSCRIPTS_SCHEMA)


def test_compact_latest_user(spark):
    df = _turns(spark, [
        ("c1", 0, "system", "sys prompt"),
        ("c1", 1, "user", "first q"),
        ("c1", 2, "assistant", "a1"),
        ("c1", 3, "system", "late sys"),
        ("c1", 4, "USER", "second q"),   # case-insensitive role match
        ("c1", 5, "assistant", "a2"),
        ("c2", 0, "assistant", "no user turn at all"),
    ])
    got = sorted((r["conv_id"], r["turn_idx"])
                 for r in compact_latest_user(df).collect())
    # latest user turn (4) + system turns before it (0, 3); c2 dropped
    assert got == [("c1", 0), ("c1", 3), ("c1", 4)]


def test_render_conversation_plain_and_order(spark):
    df = _turns(spark, [
        ("c1", 2, "assistant", "A"),
        ("c1", 0, "system", "S"),
        ("c1", 1, "user", "U"),
        ("c1", 3, "tool", "  "),   # empty after trim -> P4 filter drops it
    ])
    out = {r["conv_id"]: r["rendered_prompt"]
           for r in render_conversation(df, "plain").collect()}
    # render_plain (mod.rs:117-128) with the registered plain template
    # (mod.rs:223-237): bare content + seps[idx % 2], both separators empty
    assert out["c1"] == "SUA"


def test_render_conversation_deepseek_v2(spark):
    df = _turns(spark, [
        ("c1", 0, "user", "q1"),
        ("c1", 1, "assistant", "a1"),
        ("c1", 2, "user", "  "),      # empty -> skipped entirely
        ("c1", 3, "assistant", "a2"),
    ])
    out = render_conversation(df, "deepseek_v2").collect()[0]
    # mod.rs:88-114: user -> marker + content + sep; else content + sep2
    assert out["rendered_prompt"] == (
        "<｜sft▁begin｜>\nq1\n\n"
        "a1<｜end▁of▁sentence｜>"
        "a2<｜end▁of▁sentence｜>"
    )
    assert out["n_turns_rendered"] == 3 and not out["truncated"]


def test_render_conversation_alignment(spark):
    df = _turns(spark, [
        ("c1", 0, "user", "ignored even content"),   # pos 0 -> <image>
        ("c1", 1, "assistant", "a1"),                # pos 1 -> content
        ("c1", 2, "user", " "),                      # pos 2, empty: skipped
        ("c1", 3, "assistant", "a2"),                # pos 3 -> content
        ("c1", 4, "user", "also image"),             # pos 4 -> <image>
    ])
    out = render_conversation(df, "alignment").collect()[0]
    # mod.rs:129-142 with empty separators: even ORIGINAL positions emit
    # the image-slot literal; the empty pos-2 turn is skipped but still
    # consumes a position
    assert out["rendered_prompt"] == "<image>\na1a2<image>\n"


def test_render_conversation_bounded(spark):
    rows = [("big", i, "user" if i % 2 == 0 else "assistant", f"t{i}")
            for i in range(1000)]
    df = _turns(spark, rows)
    out = render_conversation(df, "plain", max_turns=100).collect()[0]
    assert out["truncated"] and out["n_turns_rendered"] == 100
    assert out["rendered_prompt"].endswith("t99")
    full = render_conversation(df, "plain").collect()[0]
    assert not full["truncated"] and full["n_turns_rendered"] == 1000


def test_render_conversation_partitioning_invariant(spark):
    rows = [("cx", i, "user" if i % 2 == 0 else "assistant", f"t{i}")
            for i in range(20)]
    df = _turns(spark, rows)
    a = render_conversation(df.repartition(1), "deepseek").collect()[0][1]
    b = render_conversation(df.repartition(13), "deepseek").collect()[0][1]
    assert a == b
    assert a.startswith("User: t0")


# ---------------------------------------------------- reference parity

def test_render_prompt_matches_reference():
    """render_prompt must reproduce inference.rs:212-225 exactly: system
    prefix + seps[0], 'User: <prompt>' + seps[0], then the ('Assistant',
    None) trailer rendered as the bare generation prompt (mod.rs:80-85)."""
    from deepseek_ocr_rs_spark.operators.compaction import render_prompt

    got = render_prompt("deepseek", "You are an OCR engine.",
                        "Read this page.")
    assert got == ("You are an OCR engine.\n\n"
                   "User: Read this page.\n\n"
                   "Assistant:")
    # empty system message -> system_template renders empty -> no prefix
    assert render_prompt("deepseek", "", "hi") == "User: hi\n\nAssistant:"
    # registered deepseekv2 (mod.rs:207-221): DeepSeek STYLE, sep=""
    assert render_prompt("deepseekv2", "", "hi") == "User: hiAssistant:"


def test_render_messages_empty_turn_parity():
    """Hand-computed mod.rs:72-87 outputs: empty turns emit a bare `Role:`
    (no space, no separator) but still consume an enumerate index, so the
    NEXT turn's separator parity follows the ORIGINAL index — the exact
    case where kept-line parity (the old repo semantics) diverges."""
    from deepseek_ocr_rs_spark.operators.compaction import render_messages

    got = render_messages("deepseek", "", [
        ("User", "a"),        # idx 0 -> seps[0] = "\n\n"
        ("Assistant", None),  # idx 1 -> bare "Assistant:"
        ("User", "b"),        # idx 2 -> seps[0] = "\n\n"  (NOT sep2!)
        ("Assistant", "c"),   # idx 3 -> seps[1] = EOS
    ])
    assert got == ("User: a\n\n"
                   "Assistant:"
                   "User: b\n\n"
                   "Assistant: c<｜end▁of▁sentence｜>")
    # whitespace-only counts as empty (m.trim() filter, mod.rs:74)
    assert render_messages("deepseek", "", [("User", "  \t ")]) == "User:"


def test_render_conversation_matches_pure_model(spark):
    """The distributed renderer and the pure render_messages model are the
    SAME function, including empty turns, system prefix, and the
    generation trailer."""
    from deepseek_ocr_rs_spark.operators.compaction import render_messages

    rows = [
        ("c1", 0, "user", "first question"),
        ("c1", 1, "assistant", ""),           # empty -> bare Assistant:
        ("c1", 2, "user", "  second  "),      # trimmed
        ("c1", 3, "assistant", "answer"),
        ("c2", 0, "system", "ctx"),
        ("c2", 1, "user", "q"),
    ]
    df = _turns(spark, rows)
    for template in ("deepseek", "deepseekv2", "plain", "alignment"):
        got = {
            r["conv_id"]: r["rendered_prompt"]
            for r in render_conversation(
                df, template, system_message="SYS",
                add_generation_prompt=True,
            ).collect()
        }
        for conv in ("c1", "c2"):
            msgs = [(_disp(r), t) for (c, _, r, t) in rows if c == conv]
            msgs.append(("Assistant", None))
            want = render_messages(template, "SYS", msgs)
            assert got[conv] == want, (template, conv, got[conv], want)


def _disp(role):
    from deepseek_ocr_rs_spark.operators.compaction import _role_display
    return _role_display(role)


def test_template_registry_register_override():
    """register_conv_template semantics (mod.rs:178-186): duplicate name
    without override raises; with override it replaces; get returns a copy."""
    import pytest

    from deepseek_ocr_rs_spark.operators.compaction import (
        TEMPLATES,
        get_template,
        register_template,
        render_messages,
    )

    params = {"style": "deepseek", "system_template": "{system_message}",
              "sep": " | ", "sep2": " # "}
    register_template("custom_t", params)
    try:
        with pytest.raises(ValueError, match="has been registered"):
            register_template("custom_t", params)
        register_template("custom_t",
                          {**params, "sep": " ~ "}, override_existing=True)
        assert get_template("custom_t")["sep"] == " ~ "
        # returned dict is a copy: mutation must not leak into the registry
        get_template("custom_t")["sep"] = "XX"
        assert get_template("custom_t")["sep"] == " ~ "
        assert render_messages("custom_t", "", [("User", "x"),
                                                ("Assistant", "y")]) \
            == "User: x ~ Assistant: y # "
    finally:
        TEMPLATES.pop("custom_t", None)
    with pytest.raises(KeyError):
        get_template("custom_t")
