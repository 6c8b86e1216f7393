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
    assert out["c1"] == "System: S\nU\nA"


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
