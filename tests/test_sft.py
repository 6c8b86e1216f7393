"""SFT loss-mask spans (operators/sft.py) vs the deepseek renderer."""

import pytest

from deepseek_ocr_rs_spark.operators.compaction import (
    EOS,
    render_conversation,
)
from deepseek_ocr_rs_spark.operators.sft import loss_mask_spans

SYS = "You are a helpful OCR assistant."


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        # conv a: system(empty) / user / assistant — the classic triple
        ("a", 0, "system", ""),
        ("a", 1, "user", "read this page"),
        ("a", 2, "assistant", "Sure — here is the text."),
        # conv b: multi-round with an EMPTY assistant turn (no loss) and
        # a trailing user turn (no loss)
        ("b", 0, "user", "hi"),
        ("b", 1, "assistant", "hello"),
        ("b", 2, "assistant", ""),
        ("b", 3, "user", "bye"),
        # conv c: single assistant turn, multibyte content
        ("c", 0, "assistant", "café né"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_spans_slice_the_rendered_prompt(spark, turns):
    """THE pinning invariant: for every turn,
    rendered[piece_start:piece_end] == the turn's piece, and the mask
    interval is exactly `content + trailing separator`."""
    rendered = {
        r.conv_id: r.rendered_prompt
        for r in render_conversation(
            turns, "deepseek", system_message=SYS
        ).collect()
    }
    spans = loss_mask_spans(turns, "deepseek", system_message=SYS).collect()
    assert len(spans) == 8
    by_turn = {(r.conv_id, r.turn_idx): r for r in spans}
    text = {
        (r[0], r[1]): (r[2], r[3])
        for r in [
            ("a", 0, "system", ""),
            ("a", 1, "user", "read this page"),
            ("a", 2, "assistant", "Sure — here is the text."),
            ("b", 0, "user", "hi"),
            ("b", 1, "assistant", "hello"),
            ("b", 2, "assistant", ""),
            ("b", 3, "user", "bye"),
            ("c", 0, "assistant", "café né"),
        ]
    }
    for (cid, idx), r in by_turn.items():
        piece = rendered[cid][r.piece_start : r.piece_end]
        role, content = text[(cid, idx)]
        name = {"system": "System", "user": "User",
                "assistant": "Assistant"}[role]
        assert piece.startswith(name + ":"), (cid, idx, piece)
        if content:
            sep = "\n\n" if (idx if cid != "a" else idx) % 2 == 0 else EOS
        if r.loss:
            masked = rendered[cid][r.mask_start : r.mask_end]
            assert masked.startswith(content)
            assert masked.endswith(("\n\n", EOS))
            assert r.mask_start == r.piece_start + len(name) + 2
            assert r.mask_end == r.piece_end
        else:
            assert r.mask_start is None and r.mask_end is None


def test_loss_only_on_nonempty_assistant_turns(spark, turns):
    spans = loss_mask_spans(turns, "deepseek", system_message=SYS).collect()
    lossy = {(r.conv_id, r.turn_idx) for r in spans if r.loss}
    assert lossy == {("a", 2), ("b", 1), ("c", 0)}


def test_pieces_tile_the_prompt(spark, turns):
    """Pieces are contiguous and cover the rendered prompt exactly
    (after the system prefix, up to the final separator)."""
    rendered = {
        r.conv_id: r.rendered_prompt
        for r in render_conversation(
            turns, "deepseek", system_message=SYS
        ).collect()
    }
    spans = loss_mask_spans(turns, "deepseek", system_message=SYS).collect()
    prefix = len(SYS + "\n\n")
    per_conv = {}
    for r in spans:
        per_conv.setdefault(r.conv_id, []).append(r)
    for cid, rs in per_conv.items():
        rs.sort(key=lambda r: r.turn_idx)
        cursor = prefix
        for r in rs:
            assert r.piece_start == cursor
            cursor = r.piece_end
        assert cursor == len(rendered[cid])


def test_non_deepseek_template_rejected(spark, turns):
    with pytest.raises(ValueError):
        loss_mask_spans(turns, "plain")


def test_partitioning_invariance(spark, turns):
    a = sorted(map(tuple, loss_mask_spans(turns, system_message=SYS).collect()))
    b = sorted(
        map(
            tuple,
            loss_mask_spans(
                turns.repartition(5), system_message=SYS
            ).collect(),
        )
    )
    assert a == b
