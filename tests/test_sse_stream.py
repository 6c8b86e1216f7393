"""X3 SSE completion-event stream: sequencing, rendering, spool sink.

Mirrors crates/server/src/stream.rs:16-374 — initial chunk carries the
role exactly once, empty deltas emit nothing, duplicate seqs are dropped
(X4 guard), response.completed carries the full text, [DONE] is terminal.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from deepseek_ocr_rs_spark.streaming.sse import (
    EVENT_COMPLETED,
    EVENT_DELTA,
    EVENT_DONE,
    render_sse_lines,
    run_sse_stream,
    sse_event_frames,
)

DELTA_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("seq", LongType(), False),
        StructField("delta", StringType(), False),
        StructField("is_final", BooleanType(), False),
    ]
)

ROWS = [
    # conv a: ordinary stream with an empty delta and a replayed seq
    ("a", 0, "Hel", False),
    ("a", 1, "", False),          # empty: no frame
    ("a", 2, "lo", False),
    ("a", 2, "lo", False),        # duplicate replay: dropped by the guard
    ("a", 3, " world", True),
    # conv b: still in flight (no final) — created + deltas, no completed
    ("b", 10, "partial", False),
]


def _frames(spark, kind="chat"):
    df = spark.createDataFrame(ROWS, DELTA_SCHEMA)
    return sse_event_frames(df, kind=kind).collect()


def test_role_sent_exactly_once_per_conversation(spark):
    frames = _frames(spark)
    for conv in ("a", "b"):
        roles = [f for f in frames if f.conv_id == conv and f.role is not None]
        assert len(roles) == 1
        assert roles[0].frame_idx == 0 and roles[0].role == "assistant"


def test_frame_sequence_for_completed_conversation(spark):
    frames = sorted(
        (f for f in _frames(spark) if f.conv_id == "a"),
        key=lambda f: f.frame_idx,
    )
    types = [f.event_type for f in frames]
    assert types == [
        "chat.completion.chunk",
        EVENT_DELTA,
        EVENT_DELTA,
        EVENT_DELTA,
        EVENT_COMPLETED,
        EVENT_DONE,
    ]
    # frame_idx is contiguous from 0 and the deltas reassemble the text
    assert [f.frame_idx for f in frames] == list(range(6))
    assert "".join(f.payload for f in frames if f.event_type == EVENT_DELTA) \
        == "Hello world"
    completed = frames[-2]
    assert completed.payload == "Hello world" and completed.finish_reason == "stop"


def test_in_flight_conversation_has_no_completed_or_done(spark):
    frames = [f for f in _frames(spark) if f.conv_id == "b"]
    types = {f.event_type for f in frames}
    assert EVENT_COMPLETED not in types and EVENT_DONE not in types
    assert len(frames) == 2  # initial chunk + one delta


def test_responses_kind_has_created_event_and_no_role(spark):
    frames = _frames(spark, kind="responses")
    initial = [f for f in frames if f.frame_idx == 0]
    assert {f.event_type for f in initial} == {"response.created"}
    assert all(f.role is None for f in frames)
    completed = [f for f in frames if f.event_type == EVENT_COMPLETED]
    assert all(f.finish_reason is None for f in completed)


def test_unknown_kind_rejected(spark):
    with pytest.raises(ValueError):
        sse_event_frames(spark.createDataFrame(ROWS, DELTA_SCHEMA), kind="x")


def test_render_sse_wire_format(spark):
    df = spark.createDataFrame(ROWS, DELTA_SCHEMA)
    lines = {
        (r.conv_id, r.frame_idx): r.line
        for r in render_sse_lines(sse_event_frames(df)).collect()
    }
    assert lines[("a", 5)] == "data: [DONE]"
    first = lines[("a", 0)]
    assert first.startswith("data: {") and '"role":"assistant"' in first
    delta = lines[("a", 1)]
    assert '"type":"response.output_text.delta"' in delta
    assert '"payload":"Hel"' in delta
    # null fields are dropped, not rendered as null
    assert '"finish_reason"' not in delta


def test_spool_sink_orders_frames_per_conversation(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(ROWS, DELTA_SCHEMA).repartition(2).write.parquet(src)

    q = run_sse_stream(spark, src, out, ckpt, DELTA_SCHEMA, kind="chat")
    q.awaitTermination(120)

    spooled = []
    for part in sorted(glob.glob(os.path.join(out, "epoch-*", "part-*"))):
        with open(part, encoding="utf-8") as fh:
            spooled.extend(ln for ln in fh.read().split("\n\n") if ln.strip())
    assert any('"type":"response.completed"' in ln for ln in spooled)
    assert any(ln == "data: [DONE]" for ln in spooled)
    # replaying the same source epoch overwrites rather than duplicates
    done_count = sum(1 for ln in spooled if ln == "data: [DONE]")
    assert done_count == 1  # only conv a completed
