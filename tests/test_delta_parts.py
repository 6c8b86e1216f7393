"""W4/F4/X5 delta tracker + P3 parts flattening."""

from deepseek_ocr_rs_spark.functions.delta import DeltaTracker, extract_delta
from deepseek_ocr_rs_spark.functions.extract_core import extract_payload


def test_extract_delta():
    assert extract_delta("", "hello") == "hello"
    assert extract_delta("hel", "hello") == "lo"
    assert extract_delta("hello", "hello") == ""
    # divergence: only the suffix after the longest common prefix
    # (streaming.rs:10-18 — NOT all of current)
    assert extract_delta("hello", "help") == "p"
    assert extract_delta("abc", "xyz") == "xyz"


def test_delta_tracker_stream():
    t = DeltaTracker()
    out = [t.advance(s) for s in ["he", "hello ", "hello wor", "hello world"]]
    assert "".join(out) == "hello world"
    assert out == ["he", "llo ", "wor", "ld"]


def test_delta_tracker_suppresses_partial_codepoint():
    t = DeltaTracker()
    a = t.advance("caf�")       # partial UTF-8 at chunk boundary
    b = t.advance("café ok")    # completed on the next snapshot
    assert a == "caf"
    assert b == "é ok"
    assert a + b == "café ok"
    # genuinely malformed input keeps its replacement char at finish
    t2 = DeltaTracker()
    t2.advance("bad�")
    assert t2.finish("bad�") == "�"


def test_delta_tracker_mid_delta_replacement():
    # a replacement char ANYWHERE in the delta cuts it there
    # (streaming.rs:52-58), not just a trailing one
    t = DeltaTracker()
    assert t.advance("ab�cd") == "ab"
    # delta now STARTS with the replacement char: emit nothing, hold state
    assert t.advance("ab�cd") == ""
    assert t.finish("ab�cd") == "�cd"
    assert t.snapshot == "ab�cd"


def test_flatten_parts(spark):
    from pyspark.sql import functions as F

    from deepseek_ocr_rs_spark.operators.compaction import flatten_parts

    df = spark.createDataFrame(
        [(1, ["third", "second", "", "first"])], "id int, parts array<string>"
    )
    out = flatten_parts(df).select("text").first()[0]
    assert out == "first\nsecond\nthird"  # reverse order, empties dropped


def test_max_blocks_cap():
    html = ("<html><body>" + "".join(f"<p>paragraph number {i} body</p>"
                                     for i in range(10)) + "</body></html>")
    full = extract_payload(html)
    capped = extract_payload(html, max_blocks=3)
    assert full["n_blocks"] == 10 and capped["n_blocks"] == 3
    assert capped["text_md"] == "\n\n".join(
        f"paragraph number {i} body" for i in range(3))
    assert [s["block_idx"] for s in capped["spans"]] == [0, 1, 2]
