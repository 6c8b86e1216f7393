"""T5 span corruption (operators/spancorrupt.py)."""

import re

import pytest

from deepseek_ocr_rs_spark.operators.spancorrupt import corrupt_spans


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(45))),  # 3 blocks, last ragged
        (2, " ".join(f"w{i}" for i in range(20))),  # exactly one block
        (3, "a b"),                                  # shorter than a span
        (4, ""),                                     # empty
        (5, " ".join(f"w{i}" for i in range(23))),  # ragged tail block
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r.doc_id: r for r in df.collect()}


def _reconstruct(input_text, target_text):
    """Undo the corruption: substitute each sentinel's hidden tokens."""
    hidden = {}
    cur = None
    for tok in target_text.split():
        m = re.fullmatch(r"<extra_id_(\d+)>", tok)
        if m:
            cur = m.group(1)
            hidden[cur] = []
        else:
            hidden[cur].append(tok)
    out = []
    for tok in input_text.split():
        m = re.fullmatch(r"<extra_id_(\d+)>", tok)
        out.extend(hidden[m.group(1)] if m else [tok])
    return " ".join(out)


def test_round_trip_reconstruction(spark, docs):
    out = _by_id(corrupt_spans(docs))
    originals = {1: 45, 2: 20, 3: 2, 4: 0, 5: 23}
    for doc_id, n in originals.items():
        r = out[doc_id]
        assert r.n_tokens == n
        orig = " ".join(f"w{i}" for i in range(n)) if doc_id != 3 else "a b"
        if doc_id == 4:
            orig = ""
        assert _reconstruct(r.input_text, r.target_text) == orig


def test_span_accounting(spark, docs):
    out = _by_id(corrupt_spans(docs, block=20, span=3))
    # 45 tokens: blocks 0,1 full (span each); block 2 has 5 tokens —
    # a span exists only if its offset lands low enough
    assert out[1].n_spans in (2, 3)
    assert out[1].n_noise_tokens == 3 * out[1].n_spans
    assert out[2].n_spans == 1
    assert out[3].n_spans == 0 and out[3].target_text == ""
    assert out[4] .n_spans == 0 and out[4].input_text == ""
    # corruption rate is exactly span/block on full blocks
    assert out[2].n_noise_tokens == 3


def test_sentinels_in_order_and_unique(spark, docs):
    out = _by_id(corrupt_spans(docs))
    sent = re.findall(r"<extra_id_(\d+)>", out[1].input_text)
    assert sent == sorted(sent, key=int) and len(set(sent)) == len(sent)
    # target lists the same sentinels in the same order
    assert re.findall(r"<extra_id_(\d+)>", out[1].target_text) == sent


def test_determinism_and_seed_sensitivity(spark, docs):
    a = sorted(map(tuple, corrupt_spans(docs, seed=42).collect()))
    b = sorted(map(tuple, corrupt_spans(docs.repartition(4), seed=42).collect()))
    assert a == b
    c = sorted(map(tuple, corrupt_spans(docs, seed=7).collect()))
    # same shape, different offsets for at least one doc
    assert [r[3] for r in a] == [r[3] for r in c]  # n_tokens unchanged
    assert any(x[1] != y[1] for x, y in zip(a, c))


def test_bad_params_rejected(spark, docs):
    with pytest.raises(ValueError):
        corrupt_spans(docs, block=3, span=3)
