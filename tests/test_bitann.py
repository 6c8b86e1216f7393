"""Unit coverage for sign-bit binary quantization ANN
(operators/bitann.py): packing parity vs a python reference, exact
Hamming ranking, zero/negative handling, parameter validation."""

import pytest

from deepseek_ocr_rs_spark.operators.bitann import (
    WORD_BITS,
    hamming_topk,
    sign_words,
)


def _pack(vec):
    words = []
    for w in range(len(vec) // WORD_BITS):
        word = 0
        for j in range(WORD_BITS):
            if vec[w * WORD_BITS + j] > 0.0:
                word |= 1 << j
        words.append(word)
    return words


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_sign_words_match_python_packing(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(20)
    ]
    got = {
        r["vec_id"]: (r["word_0"], r["word_1"])
        for r in sign_words(_emb_df(spark, rows), dim=64).collect()
    }
    for vid, vec in rows:
        # float32 storage can flip the sign of values only at exact 0.0,
        # which uniform() never produces
        assert got[vid] == tuple(_pack(vec)), vid


def test_zero_is_not_positive(spark):
    rows = [(0, [0.0] * 64), (1, [1e-30] * 64)]
    got = {
        r["vec_id"]: (r["word_0"], r["word_1"])
        for r in sign_words(_emb_df(spark, rows), dim=64).collect()
    }
    assert got[0] == (0, 0)
    assert got[1] == ((1 << 32) - 1, (1 << 32) - 1)


def test_hamming_topk_exact_ranking(spark):
    base = [1.0] * 64
    rows = [(0, base)]
    # vector i flips the first i signs -> hamming distance exactly i
    for i in range(1, 6):
        rows.append((i, [-1.0] * i + [1.0] * (64 - i)))
    out = hamming_topk(_emb_df(spark, rows), base, dim=64, k=4).collect()
    assert [(r["vec_id"], r["hamming"]) for r in out] == [
        (0, 0), (1, 1), (2, 2), (3, 3)
    ]


def test_hamming_tie_breaks_on_vec_id(spark):
    v = [1.0] * 64
    rows = [(3, v), (1, v), (2, v)]
    out = hamming_topk(_emb_df(spark, rows), v, dim=64, k=2).collect()
    assert [r["vec_id"] for r in out] == [1, 2]


def test_dim_validation():
    with pytest.raises(ValueError):
        sign_words(None, dim=48)


def test_query_dim_validation(spark):
    with pytest.raises(ValueError):
        hamming_topk(_emb_df(spark, [(0, [1.0] * 64)]), [1.0] * 32,
                     dim=64, k=1)
