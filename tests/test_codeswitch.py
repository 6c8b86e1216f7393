"""Code-switching / language-consistency rollup (operators/textstats.py
code_switching): the REAL Arrow-batched classifier labels pre-segmented
text; the rollup's majority, tie-break, and basis-point arithmetic are
checked against hand-known plants."""

import pytest

from deepseek_ocr_rs_spark.operators.textstats import code_switching

EN = "the and of is " * 30
DE = "der und die ist " * 30
FR = "le la et est " * 30
RU = "русский текст " * 30


def _roll(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: (r.n_segments, r.n_langs, r.major_lang, r.major_bp)
        for r in code_switching(df).collect()
    }


def test_monolingual_and_majority(spark):
    rows = (
        [(1, EN)] * 4
        + [(2, EN)] * 3 + [(2, DE)]
        + [(3, EN), (3, DE), (3, FR), (3, RU)]
    )
    got = _roll(spark, rows)
    assert got[1] == (4, 1, "en", 10000)
    assert got[2] == (4, 2, "en", 7500)
    # four-way tie: smallest language code wins ('de' < 'en' < 'fr' < 'ru')
    assert got[3] == (4, 4, "de", 2500)


def test_two_way_tie_breaks_to_smallest_code(spark):
    got = _roll(spark, [(1, RU), (1, RU), (1, EN), (1, EN)])
    assert got[1] == (4, 2, "en", 5000)


def test_single_segment_and_empty(spark):
    got = _roll(spark, [(1, DE), (2, "")])
    assert got[1] == (1, 1, "de", 10000)
    # empty text classifies 'und' (the classifier's own contract)
    assert got[2] == (1, 1, "und", 10000)


def test_partitioning_invariance(spark):
    rows = [(i, [EN, DE, FR, RU][(i + s) % 4]) for i in range(12)
            for s in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(tuple(r) for r in code_switching(df).collect())
    b = sorted(
        tuple(r) for r in code_switching(df.repartition(7)).collect()
    )
    assert a == b
