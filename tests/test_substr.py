"""ExactSubstr duplicate-span detection (operators/substr.py).

Semantics under test (Lee et al. 2022 re-expressed Spark-first): every
MAXIMAL token interval whose every k-token sliding window repeats
corpus-wide, with within-doc repeats counted like a suffix array would.
"""

import pytest

from deepseek_ocr_rs_spark.operators.substr import (
    cut_duplicate_substrings,
    duplicate_substring_spans,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # docs 1 & 2 share a 5-token verbatim passage at different offsets;
    # doc 3 repeats a 4-gram WITHIN itself (suffix-array semantics count
    # it); doc 4 is unique; doc 5 is shorter than k; doc 6 is empty;
    # doc 7 has double spaces (tokenizer must drop empty tokens).
    rows = [
        (1, "alpha the quick brown fox jumps beta gamma"),
        (2, "delta epsilon the quick brown fox jumps zeta"),
        (3, "one two three four mid one two three four"),
        (4, "totally unique content with no repeats anywhere at all"),
        (5, "too short"),
        (6, ""),
        (7, "alpha  the quick  brown fox jumps omega"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df):
    return {
        (r.doc_id, r.span_start): (r.span_end, r.span_tokens, r.n_windows)
        for r in df.collect()
    }


def test_cross_doc_and_within_doc_spans(spark, corpus):
    out = _spans(duplicate_substring_spans(corpus, k=4, min_count=2))
    # docs 1/7 share "alpha the quick brown fox jumps" (6 tokens = three
    # overlapping 4-grams at positions 0-2); doc 2 only shares the
    # 5-token suffix "the quick brown fox jumps" at its offset 2
    assert out[(1, 0)] == (6, 6, 3)
    assert out[(2, 2)] == (7, 5, 2)
    assert out[(7, 0)] == (6, 6, 3)
    # doc 3: "one two three four" occurs twice within the doc -> two
    # disjoint islands (positions 0..4 and 5..9)
    assert out[(3, 0)] == (4, 4, 1)
    assert out[(3, 5)] == (9, 4, 1)
    # nothing else marked
    assert len(out) == 5


def test_unique_short_empty_docs_emit_nothing(spark, corpus):
    out = duplicate_substring_spans(corpus, k=4, min_count=2)
    ids = {r.doc_id for r in out.collect()}
    assert 4 not in ids and 5 not in ids and 6 not in ids


def test_min_count_threshold(spark, corpus):
    # min_count=3: the shared passage appears 3x ("the quick brown fox
    # jumps" in docs 1, 2, 7) so it survives; doc 3's within-doc 4-gram
    # appears only 2x and drops out
    out = _spans(duplicate_substring_spans(corpus, k=4, min_count=3))
    assert set(out) == {(1, 1), (2, 2), (7, 1)}
    # ...and the span shrinks back to the 5 tokens all three docs share
    assert out[(1, 1)] == (6, 5, 2)


def test_abutting_windows_merge_into_one_island(spark):
    # two docs repeat an 8-token passage; with k=4 the five marked
    # positions 0..4 chain (each pos <= prev_end) into ONE maximal span
    rows = [(1, "a b c d e f g h"), (2, "a b c d e f g h")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _spans(duplicate_substring_spans(df, k=4, min_count=2))
    assert out == {(1, 0): (8, 8, 5), (2, 0): (8, 8, 5)}


def test_cut_removes_marked_spans(spark, corpus):
    out = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_tokens_removed,
                   r.n_spans_cut)
        for r in cut_duplicate_substrings(corpus, k=4, min_count=2).collect()
    }
    # one row per INPUT doc, even the empty / short / unique ones
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}
    # docs 1/7: "alpha the quick brown fox jumps" (6 tokens) cut
    assert out[1] == ("beta gamma", 8, 6, 1)
    assert out[7] == ("omega", 7, 6, 1)
    # doc 2: only the 5-token shared suffix cut
    assert out[2] == ("delta epsilon zeta", 8, 5, 1)
    # doc 3: both within-doc islands cut, "mid" survives
    assert out[3] == ("mid", 9, 8, 2)
    # untouched docs pass through (single-space normalized join)
    assert out[4] == (
        "totally unique content with no repeats anywhere at all", 9, 0, 0)
    assert out[5] == ("too short", 2, 0, 0)
    assert out[6] == ("", 0, 0, 0)


def test_cut_fully_duplicated_doc_empties(spark):
    rows = [(1, "a b c d e f g h"), (2, "a b c d e f g h")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.clean_text, r.n_tokens_removed)
           for r in cut_duplicate_substrings(df, k=4).collect()}
    assert out == {1: ("", 8), 2: ("", 8)}


def test_partitioning_invariance(spark, corpus):
    a = sorted(map(tuple, duplicate_substring_spans(corpus, k=4).collect()))
    b = sorted(
        map(
            tuple,
            duplicate_substring_spans(corpus.repartition(7), k=4).collect(),
        )
    )
    assert a == b
