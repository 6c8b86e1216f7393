"""C4 line filters + Gopher A1.1 quality rules (operators/rulefilters.py)."""

import pytest

from deepseek_ocr_rs_spark.operators.rulefilters import (
    c4_line_filters,
    gopher_quality_filters,
)


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # kept: 3 good sentences survive the line rules
        (1, 'One good sentence here.\nAnother fine line!\nIs this kept?\n'
            'junk no punct\nhi.'),
        # dropped lorem ipsum (page rule beats everything)
        (2, 'Great sentence number one.\nLorem Ipsum is planted.\n'
            'Third fine line.\nFourth decent line.'),
        # dropped: a brace anywhere kills the page
        (3, 'Good line number one.\nfn() { return; }\nGood line two.\n'
            'Good line three.'),
        # dropped: javascript line leaves only 2 kept
        (4, 'Good line number one.\nEnable javascript to view this.\n'
            'Good line two.\nshort no punct'),
        # empty page
        (5, ''),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r.doc_id: r for r in df.collect()}


def test_c4_verdicts(spark, pages):
    out = _by_id(c4_line_filters(pages, min_words_per_line=3,
                                 min_kept_lines=3))
    assert out[1].keep and out[1].reason is None
    # 'hi.' has terminal punct but only 1 word; 'junk no punct' no terminal
    assert out[1].n_lines == 5 and out[1].n_lines_kept == 3
    assert out[1].clean_text == (
        "One good sentence here.\nAnother fine line!\nIs this kept?")
    assert (out[2].keep, out[2].reason) == (False, "lorem_ipsum")
    assert (out[3].keep, out[3].reason) == (False, "brace")
    assert (out[4].keep, out[4].reason) == (False, "too_few_lines")
    assert out[4].n_lines_kept == 2
    assert (out[5].keep, out[5].reason) == (False, "too_few_lines")
    # dropped pages emit no clean_text
    assert out[2].clean_text is None and out[5].clean_text is None


def _doc(words):
    return " ".join(words)


def test_gopher_verdicts(spark):
    good = _doc(["and", "that", "with"] + ["word"] * 60)
    rows = [
        (1, good),                                      # kept
        (2, _doc(["and", "that"] + ["word"] * 10)),     # word_count (12)
        (3, _doc(["and", "that"] + ["aa"] * 70)),       # mean len < 3
        (4, good + " " + "#" * 40),                     # hash ratio
        (5, good + " " + "hm... " * 30),                # ellipsis ratio
        (6, "- " + good),                               # bullet line
        (7, _doc(["word"] * 60 + ["the"])),             # stop_words (1 hit)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _by_id(gopher_quality_filters(df))
    assert out[1].keep and out[1].reason is None
    assert out[1].n_words == 63 and out[1].n_stop_hits == 3
    assert out[2].reason == "word_count"
    assert out[3].reason == "mean_word_length"
    assert out[4].reason == "hash_ratio" and out[4].n_hash == 40
    assert out[5].reason == "ellipsis_ratio" and out[5].n_ellipsis == 30
    assert out[6].reason == "bullet_lines"
    assert out[7].reason == "stop_words" and out[7].n_stop_hits == 1


def test_gopher_reason_priority(spark):
    # a doc failing EVERYTHING reports the first rule in order
    df = spark.createDataFrame([(1, "## ...")], "doc_id long, text string")
    out = _by_id(gopher_quality_filters(df))
    assert out[1].reason == "word_count"


def test_c4_word_floor_boundary(spark):
    # exactly min_words_per_line words is kept; one fewer is not
    df = spark.createDataFrame(
        [(1, "alpha beta gamma.\nalpha beta.\nthree words here.\n"
             "yes three words.")],
        "doc_id long, text string",
    )
    out = _by_id(c4_line_filters(df, min_words_per_line=3,
                                 min_kept_lines=3))
    assert out[1].n_lines_kept == 3 and out[1].keep
