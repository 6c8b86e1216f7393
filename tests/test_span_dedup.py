"""C4-style cross-corpus span dedup (operators/spandedup.py)."""

import pytest

from deepseek_ocr_rs_spark.operators.spandedup import span_dedup


@pytest.fixture(scope="module")
def corpus(spark):
    # "nav bar home" is shared boilerplate across docs 1-4 (>= min_docs=3);
    # "unique words here/too" is per-doc content; doc 5 is boilerplate-only;
    # doc 6 is empty; doc 7 has a ragged 2-word tail span.
    rows = [
        (1, "nav bar home alpha beta gamma"),
        (2, "nav bar home delta epsilon zeta"),
        (3, "nav bar home eta theta iota"),
        (4, "kappa nav bar home lambda mu"),
        (5, "nav bar home"),
        (6, ""),
        (7, "nav bar home tail end"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r.doc_id: (r.clean_text, r.n_spans, r.n_removed)
            for r in df.collect()}


def test_banned_span_removed_everywhere(spark, corpus):
    out = _by_id(span_dedup(corpus, span_words=3, min_docs=3))
    assert out[1] == ("alpha beta gamma", 2, 1)
    assert out[2] == ("delta epsilon zeta", 2, 1)
    assert out[3] == ("eta theta iota", 2, 1)
    # doc 4's boilerplate sits at offset 1, so its spans chunk differently
    # ("kappa nav bar" / "home lambda mu") and do NOT hit the banned set —
    # offset sensitivity is inherent to non-overlapping chunking (C4 had
    # the same property)
    assert out[4] == ("kappa nav bar home lambda mu", 2, 0)
    # boilerplate-only doc collapses to empty
    assert out[5] == ("", 1, 1)
    # empty doc: zero spans, zero removed, present in the output
    assert out[6] == ("", 0, 0)
    # ragged tail span survives (only 5 docs contain "nav bar home" as a
    # full span: 1,2,3,5,7)
    assert out[7] == ("tail end", 2, 1)


def test_below_threshold_keeps_everything(spark, corpus):
    out = _by_id(span_dedup(corpus, span_words=3, min_docs=99))
    for doc_id, (clean, n_spans, n_removed) in out.items():
        assert n_removed == 0
        src = {r.doc_id: r.text for r in corpus.collect()}[doc_id]
        assert clean == src.strip()


def test_partitioning_invariance(spark, corpus):
    a = _by_id(span_dedup(corpus.repartition(7), span_words=3, min_docs=3))
    b = _by_id(span_dedup(corpus.coalesce(1), span_words=3, min_docs=3))
    assert a == b


def test_order_preserved_across_many_spans(spark):
    words = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame([(1, words), (2, words), (3, words)],
                               "doc_id long, text string")
    out = _by_id(span_dedup(df, span_words=3, min_docs=3))
    # every span banned in every doc -> all empty, 10 spans each
    assert out == {i: ("", 10, 10) for i in (1, 2, 3)}
