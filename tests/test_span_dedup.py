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


# ----------------------------------------------- host template detection


def _templates(spark, rows, **kw):
    from deepseek_ocr_rs_spark.operators.spandedup import host_template_spans

    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    return {
        (r.host, r.span): (r.n_docs, r.n_docs_host)
        for r in host_template_spans(df, **kw).collect()
    }


def test_template_flagged_per_host_not_globally(spark):
    # host A: 3 of 4 pages share the aligned prefix span -> flagged;
    # host B: the SAME span on only 1 of 3 pages -> under 30%, kept out.
    rows = [
        (1, "A", "nav bar home alpha beta gamma"),
        (2, "A", "nav bar home delta epsilon zeta"),
        (3, "A", "nav bar home eta theta iota"),
        (4, "A", "kappa lambda mu"),
        (5, "B", "nav bar home nu xi omicron"),
        (6, "B", "pi rho sigma"),
        (7, "B", "tau upsilon phi"),
    ]
    got = _templates(spark, rows, min_pct=30, min_docs=3)
    assert got == {("A", "nav bar home"): (3, 4)}


def test_exact_percentage_boundary_inclusive(spark):
    # 3 of 10 pages = exactly 30%: the integer cross-multiplication
    # 3*100 >= 30*10 admits it; min_pct=31 rejects it.
    rows = [
        (0, "H", "top menu strip w0 x y"),
        (1, "H", "top menu strip w1 x y"),
        (2, "H", "top menu strip w2 x y"),
    ] + [
        (i, "H", " ".join("u%d_%d" % (i, j) for j in range(6)))
        for i in range(3, 10)
    ]
    got = _templates(spark, rows, min_pct=30, min_docs=3)
    assert got == {("H", "top menu strip"): (3, 10)}
    assert _templates(spark, rows, min_pct=31, min_docs=3) == {}


def test_min_docs_guards_tiny_hosts(spark):
    rows = [
        (1, "tiny", "cookie notice here stuff one two"),
        (2, "tiny", "cookie notice here other words now"),
    ]
    # 2/2 = 100% but min_docs=3 blocks; min_docs=2 admits
    assert _templates(spark, rows, min_pct=30, min_docs=3) == {}
    got = _templates(spark, rows, min_pct=30, min_docs=2)
    assert got == {("tiny", "cookie notice here"): (2, 2)}


def test_alignment_sensitivity_and_empty_docs(spark):
    # the shared text sits at offset 1 in doc 3, so its chunks differ;
    # empty docs count toward the host page total but produce no spans
    rows = [
        (1, "A", "nav bar home one"),
        (2, "A", "nav bar home two"),
        (3, "A", "pre nav bar home"),
        (4, "A", ""),
    ]
    got = _templates(spark, rows, min_pct=30, min_docs=2)
    assert got == {("A", "nav bar home"): (2, 4)}


def test_template_oracle_parity(spark):
    import duckdb
    import pandas as pd

    from deepseek_ocr_rs_spark.operators.spandedup import (
        host_template_spans,
        host_template_spans_oracle_sql,
    )

    rows = []
    for i in range(40):
        host = "h%d" % (i % 4)
        body = "word%d word%d word%d tail%d" % (i, i * 3, i * 7, i)
        text = ("site %s chrome begin %s" % (host, body)
                if i % 3 < 2 else body)
        rows.append((i, host, body if i % 5 == 4 else text))
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df = spark.createDataFrame(pdf)

    con = duckdb.connect()
    con.register("docs_tpl", pdf)
    want = sorted(
        tuple(x)
        for x in con.sql(
            host_template_spans_oracle_sql(
                "docs_tpl", min_pct=30, min_docs=3
            )
        ).fetchall()
    )
    got = sorted(
        tuple(r)
        for r in host_template_spans(df, min_pct=30, min_docs=3).collect()
    )
    got8 = sorted(
        tuple(r)
        for r in host_template_spans(
            df.repartition(8), min_pct=30, min_docs=3
        ).collect()
    )
    assert got == want
    assert got8 == got
    assert len(got) > 0
