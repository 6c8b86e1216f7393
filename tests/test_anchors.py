"""Anchor-text capture contract (operators/anchors.py).

Pins the pure-Python pair extractor against hand-written HTML (the rules
documented in the module docstring), then the Spark operators: kept-link
numbering, canonicalization drops, per-target rollup determinism, and
partitioning invariance.
"""

import pytest

from deepseek_ocr_rs_spark.operators.anchors import (
    _anchor_pairs,
    anchor_outlinks,
    anchor_stats,
)


# ------------------------------------------------------------- pure capture


def test_basic_anchor_with_formatting_and_entities():
    html = '<p><a href="https://a.com/x?b=1&amp;c=2">Read <b>&amp; more</b>\n now</a></p>'
    assert _anchor_pairs(html) == [
        ("https://a.com/x?b=1&c=2", "Read & more now")
    ]


def test_new_anchor_implicitly_closes_previous():
    html = '<a href="https://a.com/1">first <a href="https://a.com/2">second</a> tail'
    assert _anchor_pairs(html) == [
        ("https://a.com/1", "first"),
        ("https://a.com/2", "second"),
    ]


def test_hrefless_anchor_emits_nothing_but_closes():
    html = '<a href="https://a.com/1">one<a>plain</a><a href="https://a.com/2">two</a>'
    assert _anchor_pairs(html) == [
        ("https://a.com/1", "one"),
        ("https://a.com/2", "two"),
    ]


def test_dangling_anchor_kept_at_eof():
    assert _anchor_pairs('<a href="https://a.com/">torn tex') == [
        ("https://a.com/", "torn tex")
    ]


def test_empty_anchor_text_is_empty_string():
    assert _anchor_pairs('<a href="https://a.com/i"><b></b></a>') == [
        ("https://a.com/i", "")
    ]


def test_comment_script_style_anchors_never_leak():
    html = (
        '<!-- <a href="https://c.com/">c</a> -->'
        "<script>var a='<a href=\"https://s.com/\">s</a>';</script>"
        "<style>a{content:'<a href=\"https://t.com/\">t</a>'}</style>"
        '<a href="https://real.com/">real</a>'
    )
    assert _anchor_pairs(html) == [("https://real.com/", "real")]


def test_text_outside_anchors_ignored():
    assert _anchor_pairs("<p>no links here</p>") == []
    assert (
        _anchor_pairs('pre <a href="https://a.com/">in</a> post')
        == [("https://a.com/", "in")]
    )


# ------------------------------------------------------------ spark operator


@pytest.fixture(scope="module")
def edges(spark):
    rows = [
        # doc d1: two kept links to the SAME target with different
        # anchors (n_docs must not double-count), one relative drop
        (
            "d1",
            '<a href="/rel">skip</a>'
            '<a href="https://hub.com/t">alpha</a>'
            '<a href="https://hub.com/t/">beta</a>',
        ),
        # doc d2: hub again (anchor ties with d3's) + unique link
        (
            "d2",
            '<a href="https://hub.com/t">beta</a>'
            '<a href="https://only.com/2?z=1&amp;a=2">solo 2</a>',
        ),
        # doc d3: hub with the tying anchor + mailto drop
        (
            "d3",
            '<a href="mailto:x@y.z">m</a>'
            '<a href="https://hub.com/t">alpha</a>',
        ),
        ("d4", "<p>nothing</p>"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, text string")
    return anchor_outlinks(df)


def test_outlinks_positions_and_canon(edges):
    got = {
        (r.conv_id, r.link_pos): (r.url_canon, r.anchor)
        for r in edges.collect()
    }
    assert got == {
        ("d1", 0): ("https://hub.com/t", "alpha"),
        ("d1", 1): ("https://hub.com/t/", "beta"),
        ("d2", 0): ("https://hub.com/t", "beta"),
        ("d2", 1): ("https://only.com/2?a=2&z=1", "solo 2"),
        ("d3", 0): ("https://hub.com/t", "alpha"),
    }


def test_anchor_stats_rollup_and_tiebreak(edges):
    got = {r.url_canon: r for r in anchor_stats(edges).collect()}
    hub = got["https://hub.com/t"]
    # 3 links from 3 docs; alpha x2 beats beta x1
    assert (hub.n_links, hub.n_docs, hub.top_anchor) == (3, 3, "alpha")
    solo = got["https://only.com/2?a=2&z=1"]
    assert (solo.n_links, solo.n_docs, solo.top_anchor) == (1, 1, "solo 2")
    # trailing-slash variant is a distinct target
    assert got["https://hub.com/t/"].n_links == 1


def test_anchor_stats_tie_breaks_bytewise_smallest(spark):
    rows = [
        ("a", '<a href="https://t.com/">zeta</a>'),
        ("b", '<a href="https://t.com/">alpha</a>'),
    ]
    df = spark.createDataFrame(rows, "conv_id string, text string")
    out = anchor_stats(anchor_outlinks(df)).collect()
    assert out[0].top_anchor == "alpha"


def test_single_arrow_pass_no_exchange(spark):
    # the tokenizer UDF must run ONCE per row (posexplode_outer keeps
    # Catalyst from double-evaluating it under a pushed size>0 filter)
    # and the edge list needs no shuffle at all
    df = spark.createDataFrame(
        [("x", '<a href="https://a.com/">a</a>')],
        "conv_id string, text string",
    )
    plan = anchor_outlinks(df)._jdf.queryExecution().executedPlan().toString()
    # r06: tokenize+canonicalize run in ONE MapInPandas pass
    assert plan.count("MapInPandas") == 1
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_partitioning_invariance(spark, edges):
    base = sorted(map(tuple, edges.collect()))
    rows = [
        ("d1", '<a href="/rel">skip</a><a href="https://hub.com/t">alpha</a><a href="https://hub.com/t/">beta</a>'),
        ("d2", '<a href="https://hub.com/t">beta</a><a href="https://only.com/2?z=1&amp;a=2">solo 2</a>'),
        ("d3", '<a href="mailto:x@y.z">m</a><a href="https://hub.com/t">alpha</a>'),
        ("d4", "<p>nothing</p>"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, text string").repartition(7)
    assert sorted(map(tuple, anchor_outlinks(df).collect())) == base
