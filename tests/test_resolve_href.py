"""Relative-href resolution (operators/urls.py resolve_href_col).

Three-way agreement on a hostile corpus: the Spark Column, the DuckDB
SQL replica, and — for every supported case — Python's stdlib
``urllib.parse.urljoin`` (an implementation-independent RFC 3986
oracle), each followed by the shared canonicalizer.  Defined
deviations from urljoin (all conservative): empty / fragment-only
hrefs and non-http schemes resolve to NULL instead of echoing the
base, and dot-nesting beyond the documented bound resolves to NULL
rather than ever resolving wrong.
"""

from urllib.parse import urljoin

import duckdb
import pytest

from deepseek_ocr_rs_spark.operators.urls import (
    canonical_url_sql,
    resolve_href_col,
    resolve_href_sql,
)

BASES = [
    "http://e.com/a/b/c?x=1",
    "https://e.com/",
    "http://e.com:8080/d/",
]
HREFS = [
    "p", "./p", "../p", "../../p", "../../../../p",  # root clamp
    "p/q/../r", "p/./q", ".", "./", "..", "../",
    "//cdn.com/x", "/abs/p", "/abs/../q", "?y=2",
    "https://x.com/y", "HTTP://UP.com/Y", "p?b=2&a=1&utm_source=z",
    "  /sp%20aced  ", "p#frag", "#frag", "", "mailto:a@b.c",
    "javascript:void(0)", "a..b/c", "...",
]
SUPPORTED_NULLS = {"", "#frag", "mailto:a@b.c", "javascript:void(0)"}


def _expected(base, href):
    h = href.strip().split("#", 1)[0]
    if h == "" or href.strip().startswith("#"):
        return None
    if h.split(":", 1)[0].lower() in ("mailto", "javascript"):
        return None
    return urljoin(base, h)


def test_three_way_agreement(spark):
    from pyspark.sql import functions as F

    rows = [(b, h) for b in BASES for h in HREFS]
    df = spark.createDataFrame(rows, "base string, href string")
    got = {
        (r["base"], r["href"]): r["out"]
        for r in df.select(
            "base", "href",
            resolve_href_col(F.col("base"), F.col("href")).alias("out"),
        ).collect()
    }
    con = duckdb.connect()
    sql = canonical_url_sql(f"({resolve_href_sql('b', 'h')})")
    for b, h in rows:
        (duck,) = con.execute(
            f"SELECT {sql} FROM (VALUES (?, ?)) t(b, h)", [b, h]
        ).fetchone()
        assert got[(b, h)] == duck, ("engine mismatch", b, h, got[(b, h)], duck)

        want_raw = _expected(b, h)
        if want_raw is None:
            assert got[(b, h)] is None, (b, h, got[(b, h)])
        else:
            (want,) = con.execute(
                f"SELECT {canonical_url_sql('u')} FROM (VALUES (?)) t(u)",
                [want_raw],
            ).fetchone()
            assert got[(b, h)] == want, (
                "urljoin mismatch", b, h, got[(b, h)], want_raw, want,
            )


def test_beyond_bound_is_null_never_wrong(spark):
    from pyspark.sql import functions as F

    deep = "../" * 12 + "x"  # beyond the 8-pass bound from a shallow base
    df = spark.createDataFrame(
        [("http://e.com/a/b/c", deep)], "base string, href string"
    )
    (row,) = df.select(
        resolve_href_col(F.col("base"), F.col("href")).alias("out")
    ).collect()
    # root clamp would give http://e.com/x, but only if the passes
    # cover the depth; 12 levels exceed the bound -> conservative NULL
    assert row["out"] in (None, "http://e.com/x")
    if row["out"] is None:
        # and the SQL replica agrees
        con = duckdb.connect()
        sql = canonical_url_sql(f"({resolve_href_sql('b', 'h')})")
        (duck,) = con.execute(
            f"SELECT {sql} FROM (VALUES (?, ?)) t(b, h)",
            ["http://e.com/a/b/c", deep],
        ).fetchone()
        assert duck is None


def test_python_replica_matches_column_resolver(spark):
    """The r06 Arrow-pass resolver (resolve_raw_py + canonicalize) must
    agree with the Column chain on the full hostile corpus."""
    from pyspark.sql import functions as F

    from deepseek_ocr_rs_spark.operators.urls import (
        base_parts_py,
        canonicalize_url_py,
        resolve_raw_py,
    )

    cases = [(b, h) for b in BASES for h in HREFS]
    df = spark.createDataFrame(cases, "base string, href string")
    jvm = [
        r[0]
        for r in df.select(
            resolve_href_col(F.col("base"), F.col("href")).alias("out")
        ).collect()
    ]
    py = [
        canonicalize_url_py(
            resolve_raw_py(*base_parts_py(b), h)
        )
        for b, h in cases
    ]
    assert jvm == py


def test_null_inputs(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(None, "p"), ("http://e.com/", None)], "base string, href string"
    )
    out = [
        r["out"]
        for r in df.select(
            resolve_href_col(F.col("base"), F.col("href")).alias("out")
        ).collect()
    ]
    assert out == [None, None]


def test_resolved_outlinks_operator(spark):
    from deepseek_ocr_rs_spark.operators.urls import resolved_outlinks

    rows = [
        (1, "http://e.com/a/",
         '<a href="%2e%2e/x">enc</a><a href="  ">ws decoy</a>'
         '<a href="p//q">empty seg kept</a><a href="./../../..">clamp</a>'
         '<a href="HTTPS://C.com/Z?utm_b=1&amp;keep=2">abs</a>'),
        (2, "not a base", '<a href="p">unresolvable base</a>'),
    ]
    df = spark.createDataFrame(rows, "conv_id int, url string, text string")
    out = [
        (r["conv_id"], r["link_pos"], r["url_canon"])
        for r in resolved_outlinks(df).collect()
    ]
    assert out == [
        # %2e%2e passes through un-decoded (canonicalizer discipline),
        # whitespace-only drops, empty segments preserved, over-root
        # clamps, absolute canonicalizes (host lowered, path case kept)
        (1, 0, "http://e.com/a/%2e%2e/x"),
        (1, 1, "http://e.com/a/p//q"),
        (1, 2, "http://e.com/"),
        (1, 3, "https://c.com/Z?keep=2"),
    ]
    # a page whose own URL fails canonicalization contributes no edges
    assert not [r for r in out if r[0] == 2]
    # single-Python-pass discipline: tokenize+resolve+canonicalize run in
    # ONE MapInPandas (r06); no stray ArrowEvalPython re-evaluation
    plan = resolved_outlinks(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "ArrowEvalPython" not in plan


def test_resolved_outlinks_partitioning_invariance(spark):
    rows = [
        (i, f"http://h{i%3}.com/a/{i}/p",
         f'<a href="../x{i}">u</a><a href="/y?b={i}&a=1">r</a>')
        for i in range(60)
    ]
    from deepseek_ocr_rs_spark.operators.urls import resolved_outlinks

    df = spark.createDataFrame(rows, "conv_id int, url string, text string")
    base = sorted(map(tuple, resolved_outlinks(df).collect()))
    rep = sorted(
        map(tuple, resolved_outlinks(df.repartition(11)).collect())
    )
    assert base == rep and len(base) == 120
