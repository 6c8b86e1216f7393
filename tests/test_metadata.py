"""Page-metadata extraction: first-occurrence fold + decoy immunity (X5)."""

import pytest

from deepseek_ocr_rs_spark.functions.tokenizer import (
    HtmlTokenizer,
    tokenize_html_fast,
)
from deepseek_ocr_rs_spark.operators.metadata import (
    METADATA_FIELDS,
    extract_page_metadata,
    page_metadata,
)


def _meta(html: str) -> dict:
    return page_metadata(tokenize_html_fast(html))


def test_full_head():
    html = (
        '<!doctype html><html lang=" EN-us "><head>'
        "<title> A &amp;\n B </title>"
        '<meta name="Description" content="d &ouml; 1">'
        '<meta name="author" content="me">'
        '<meta property="og:title" content="og t"/>'
        '<meta property="OG:URL" content="http://x.com/?a=1&amp;b=2">'
        '<link rel="alternate CANONICAL" href="/c?x=1&amp;y=2">'
        "</head><body>hi</body></html>"
    )
    m = _meta(html)
    assert m == {
        "title": "A & B",  # entity-decoded, whitespace-collapsed
        "description": "d ö 1",
        "author": "me",
        "og_title": "og t",
        "og_url": "http://x.com/?a=1&b=2",
        "canonical_href": "/c?x=1&y=2",
        "html_lang": "en-us",
        "meta_robots": None,
    }


def test_first_occurrence_wins_everywhere():
    html = (
        "<html lang='en'><head><title>first</title><title>second</title>"
        '<meta name="description" content="d1">'
        '<meta name="description" content="d2">'
        '<link rel="canonical" href="/c1">'
        '<link rel="canonical" href="/c2"></head>'
        "<html lang='fr'>"
    )
    m = _meta(html)
    assert m["title"] == "first"
    assert m["description"] == "d1"
    assert m["canonical_href"] == "/c1"
    assert m["html_lang"] == "en"


def test_decoys_cannot_leak():
    html = (
        '<!-- <meta name="description" content="comment decoy"> -->'
        "<script>var t = '<title>script decoy</title>';</script>"
        "<style>/* <meta name=author content=style> */</style>"
        "<title>real</title>"
    )
    m = _meta(html)
    assert m["title"] == "real"
    assert m["description"] is None
    assert m["author"] is None


def test_meta_without_content_never_consumes_slot():
    html = (
        '<meta name="description">'
        '<meta name="description" content="real">'
    )
    assert _meta(html)["description"] == "real"


def test_empty_first_title_stays_null_and_holds_slot():
    # first <title> wins by element, not by content: an empty first title
    # leaves NULL rather than promoting a later (spam-prone) duplicate
    m = _meta("<title>  </title><title>later</title>")
    assert m["title"] is None


def test_rel_token_list_not_substring():
    # 'noncanonical' must NOT match; token list + case-insensitivity must
    assert _meta('<link rel="noncanonical" href="/x">')["canonical_href"] is None
    assert (
        _meta('<link rel="Alternate CANONICAL" href="/y">')["canonical_href"]
        == "/y"
    )
    # link without href never consumes the slot
    html = '<link rel="canonical"><link rel="canonical" href="/z">'
    assert _meta(html)["canonical_href"] == "/z"


def test_og_vs_name_namespaces_do_not_cross():
    html = (
        '<meta property="description" content="prop-desc">'
        '<meta name="og:title" content="name-og">'
    )
    m = _meta(html)
    assert m["description"] is None  # description is a NAME, not a property
    assert m["og_title"] is None  # og:title is a PROPERTY, not a name


def test_empty_and_metadata_free_payloads():
    assert _meta("") == {f: None for f in METADATA_FIELDS}
    assert _meta("<p>just a body</p>") == {f: None for f in METADATA_FIELDS}


@pytest.mark.parametrize("chunk", [1, 2, 3, 7, 16, 64])
def test_chunked_event_stream_identical(chunk):
    html = (
        '<html lang="en"><head><title>T &amp; t</title>'
        '<meta name="description" content="long &ouml; content here">'
        '<link rel="canonical" href="https://e.com/c?a=1&amp;b=2#f">'
        "</head><body><script>'<title>no</title>'</script></body></html>"
    )
    data = html.encode()
    tok = HtmlTokenizer()
    events = []
    for i in range(0, len(data), chunk):
        events.extend(tok.feed(data[i : i + chunk]))
    events.extend(tok.finish())
    assert page_metadata(events) == page_metadata(tokenize_html_fast(html))


def test_spark_struct_and_partitioning_invariance(spark):
    rows = [
        ("a", "<html lang='de'><title>x</title>"),
        ("b", '<meta property="og:url" content="http://h/p">'),
        ("c", None),
        ("d", ""),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    out = {
        r["id"]: r
        for r in extract_page_metadata(df)
        .select("id", "page_meta.*")
        .collect()
    }
    assert out["a"]["title"] == "x" and out["a"]["html_lang"] == "de"
    assert out["b"]["og_url"] == "http://h/p" and out["b"]["title"] is None
    assert all(out["c"][f] is None for f in METADATA_FIELDS)
    assert all(out["d"][f] is None for f in METADATA_FIELDS)

    repart = {
        r["id"]: r
        for r in extract_page_metadata(df.repartition(7, "id"))
        .select("id", "page_meta.*")
        .collect()
    }
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in repart.items()
    }


def test_meta_robots_extraction_and_noindex_column(spark):
    import duckdb
    from pyspark.sql import functions as F

    from deepseek_ocr_rs_spark.operators.metadata import (
        page_metadata,
        robots_noindex_col,
        robots_noindex_sql,
    )
    from deepseek_ocr_rs_spark.functions.tokenizer import tokenize_html_fast

    m = page_metadata(
        tokenize_html_fast('<meta name="ROBOTS" content="NoIndex, nofollow">')
    )
    assert m["meta_robots"] == "NoIndex, nofollow"

    cases = [None, "", "index, follow", "NOINDEX", "none", "nofollow",
             " noindex , nofollow ", "noindexx", "all,NONE"]
    want = [False, False, False, True, True, False, True, False, True]
    df = spark.createDataFrame([(c,) for c in cases], "robots string")
    got = [
        r[0]
        for r in df.select(robots_noindex_col(F.col("robots"))).collect()
    ]
    assert got == want
    con = duckdb.connect()
    values = ", ".join(
        "(NULL)" if c is None else "('%s')" % c for c in cases
    )
    sql = (
        f"SELECT {robots_noindex_sql('r')} FROM (VALUES {values}) t(r)"
    )
    assert [row[0] for row in con.sql(sql).fetchall()] == want
