"""RSS/Atom feed parsing (operators/feeds.py).

Pure-parser cases (no Spark) covering the pinned semantics — the RSS
void-tag link dance, Atom rel selection, guid/id fallbacks, decoys in
comments, first-occurrence-wins — plus one Spark explode roundtrip.
"""

from deepseek_ocr_rs_spark.operators.feeds import feed_entries, parse_feeds

RSS = (
    '<?xml version="1.0"?><rss version="2.0"><channel>'
    "<title>chan title (not an item)</title>"
    "<!-- <item><link>https://decoy.example/x</link></item> -->"
    "<item><title>T &amp; more</title><link> https://a.com/1 </link>"
    "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>"
    '<item><guid isPermaLink="true">https://a.com/g2</guid>'
    "<title>G2</title></item>"
    "<item><title>no url: dropped</title></item>"
    "<item><link></link><guid>https://a.com/g4</guid></item>"
    "</channel></rss>"
)

ATOM = (
    '<feed xmlns="http://www.w3.org/2005/Atom"><title>feed t</title>'
    '<entry><title>A &amp; x</title>'
    '<link rel="self" href="https://self.example/s"/>'
    '<link rel="alternate" href="https://b.com/e1"/>'
    "<updated>2024-02-01T00:00:00Z</updated></entry>"
    '<entry><link href="https://b.com/bare"/><title>bare rel</title></entry>'
    "<entry><id>https://b.com/id3</id><title>B3</title></entry>"
    "<entry><title>no url: dropped</title></entry>"
    "</feed>"
)


def test_rss_semantics():
    rows = feed_entries(RSS)
    assert [(r["url"], r["title"], r["published"], r["ordinal"]) for r in rows] == [
        ("https://a.com/1", "T & more", "Mon, 01 Jan 2024 00:00:00 GMT", 0),
        ("https://a.com/g2", "G2", None, 1),
        ("https://a.com/g4", None, None, 2),  # empty <link> -> guid
    ]
    assert all(r["feed_type"] == "rss" for r in rows)


def test_atom_semantics():
    rows = feed_entries(ATOM)
    assert [(r["url"], r["title"], r["published"]) for r in rows] == [
        ("https://b.com/e1", "A & x", "2024-02-01T00:00:00Z"),
        ("https://b.com/bare", "bare rel", None),
        ("https://b.com/id3", "B3", None),
    ]
    assert all(r["feed_type"] == "atom" for r in rows)


def test_atom_href_entities_decoded():
    # XML requires '&' inside attribute values to be escaped as '&amp;';
    # a conformant feed's query separators must decode (ADVICE r04)
    rows = feed_entries(
        '<entry><title>t</title>'
        '<link href="https://x.example/e?a=1&amp;b=2"/></entry>'
    )
    assert [r["url"] for r in rows] == ["https://x.example/e?a=1&b=2"]


def test_first_occurrence_wins_and_unknown_tags_ignored():
    rows = feed_entries(
        "<item><title>first</title><title>second</title>"
        "<media:content url='x'/><link>https://c.com/1</link></item>"
    )
    assert len(rows) == 1
    assert rows[0]["title"] == "first"
    assert rows[0]["url"] == "https://c.com/1"


def test_link_capture_terminated_by_next_tag():
    # malformed: the link text is followed by a tag, never a real close
    rows = feed_entries(
        "<item><link>https://d.com/1<title>t</title></item>"
    )
    assert rows[0]["url"] == "https://d.com/1"
    assert rows[0]["title"] == "t"


def test_rss_link_beats_guid_and_containers_do_not_nest():
    rows = feed_entries(
        "<item><guid>https://g</guid><link>https://l</link>"
        "<item><link>https://inner-ignored</link></item>"
    )
    # inner <item> open is ignored; the (single) close ends the container
    assert [r["url"] for r in rows] == ["https://l"]


def test_empty_inputs():
    assert feed_entries("") == []
    assert feed_entries("<html><body>not a feed</body></html>") == []


def test_parse_feeds_explode(spark):
    df = spark.createDataFrame(
        [(1, RSS), (2, ATOM), (3, None), (4, "<p>nope</p>")],
        "doc_id long, text string",
    )
    parsed = parse_feeds(df)
    out = parsed.collect()
    got = {(r["doc_id"], r["ordinal"]): (r["feed_type"], r["url"]) for r in out}
    assert len(out) == 6
    assert got[(1, 0)] == ("rss", "https://a.com/1")
    assert got[(2, 2)] == ("atom", "https://b.com/id3")
    # exactly ONE UDF pass: non-outer explode would push a size()>0
    # filter below the Generate and evaluate the parser twice per row
    plan = parsed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan


def test_cdata_wrapped_values():
    # real feeds CDATA-wrap titles/links; content with '>' must neither
    # drop nor leak a tail fragment
    rows = feed_entries(
        "<item><title><![CDATA[a > b & c]]></title>"
        "<link><![CDATA[https://c.com/1?a=1&b=2]]></link></item>"
    )
    assert rows == [
        {
            "feed_type": "rss",
            "url": "https://c.com/1?a=1&b=2",
            "title": "a > b & c",
            "published": None,
            "ordinal": 0,
        }
    ]
    # unterminated CDATA: dropped like other EOF-truncated markup
    assert feed_entries("<item><title><![CDATA[x</title></item>") == []
