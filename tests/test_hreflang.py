"""hreflang alternate-language clusters (operators/hreflang.py)."""

from deepseek_ocr_rs_spark.operators.hreflang import (
    extract_hreflang,
    hreflang_edges,
)

PAGE = (
    "<html><head>"
    '<!-- <link rel="alternate" hreflang="xx" href="https://decoy/x"> -->'
    '<link rel="stylesheet" href="/s.css">'
    '<link rel="ALTERNATE" hreflang=" FR " href="https://e.com/fr?a=1&amp;b=2">'
    '<link rel="alternate" type="application/rss+xml" href="/feed">'  # no hreflang
    '<link rel="alternate canonical" hreflang="de" href="https://e.com/de">'
    '<link rel="alternate" hreflang="fr" href="https://spam/fr2">'  # dup lang
    '<link rel="alternate" hreflang="x-default" href="https://e.com/">'
    '<link rel="alternate" hreflang="en">'  # no href
    "</head></html>"
)


def test_edge_semantics():
    rows = hreflang_edges(PAGE)
    assert [(r["lang"], r["href"], r["ordinal"]) for r in rows] == [
        ("fr", "https://e.com/fr?a=1&b=2", 0),  # case/trim + entity decode
        ("de", "https://e.com/de", 1),  # rel token list matches
        ("x-default", "https://e.com/", 2),
    ]


def test_empty_and_decoy_only():
    assert hreflang_edges("") == []
    assert hreflang_edges("<p>no links</p>") == []
    assert (
        hreflang_edges('<script>"<link rel=alternate hreflang=q href=h>"</script>')
        == []
    )


def test_spark_cluster_key_and_plan(spark):
    # two consistent clusters: every member declares the same set, so
    # cluster_key (min href) agrees across members with no join
    def page(*hrefs):
        return "".join(
            f'<link rel="alternate" hreflang="l{i}" href="{h}">'
            for i, h in enumerate(hrefs)
        )

    rows = [
        ("a", page("https://x/en", "https://x/fr")),
        ("b", page("https://x/fr", "https://x/en")),  # order differs
        ("c", page("https://y/solo")),
        ("d", "<p>none</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = extract_hreflang(df)
    got = {(r["doc_id"], r["lang"]): r["cluster_key"] for r in out.collect()}
    assert got[("a", "l0")] == "https://x/en"
    assert got[("b", "l0")] == "https://x/en"  # same cluster label
    assert got[("c", "l0")] == "https://y/solo"
    assert not [k for k in got if k[0] == "d"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
