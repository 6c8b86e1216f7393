"""Sitemap parsing + frontier politeness scheduling."""

import pytest

from deepseek_ocr_rs_spark.operators.frontier import schedule_frontier
from deepseek_ocr_rs_spark.operators.sitemaps import (
    parse_sitemaps,
    sitemap_entries,
)


def test_urlset_basic_order_and_fields():
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc> https://e.com/a?x=1&amp;y=2 </loc>"
        "<lastmod>2024-01-02</lastmod><priority>0.8</priority></url>"
        "<url><loc>https://e.com/b</loc><changefreq>daily</changefreq></url>"
        "</urlset>"
    )
    rows = sitemap_entries(xml)
    assert rows == [
        {
            "kind": "url",
            "loc": "https://e.com/a?x=1&y=2",  # entity-decoded, trimmed
            "lastmod": "2024-01-02",
            "priority": "0.8",
            "changefreq": None,
            "ordinal": 0,
        },
        {
            "kind": "url",
            "loc": "https://e.com/b",
            "lastmod": None,
            "priority": None,
            "changefreq": "daily",
            "ordinal": 1,
        },
    ]


def test_sitemapindex_kind():
    xml = (
        "<sitemapindex><sitemap><loc>https://e.com/s1.xml</loc>"
        "<lastmod>2024-03-01</lastmod></sitemap></sitemapindex>"
    )
    (row,) = sitemap_entries(xml)
    assert row["kind"] == "sitemap"
    assert row["loc"] == "https://e.com/s1.xml"
    assert row["lastmod"] == "2024-03-01"


def test_decoys_missing_loc_and_first_leaf_wins():
    xml = (
        "<urlset>"
        "<!-- <url><loc>https://decoy.example/x</loc></url> -->"
        "<url><lastmod>2024-01-01</lastmod></url>"  # no loc: dropped
        "<url><loc>https://e.com/first</loc><loc>https://e.com/second</loc>"
        "</url>"
        "<url><loc/></url>"  # self-closing/empty loc: dropped
        "<url><loc>https://e.com/kept</loc><priority/></url>"
        "</urlset>"
    )
    rows = sitemap_entries(xml)
    assert [r["loc"] for r in rows] == [
        "https://e.com/first",
        "https://e.com/kept",
    ]
    assert rows[0]["ordinal"] == 0 and rows[1]["ordinal"] == 1
    assert rows[1]["priority"] is None  # empty leaf normalizes to NULL


def test_stray_text_and_unknown_elements_ignored():
    xml = (
        "<urlset>junk text<url>noise<loc>https://e.com/a</loc>"
        "<unknown>zzz</unknown>more noise</url>trailing</urlset>"
    )
    (row,) = sitemap_entries(xml)
    assert row["loc"] == "https://e.com/a"


def test_empty_and_garbage_bodies():
    assert sitemap_entries("") == []
    assert sitemap_entries("not xml at all") == []
    assert sitemap_entries("<urlset><url><loc>") == []  # torn at EOF


def test_parse_sitemaps_spark_and_partitioning(spark):
    rows = [
        ("a", "<urlset><url><loc>https://e.com/1</loc></url>"
              "<url><loc>https://e.com/2</loc></url></urlset>"),
        ("b", "<urlset></urlset>"),
        ("c", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = parse_sitemaps(df).collect()
    assert sorted((r["doc_id"], r["loc"], r["ordinal"]) for r in out) == [
        ("a", "https://e.com/1", 0),
        ("a", "https://e.com/2", 1),
    ]
    repart = parse_sitemaps(df.repartition(5, "doc_id")).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, repart))
    # exactly ONE UDF pass: non-outer explode would push a size()>0
    # filter below the Generate and evaluate the parser twice per row
    plan = parse_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan


def test_frontier_waves_priority_ties_and_cap(spark):
    rows = [
        # host h1: priorities 9,9,5 -> tie on 9 breaks by id asc
        ("u1", "h1", 9), ("u2", "h1", 9), ("u3", "h1", 5),
        # host h2: single url
        ("u4", "h2", 1),
    ]
    df = spark.createDataFrame(rows, "url_id string, host string, priority int")
    out = {
        r["url_id"]: (r["wave"], r["eta_s"])
        for r in schedule_frontier(df, per_host_delay_s=7).collect()
    }
    assert out == {
        "u1": (0, 0),
        "u2": (1, 7),
        "u3": (2, 14),
        "u4": (0, 0),
    }
    capped = schedule_frontier(df, per_host_delay_s=7, max_per_host=2)
    kept = {r["url_id"] for r in capped.collect()}
    assert kept == {"u1", "u2", "u4"}  # u3 beyond the per-host budget


def test_frontier_single_exchange_plan(spark):
    df = spark.createDataFrame(
        [("u1", "h1", 1)], "url_id string, host string, priority int"
    )
    plan = (
        schedule_frontier(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # exactly the host hash partition


def test_cdata_wrapped_loc():
    from deepseek_ocr_rs_spark.operators.sitemaps import sitemap_entries

    rows = sitemap_entries(
        "<urlset><url><loc><![CDATA[https://e.com/x?a=1&b>2]]></loc>"
        "</url></urlset>"
    )
    assert [r["loc"] for r in rows] == ["https://e.com/x?a=1&b>2"]
