"""Registrable domains + blocklist filtering (operators/domains.py)."""

import duckdb
import pytest

from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.domains import (
    filter_blocklisted,
    host_suffix_chain,
    registrable_domain_col,
    registrable_domain_sql,
)

HOSTS = [
    "a.b.example.co.uk",   # multi-level public suffix, deep subdomain
    "example.co.uk",       # exactly registrable
    "co.uk",               # the public suffix itself -> unchanged
    "www2.example.com",
    "example.com",
    "localhost",           # no dot -> unchanged
    "deep.x.y.z.site.org",
    "uk",
    "cdn.site.org",
    "s3.amazonaws.com",
    None,                  # NULL propagates
    "b.co.jp",
    "x.com.au",
    "a..b.com",            # empty label from consecutive dots
]

EXPECTED = {
    "a.b.example.co.uk": "example.co.uk",
    "example.co.uk": "example.co.uk",
    "co.uk": "co.uk",
    "www2.example.com": "example.com",
    "example.com": "example.com",
    "localhost": "localhost",
    "deep.x.y.z.site.org": "site.org",
    "uk": "uk",
    "cdn.site.org": "site.org",
    "s3.amazonaws.com": "amazonaws.com",
    None: None,
    "b.co.jp": "b.co.jp",   # own suffix IS public: nothing below it
    "x.com.au": "x.com.au",
    "a..b.com": "b.com",
}


def test_registrable_domain_values(spark):
    df = spark.createDataFrame([(h,) for h in HOSTS], "host string")
    got = {
        r["host"]: r["dom"]
        for r in df.select(
            "host", registrable_domain_col(F.col("host")).alias("dom")
        ).collect()
    }
    assert got == EXPECTED


def test_registrable_domain_cross_engine_parity(spark):
    df = spark.createDataFrame([(h,) for h in HOSTS], "host string")
    got = [
        r[0]
        for r in df.select(registrable_domain_col(F.col("host"))).collect()
    ]
    con = duckdb.connect()
    exp = [
        con.execute(
            f"SELECT {registrable_domain_sql('?')}", [h]
        ).fetchone()[0]
        for h in HOSTS
    ]
    assert got == exp


def test_suffix_chain_shape(spark):
    df = spark.createDataFrame(
        [("a.b.example.co.uk",), ("uk",), ("x.y",)], "host string"
    )
    chains = [r[0] for r in df.select(host_suffix_chain(F.col("host"))).collect()]
    assert chains[0] == [
        "a.b.example.co.uk", "b.example.co.uk", "example.co.uk", "co.uk"
    ]
    assert chains[1] == ["uk"]          # single label: just itself
    assert chains[2] == ["x.y"]         # two labels: no 1-label suffixes


def test_filter_blocklisted_subdomain_semantics(spark):
    links = spark.createDataFrame(
        [(i, h) for i, h in enumerate(HOSTS) if h], "id int, host string"
    )
    bl = spark.createDataFrame(
        [("example.co.uk",), ("site.org",), ("amazonaws.com",)],
        "domain string",
    )
    kept = sorted(r["host"] for r in filter_blocklisted(links, bl).collect())
    # blocked: a.b.example.co.uk, example.co.uk (exact), both site.org
    # subdomains, s3.amazonaws.com; NOT co.uk (parent of a blocked entry)
    assert kept == sorted(
        ["co.uk", "www2.example.com", "example.com", "localhost", "uk",
         "b.co.jp", "x.com.au", "a..b.com"]
    )


def test_filter_blocklisted_keeps_duplicates_and_columns(spark):
    links = spark.createDataFrame(
        [(1, "ok.com", "x"), (1, "ok.com", "x"), (2, "bad.org", "y")],
        "id int, host string, extra string",
    )
    bl = spark.createDataFrame([("bad.org",)], "domain string")
    out = filter_blocklisted(links, bl)
    assert out.columns == ["host", "id", "extra"] or set(out.columns) == {
        "id", "host", "extra"
    }
    rows = [tuple(r) for r in out.select("id", "host", "extra").collect()]
    assert sorted(rows) == [(1, "ok.com", "x"), (1, "ok.com", "x")]


def test_empty_blocklist_is_identity(spark):
    links = spark.createDataFrame([(1, "a.com")], "id int, host string")
    bl = spark.createDataFrame([], "domain string")
    assert filter_blocklisted(links, bl).count() == 1
