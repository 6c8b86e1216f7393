"""Sitemap parsing: URL discovery from sitemap.xml / sitemap-index files.

Crawl frontiers are seeded from sitemaps (sitemaps.org protocol): a
``<urlset>`` of ``<url><loc/><lastmod/><priority/><changefreq/></url>``
entries, or a ``<sitemapindex>`` of ``<sitemap><loc/><lastmod/></sitemap>``
pointers to further sitemaps.  This module turns a column of sitemap XML
bodies into one row per discovered entry, preserving in-file order.

The parser is the repo's own streaming byte tokenizer
(functions/tokenizer.py) — the same scanner the HTML extraction path uses
— NOT a regex and NOT a DOM library: XML tag/text events fall out of the
identical code path, so comment-wrapped decoy entries are structurally
invisible, ``&amp;`` entities inside ``<loc>`` decode with the shared
table, and hostile chunking cannot change the event stream (X5).

Semantics (pinned by tests/test_sitemaps.py and the gate oracle):

1. a ``<url>`` or ``<sitemap>`` container emits one row at its close tag;
   its kind is the container tag,
2. leaf values (``loc``, ``lastmod``, ``priority``, ``changefreq``) are
   entity-decoded, whitespace-trimmed text directly inside the leaf;
   the FIRST occurrence of a leaf inside a container wins,
3. a container without a non-empty ``<loc>`` is dropped (protocol: loc is
   required),
4. ``ordinal`` is the 0-based emit order of KEPT rows within one file,
5. text outside any leaf, XML declarations / processing instructions,
   comments, and unknown elements are ignored; containers never nest.

Scale notes (100 TB / 1000 executors): one Arrow-batched pass per sitemap
body — no shuffle; a sitemap is capped at 50k URLs / 50 MB by protocol, so
per-row work is bounded and the explode fans out to at most 50k short
rows per input row.  The XML column dies at the UDF projection; downstream
carries only (file id, kind, loc, lastmod, priority, ordinal).
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sitemap_entries", "parse_sitemaps"]

_CONTAINERS = frozenset({"url", "sitemap"})
_LEAVES = frozenset({"loc", "lastmod", "priority", "changefreq"})


def sitemap_entries(xml: str) -> List[dict]:
    """Pure parse of one sitemap body -> list of entry dicts (no Spark)."""
    from deepseek_ocr_rs_spark.functions.tokenizer import (
        escape_cdata,
        tokenize_html_fast,
    )

    xml = escape_cdata(xml)  # CDATA-wrapped <loc> surfaces as text
    rows: List[dict] = []
    container = None  # 'url' | 'sitemap' while inside one
    leaf = None
    buf: List[str] = []
    vals: dict = {}
    for ev in tokenize_html_fast(xml):
        kind = ev[0]
        if kind == "text":
            if leaf is not None:
                buf.append(ev[1])
            continue
        tag = ev[1]
        if kind == "open":
            if container is None:
                if tag in _CONTAINERS:
                    container = tag
                    vals = {}
                    leaf = None
            elif tag in _LEAVES:
                leaf = tag
                buf = []
            continue
        # close
        if container is None:
            continue
        if leaf is not None and tag == leaf:
            if leaf not in vals:  # rule 2: first occurrence wins
                vals[leaf] = "".join(buf).strip()
            leaf = None
        elif tag == container:
            loc = vals.get("loc")
            if loc:  # rule 3: loc required
                rows.append(
                    {
                        "kind": container,
                        "loc": loc,
                        # empty leaves (e.g. self-closing <lastmod/>)
                        # normalize to NULL, never ''
                        "lastmod": vals.get("lastmod") or None,
                        "priority": vals.get("priority") or None,
                        "changefreq": vals.get("changefreq") or None,
                        "ordinal": len(rows),
                    }
                )
            container = None
            leaf = None
    return rows


def _sitemap_batches(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for ser in texts:
        out = []
        for payload in ser:
            out.append(sitemap_entries(payload) if payload else [])
        yield pd.Series(out)


_ENTRY_DDL = (
    "array<struct<kind string, loc string, lastmod string, "
    "priority string, changefreq string, ordinal int>>"
)


def parse_sitemaps(
    df: DataFrame, xml_col: str = "text", id_cols: tuple = ("doc_id",)
) -> DataFrame:
    """Explode sitemap bodies into one row per discovered entry.

    Returns ``id_cols + (kind, loc, lastmod, priority, changefreq,
    ordinal)``; files with zero kept entries contribute zero rows.
    """
    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    udf = F.pandas_udf(_sitemap_batches, _ENTRY_DDL)
    # single-split local scans starve the parser pass (no-op at scale)
    entries = rebalance_for_arrow(df.select(*id_cols, xml_col)).select(
        *id_cols, udf(F.col(xml_col)).alias("_entries")
    )
    # explode_outer, NOT explode: the non-outer form makes Catalyst push
    # an implicit `size(_entries) > 0` filter below the Generate, and
    # because _entries is the pandas-UDF output the parser would run
    # TWICE per row (one ArrowEvalPython for the filter, one for the
    # projection).  Outer explode keeps one UDF pass; placeholder rows
    # from empty files drop in the JVM-side null filter (plan pinned by
    # tests/test_sitemaps_frontier.py).
    e = F.explode_outer("_entries")
    return (
        entries.select(*id_cols, e.alias("_e"))
        .where(F.col("_e").isNotNull())
        .select(
            *id_cols,
            F.col("_e.kind").alias("kind"),
            F.col("_e.loc").alias("loc"),
            F.col("_e.lastmod").alias("lastmod"),
            F.col("_e.priority").alias("priority"),
            F.col("_e.changefreq").alias("changefreq"),
            F.col("_e.ordinal").alias("ordinal"),
        )
    )
