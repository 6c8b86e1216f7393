"""RSS / Atom feed parsing: URL discovery from syndication feeds.

Feeds are the third discovery channel next to sitemaps and outlinks:
most actively-updated sites publish one, and a recrawl that reads
feeds first finds fresh URLs days before a link-walk would.  This
turns a column of feed XML bodies into one row per entry, using the
repo's own streaming tokenizer (functions/tokenizer.py) — the same
scanner as the HTML extraction path and the sitemap parser, NOT a
regex or DOM library, so comment-wrapped decoys are structurally
invisible and entities decode through the shared table.

Semantics (pinned by tests/test_feeds.py and the gate oracle):

1. a row per ``<item>`` (RSS) or ``<entry>`` (Atom) container, emitted
   at its close tag; the container tag alone decides ``feed_type`` —
   no document-level state, so a truncated or root-less feed still
   parses;
2. RSS url = ``<link>`` text, falling back to ``<guid>`` text.  The
   HTML tokenizer treats ``link`` as a void tag (synthetic immediate
   close), so the url text *follows* the first close event — the
   parser ignores exactly one synthetic close and then captures text
   until the real close or the next tag;
3. Atom url = the first ``<link href=...>`` whose ``rel`` is absent or
   ``alternate`` (``rel="self"`` / ``enclosure`` decoys skipped),
   falling back to ``<id>`` text;
4. ``title`` is entity-decoded trimmed text, first occurrence wins;
   ``published`` is the raw trimmed ``<pubDate>`` (RSS) / ``<updated>``
   (Atom) string — date-format normalization is downstream's job;
5. entries without a url are dropped; empty leaf values normalize to
   NULL; ``ordinal`` is the 0-based emit order of KEPT rows per file;
   containers never nest.

Scale shape (100 TB / 1000 executors): one Arrow-batched pass per feed
body, no shuffle; feeds are small by convention (~50-500 entries), so
the explode fan-out is bounded and the XML column dies at the UDF
projection — only (id, feed_type, url, title, published, ordinal)
travel downstream into the frontier join.

Reference analog: the reference's prompt-source layer accepts several
input containers behind one surface (crates/server/src/generation.rs
prompt assembly); feeds/sitemaps/outlinks are the same
many-containers-one-frontier discipline for crawl discovery.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["feed_entries", "parse_feeds"]

_CONTAINERS = frozenset({"item", "entry"})
_TEXT_LEAVES = frozenset({"title", "guid", "pubdate", "id", "updated"})
_LINK_RELS_KEPT = frozenset({"", "alternate"})


def feed_entries(xml: str) -> List[dict]:
    """Pure parse of one feed body -> list of entry dicts (no Spark)."""
    from deepseek_ocr_rs_spark.functions.tokenizer import (
        decode_entities,
        escape_cdata,
        tokenize_html_fast,
    )

    xml = escape_cdata(xml)  # real feeds CDATA-wrap titles/links routinely
    rows: List[dict] = []
    container = None  # 'item' | 'entry' while inside one
    leaf = None
    buf: List[str] = []
    vals: dict = {}
    link_wait = False  # capturing RSS <link> text (rule 2)
    link_synth = False  # the void tag's synthetic close not yet seen
    link_buf: List[str] = []

    def _finish_link():
        nonlocal link_wait, link_synth
        if link_wait and "link_text" not in vals:
            text = "".join(link_buf).strip()
            if text:
                vals["link_text"] = text
        link_wait = False
        link_synth = False

    for ev in tokenize_html_fast(xml):
        kind = ev[0]
        if kind == "text":
            if leaf is not None:
                buf.append(ev[1])
            elif link_wait:
                link_buf.append(ev[1])
            continue
        tag = ev[1]
        if kind == "open":
            if container is None:
                if tag in _CONTAINERS:
                    container = tag
                    vals = {}
                    leaf = None
                    link_wait = link_synth = False
                continue
            _finish_link()  # any tag terminates a pending link capture
            if tag == "link":
                # attribute values come through the tokenizer RAW (text
                # events are decoded, attributes are not); XML mandates
                # '&amp;' escaping inside attributes, so a conformant
                # <link href="...?a=1&amp;b=2"/> needs decoding here —
                # same discipline as extract_hrefs (urls.py) and
                # hreflang_edges (hreflang.py)
                href = decode_entities((ev[2].get("href") or "")).strip()
                if href:
                    if (
                        ev[2].get("rel", "").strip().lower()
                        in _LINK_RELS_KEPT
                        and "link_href" not in vals
                    ):
                        vals["link_href"] = href
                elif "link_text" not in vals:
                    link_wait = True
                    link_synth = True
                    link_buf = []
            elif tag in _TEXT_LEAVES:
                leaf = tag
                buf = []
            continue
        # close
        if container is None:
            continue
        if tag == "link":
            if link_wait and link_synth:
                link_synth = False  # the void tag's synthetic close
            else:
                _finish_link()
            continue
        if leaf is not None and tag == leaf:
            if leaf not in vals:  # first occurrence wins
                vals[leaf] = "".join(buf).strip()
            leaf = None
        elif tag == container:
            _finish_link()
            if container == "item":
                feed_type = "rss"
                url = vals.get("link_text") or vals.get("guid")
                published = vals.get("pubdate")
            else:
                feed_type = "atom"
                url = vals.get("link_href") or vals.get("id")
                published = vals.get("updated")
            if url:
                rows.append(
                    {
                        "feed_type": feed_type,
                        "url": url,
                        "title": vals.get("title") or None,
                        "published": published or None,
                        "ordinal": len(rows),
                    }
                )
            container = None
            leaf = None
    return rows


def _feed_batches(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for ser in texts:
        yield pd.Series(
            [feed_entries(payload) if payload else [] for payload in ser]
        )


_ENTRY_DDL = (
    "array<struct<feed_type string, url string, title string, "
    "published string, ordinal int>>"
)


def parse_feeds(
    df: DataFrame, xml_col: str = "text", id_cols: tuple = ("doc_id",)
) -> DataFrame:
    """Explode feed bodies into one row per discovered entry.

    Returns ``id_cols + (feed_type, url, title, published, ordinal)``;
    files with zero kept entries contribute zero rows.
    """
    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    udf = F.pandas_udf(_feed_batches, _ENTRY_DDL)
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
    # tests/test_feeds.py).
    e = F.explode_outer("_entries")
    return (
        entries.select(*id_cols, e.alias("_e"))
        .where(F.col("_e").isNotNull())
        .select(
            *id_cols,
            F.col("_e.feed_type").alias("feed_type"),
            F.col("_e.url").alias("url"),
            F.col("_e.title").alias("title"),
            F.col("_e.published").alias("published"),
            F.col("_e.ordinal").alias("ordinal"),
        )
    )
