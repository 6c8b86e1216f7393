"""Page-metadata extraction: title, meta tags, canonical link, html lang.

Trafilatura-class extractors surface a document's *metadata* alongside its
main content — the ``<title>``, ``<meta name=description/author>``,
OpenGraph ``<meta property=og:*>`` properties, the ``<link rel=canonical>``
target, and the ``<html lang>`` declaration.  The reference's extraction
surface is content-only (crates/core: markdown + spans per page); this
module adds the metadata plane a web corpus needs for dedup keys
(canonical URL), language routing (lang + description), and provenance
(title/author).

Design:

* :func:`page_metadata` — a PURE event-stream fold (no Spark): walks the
  repo's streaming-tokenizer events once and captures each field at its
  FIRST occurrence (browser/Trafilatura semantics; later duplicates are
  spam-prone).  Decoys cannot leak in because the tokenizer itself drops
  comments and consumes script/style as rawtext — a ``<meta>`` inside a
  comment or a ``<title>`` inside a script never becomes an open event.
* :func:`extract_page_metadata` — Arrow-batched pandas UDF over that fold,
  returning one struct column; the caller flattens and composes with
  ``operators/urls.canonical_url_col`` when normalized URLs are wanted.

Semantics (pinned by tests/test_metadata.py and the gate oracle):

1. first ``<title>`` wins; its text is entity-decoded and
   whitespace-collapsed (``" ".join(s.split())``),
2. ``meta[name=...]`` and ``meta[property=...]`` match case-insensitively
   on the name/property VALUE; the content attribute is entity-decoded;
   a meta without content is ignored (it must not consume the
   first-occurrence slot),
3. ``link[rel~=canonical]`` matches rel as a whitespace-separated,
   case-insensitive token list (``rel="canonical alternate"`` counts);
   href is entity-decoded, kept raw (normalization is a separate,
   composable step),
4. ``html[lang]`` is lowercased and trimmed,
5. absent fields are NULL, never ''.

Scale notes (100 TB / 1000 executors): one tokenizer pass per payload
inside the Arrow batch — embarrassingly parallel, no shuffle; the fold
short-circuits once every field is filled, so a huge body after a
complete <head> costs only the scan to the point of completion... (in
fact we stop feeding events as soon as all slots are filled).  The
payload column is projected away immediately after the UDF, so downstream
exchanges carry only short metadata strings.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["page_metadata", "extract_page_metadata", "METADATA_FIELDS"]

# struct field order (stable — the gate schema depends on it)
METADATA_FIELDS = (
    "title",
    "description",
    "author",
    "og_title",
    "og_url",
    "canonical_href",
    "html_lang",
    "meta_robots",
)

_META_NAME_FIELDS = {
    "description": "description",
    "author": "author",
    "robots": "meta_robots",
}
_META_PROP_FIELDS = {"og:title": "og_title", "og:url": "og_url"}


def page_metadata(events: Iterable) -> dict:
    """Fold a tokenizer event stream into the first-occurrence metadata.

    Pure function of the event stream: feeding chunked-tokenizer events
    and whole-document events gives identical results (X5 invariant).
    """
    from deepseek_ocr_rs_spark.functions.tokenizer import decode_entities

    out: dict = {f: None for f in METADATA_FIELDS}
    unfilled = len(METADATA_FIELDS)
    title_parts: Optional[list] = None  # non-None while inside first <title>
    title_taken = False

    for ev in events:
        kind = ev[0]
        if kind == "text":
            if title_parts is not None:
                title_parts.append(ev[1])
            continue
        tag = ev[1]
        if kind == "close":
            if title_parts is not None and tag == "title":
                text = " ".join("".join(title_parts).split())
                title_parts = None
                if out["title"] is None and text:
                    out["title"] = text
                    unfilled -= 1
                    if unfilled == 0:
                        break
            continue
        # open events
        if tag == "title":
            if not title_taken:
                title_taken = True
                title_parts = []
            continue
        if tag == "meta":
            attrs = ev[2]
            content = attrs.get("content")
            if content is None:
                continue  # rule 2: never consumes the slot
            key = attrs.get("name", "").lower()
            field = _META_NAME_FIELDS.get(key)
            if field is None:
                key = attrs.get("property", "").lower()
                field = _META_PROP_FIELDS.get(key)
            if field is not None and out[field] is None:
                out[field] = decode_entities(content)
                unfilled -= 1
                if unfilled == 0:
                    break
            continue
        if tag == "link":
            attrs = ev[2]
            rel = attrs.get("rel", "")
            href = attrs.get("href")
            if (
                href
                and out["canonical_href"] is None
                and "canonical" in rel.lower().split()
            ):
                out["canonical_href"] = decode_entities(href)
                unfilled -= 1
                if unfilled == 0:
                    break
            continue
        if tag == "html":
            lang = ev[2].get("lang", "").strip().lower()
            if lang and out["html_lang"] is None:
                out["html_lang"] = lang
                unfilled -= 1
                if unfilled == 0:
                    break
    return out


def _metadata_batches(texts: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    from deepseek_ocr_rs_spark.functions.tokenizer import tokenize_html_fast

    cols = list(METADATA_FIELDS)
    for ser in texts:
        rows = []
        for payload in ser:
            if payload:
                rows.append(page_metadata(tokenize_html_fast(payload)))
            else:
                rows.append({f: None for f in cols})
        yield pd.DataFrame(rows, columns=cols)


def extract_page_metadata(
    df: DataFrame, text_col: str = "text", out_col: str = "page_meta"
) -> DataFrame:
    """Add ``out_col`` struct<title,description,author,og_title,og_url,
    canonical_href,html_lang> extracted from the HTML payload column."""
    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    schema = ", ".join(f"{f} string" for f in METADATA_FIELDS)
    udf = F.pandas_udf(_metadata_batches, f"struct<{schema}>")
    # the tokenizer fold is CPU-bound; a single-split local scan would
    # run it on one core (no-op at cluster scale)
    return rebalance_for_arrow(df).withColumn(out_col, udf(F.col(text_col)))


def robots_noindex_col(robots) -> "F.Column":
    """meta-robots content -> true iff indexing is forbidden.

    The directive value is a comma-separated token list; ``noindex`` or
    the shorthand ``none`` (== noindex,nofollow) forbids indexing,
    case-insensitively with arbitrary whitespace around tokens.  A
    missing/empty tag means indexable — the web's default — so NULL maps
    to false.  ``nofollow`` alone does NOT suppress the page (it only
    gates link extraction).  Pure Column (codegen); the SQL replica is
    :func:`robots_noindex_sql`.
    """
    toks = F.split(F.lower(F.coalesce(robots, F.lit(""))), ",")
    return F.exists(toks, lambda t: F.trim(t).isin("noindex", "none"))


def robots_noindex_sql(expr: str) -> str:
    """DuckDB replica of :func:`robots_noindex_col` over SQL ``expr``."""
    return (
        f"len(list_filter(str_split(lower(coalesce({expr}, '')), ','), "
        "t -> trim(t) IN ('noindex', 'none'))) > 0"
    )
