"""hreflang alternate-language clusters.

Multilingual sites declare their translation sets with
``<link rel="alternate" hreflang="fr" href="...">`` — the cluster a
page belongs to.  A 100 TB dedup tier needs these edges: declared
translations are *expected* to be near-duplicates in structure and
must not be collapsed by near-dup pruning, while two pages claiming
the same cluster slot (same lang, same cluster) are spam signals.

* :func:`hreflang_edges` — PURE fold over the streaming-tokenizer
  events (comment/script decoys structurally invisible, entities in
  href decode through the shared table): one edge per alternate link
  that carries BOTH hreflang and href; rel matches as a
  whitespace-separated case-insensitive token list; first occurrence
  per lang wins (duplicate lang slots are the spam case — kept out);
  ``x-default`` is a normal lang value; lang lowercased/trimmed.
* :func:`extract_hreflang` — Arrow-batched explode to one row per
  edge with in-document ordinals, plus a ``cluster_key`` = the
  lexicographic MIN href among the document's declared set — a
  deterministic cluster label that every member of a consistent
  cluster agrees on without any join or connected-components pass.

Scale shape: one Arrow pass per page, explode_outer + null filter (a
single ArrowEvalPython — same discipline as the sitemap/feed/outlink
parsers), no shuffle; downstream grouping by cluster_key is one hash
aggregate.

Reference analog: the reference renders one logical document through
multiple template styles and keys them by content digest
(benchsuite fixture matrix); hreflang is the web's declared version
of that same one-content-many-renderings relation.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hreflang_edges", "extract_hreflang"]


def hreflang_edges(html: str) -> List[dict]:
    """Pure parse of one page -> list of {lang, href, ordinal} dicts."""
    from deepseek_ocr_rs_spark.functions.tokenizer import (
        decode_entities,
        tokenize_html_fast,
    )

    rows: List[dict] = []
    seen_langs = set()
    for ev in tokenize_html_fast(html):
        if ev[0] != "open" or ev[1] != "link":
            continue
        attrs = ev[2]
        if "alternate" not in attrs.get("rel", "").lower().split():
            continue
        lang = attrs.get("hreflang", "").strip().lower()
        href = attrs.get("href")
        if not lang or not href or lang in seen_langs:
            continue
        seen_langs.add(lang)
        rows.append(
            {
                "lang": lang,
                "href": decode_entities(href),
                "ordinal": len(rows),
            }
        )
    return rows


def _hreflang_batches(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for ser in texts:
        yield pd.Series(
            [hreflang_edges(payload) if payload else [] for payload in ser]
        )


_EDGE_DDL = "array<struct<lang string, href string, ordinal int>>"


def extract_hreflang(
    df: DataFrame, text_col: str = "text", id_cols: tuple = ("doc_id",)
) -> DataFrame:
    """Explode pages into hreflang edges + a per-document cluster key.

    Returns ``id_cols + (lang, href, ordinal, cluster_key)`` where
    cluster_key = min href over the page's declared set (all members
    of a consistent cluster agree on it — no join needed).  Pages with
    no hreflang links contribute zero rows.
    """
    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    udf = F.pandas_udf(_hreflang_batches, _EDGE_DDL)
    # single-split local scans starve the parser pass (no-op at scale)
    entries = rebalance_for_arrow(df.select(*id_cols, text_col)).select(
        *id_cols, udf(F.col(text_col)).alias("_edges")
    )
    # explode_outer + null filter: one ArrowEvalPython (see feeds.py)
    e = F.explode_outer("_edges")
    return (
        entries.select(
            *id_cols,
            F.array_min("_edges.href").alias("cluster_key"),
            e.alias("_e"),
        )
        .where(F.col("_e").isNotNull())
        .select(
            *id_cols,
            F.col("_e.lang").alias("lang"),
            F.col("_e.href").alias("href"),
            F.col("_e.ordinal").alias("ordinal"),
            "cluster_key",
        )
    )
