"""Anchor-text extraction and per-target aggregation.

Web-search and crawl-quality stacks treat the *text inside* ``<a>``
elements as a first-class signal: aggregated anchor text describes the
TARGET page better than the target's own content (the classic web-graph
relevance prior), and anchor-text distributions expose link spam.  The
reference's extraction pass already walks every anchor to score link
density (the link-character counting feeding its boilerplate classifier,
see crates/core layout scoring); this module surfaces the anchor's text
paired with its href — the (target, description) edge list — instead of
only the character count.

Capture contract (the oracle fixtures re-derive it by construction and
the pytest corpus pins it against hand-written HTML):

1. an anchor is an ``<a>`` open event carrying an ``href`` attribute;
   text events between it and its close accumulate regardless of
   intervening formatting tags (``<b>``, ``<span>``, ...) — their open/
   close events are ignored, their text is kept,
2. a new ``<a>`` open IMPLICITLY closes the current anchor (the HTML5
   tree builder forbids nested anchors; browsers do exactly this), and
   an href-less ``<a>`` still closes the current anchor but emits no
   pair itself,
3. end-of-document closes a dangling anchor (tolerant tail — a torn
   payload keeps the text seen so far),
4. anchor text is the concatenation of (already entity-decoded) text
   events, whitespace-collapsed ``" ".join(s.split())``; an anchor with
   no visible text yields the empty string (kept — image links and
   icon links are real and countable),
5. anchors inside comments / ``<script>`` / ``<style>`` structurally
   cannot leak: the streaming tokenizer never emits open events there.

Scale shape (100 TB / 1000 executors): one Arrow pass per payload (the
same tokenizer walk extraction already pays), href canonicalization as a
JVM ``transform`` lambda BEFORE the explode so dropped links never
become rows, and the per-target rollup is a two-phase hash aggregate on
``url_canon`` — high cardinality, map-side combinable.  The "most
common anchor per target" pick is a second tiny aggregate over
(target, anchor) counts, never a window over the raw edge list.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.urls import canonical_url_col

__all__ = ["extract_anchor_pairs", "anchor_outlinks", "anchor_stats"]

_PAIR_TYPE = "array<struct<href:string,anchor:string>>"


def _anchor_pairs(payload: str) -> list:
    """(href, collapsed anchor text) pairs in document order."""
    from deepseek_ocr_rs_spark.functions.tokenizer import (
        decode_entities,
        tokenize_html_fast,
    )

    pairs: list = []
    href = None  # raw href of the open anchor (None = not emitting)
    inside = False  # an <a> element is open (emitting or not)
    parts: list = []

    def _flush():
        nonlocal href, inside, parts
        if inside and href is not None:
            pairs.append((decode_entities(href), " ".join("".join(parts).split())))
        href, inside, parts = None, False, []

    for ev in tokenize_html_fast(payload):
        kind = ev[0]
        if kind == "text":
            if inside and href is not None:
                parts.append(ev[1])
        elif ev[1] == "a":
            if kind == "open":
                _flush()  # implicit close: nested <a> is impossible
                inside = True
                href = ev[2].get("href")
            else:
                _flush()
    _flush()  # tolerant tail: EOF closes a dangling anchor
    return pairs


def _anchor_batches(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for ser in texts:
        yield pd.Series(
            [_anchor_pairs(p) if p else [] for p in ser]
        )


def extract_anchor_pairs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``links array<struct<href,anchor>>`` per the capture contract."""
    udf = F.pandas_udf(_anchor_batches, _PAIR_TYPE)
    return df.withColumn("links", udf(F.col(text_col)))


def anchor_outlinks(
    df: DataFrame, id_col: str = "conv_id", text_col: str = "text"
) -> DataFrame:
    """(id, html) -> one row per kept link WITH its anchor text.

    Output ``(id_col, link_pos long, url_canon string, anchor string)``;
    ``link_pos`` is the 0-based ordinal among KEPT (absolute http/https)
    links in document order — same numbering rule as ``outlinks``.
    Canonicalization runs inside a ``transform`` lambda (codegen) and the
    keep-filter precedes the explode.  posexplode_outer for the same
    single-ArrowEvalPython reason documented in ``outlinks``.
    """
    # r06 kernel: the anchors already come out of a Python tokenizer
    # pass; canonicalizing there (the parity-pinned Python replica)
    # instead of an interpreted JVM transform removes the per-element
    # canonicalizer cost AND the explode stage (guide §4.2).
    import pandas as pd

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )
    from deepseek_ocr_rs_spark.operators.urls import canonicalize_url_py

    id_type = dict(df.dtypes)[id_col]

    def run(batches):
        for pdf in batches:
            ids, poss, urls, anchors = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[text_col]):
                pos = 0
                for href, anchor in (
                    _anchor_pairs(payload) if payload else []
                ):
                    c = canonicalize_url_py(href)
                    if c is None:
                        continue
                    ids.append(did)
                    poss.append(pos)
                    urls.append(c)
                    anchors.append(anchor)
                    pos += 1
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "link_pos": poss,
                    "url_canon": urls,
                    "anchor": anchors,
                }
            )

    return rebalance_for_arrow(df.select(id_col, text_col)).mapInPandas(
        run,
        schema=f"{id_col} {id_type}, link_pos long, url_canon string, "
               f"anchor string",
    )


def anchor_stats(links: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """Per-target anchor rollup: volume + the modal anchor text.

    Output ``(url_canon, n_links long, n_docs long, top_anchor string)``
    where ``top_anchor`` is the most frequent anchor string pointing at
    the target, ties broken toward the bytewise-smallest anchor (fully
    deterministic).  Two map-side-combinable aggregates; the argmax is a
    ``min(struct(-count, anchor))`` fold over the tiny per-target
    distinct-anchor table, so no window ever touches the edge list.
    """
    per_anchor = links.groupBy("url_canon", "anchor").agg(
        F.count("*").alias("cnt"),
        F.countDistinct(id_col).alias("docs"),
    )
    return per_anchor.groupBy("url_canon").agg(
        F.sum("cnt").cast("long").alias("n_links"),
        # n_docs must be distinct over the ORIGINAL edges; summing per-
        # anchor distinct counts would double-count a doc that links to
        # the same target under two different anchor texts.  Recompute
        # from the edge list via a join-free second agg below instead.
        F.min(
            F.struct((-F.col("cnt")).alias("neg"), F.col("anchor"))
        )["anchor"].alias("top_anchor"),
    ).join(
        links.groupBy("url_canon").agg(
            F.countDistinct(id_col).cast("long").alias("n_docs")
        ),
        "url_canon",
    ).select("url_canon", "n_links", "n_docs", "top_anchor")
