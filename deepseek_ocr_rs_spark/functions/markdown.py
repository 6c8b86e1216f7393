"""Markdown assembly + span-offset bookkeeping.

Mirrors the reference's layout-token assembly: row-break/separator injection
(model/mod.rs:590-602, 451-465) and the placeholder-count offset arithmetic
(model/mod.rs:2605-2689).  Content blocks are rendered to markdown in
document order, joined with a blank line, and every block's exact character
range inside the final string is recorded as a span.  Offsets are computed
*after* per-block normalization, so they always refer to the final
normalized text (the reference normalizes before emitting offsets:
model/mod.rs:2446).

Span kinds: 'heading' | 'list' | 'table' | 'code' | 'quote' | 'content'.
The FIXTURES.md §3 invariant "sum of span lengths" is over ALL spans (each
block is content); gaps between spans are exactly the '\n\n' separators.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from deepseek_ocr_rs_spark.functions.dom import Block

BLOCK_SEP = "\n\n"

_HEADING_PREFIX = {f"h{i}": "#" * i + " " for i in range(1, 7)}


def render_block_md(tag: str, text: str) -> Tuple[str, str]:
    """(markdown_rendering, span_kind) for one normalized block text."""
    if tag in _HEADING_PREFIX:
        return _HEADING_PREFIX[tag] + text, "heading"
    if tag == "li":
        return "- " + text, "list"
    if tag == "tr":
        return "| " + text + " |", "table"
    if tag == "pre":
        return "```\n" + text + "\n```", "code"
    if tag == "blockquote":
        return "> " + text, "quote"
    return text, "content"


def render_blocks(blocks: Sequence[Block]) -> Tuple[str, str, List[Dict], int, int]:
    """Assemble kept blocks.

    Returns (text_md, text_plain, spans, n_blocks, n_chars) where spans are
    dicts {start, end, kind, block_idx} indexing into text_md, sorted by
    start, non-overlapping, 0 <= start < end <= len(text_md).
    """
    md_parts: List[str] = []
    plain_parts: List[str] = []
    spans: List[Dict] = []
    pos = 0
    for out_idx, b in enumerate(blocks):
        rendered, kind = render_block_md(b.tag, b.text)
        if md_parts:
            pos += len(BLOCK_SEP)
        start = pos
        pos += len(rendered)
        # block_idx indexes the *kept* (content) sequence — the document-order
        # position in the final extraction, not the raw DOM array
        spans.append(
            {"start": start, "end": pos, "kind": kind, "block_idx": out_idx}
        )
        md_parts.append(rendered)
        plain_parts.append(b.text)
    text_md = BLOCK_SEP.join(md_parts)
    text_plain = "\n".join(plain_parts)
    return text_md, text_plain, spans, len(md_parts), len(text_md)
