"""PDF layout-block parsing and reading-order reconstruction.

The reference turns a 2-D tile grid into a 1-D token sequence in row-major
order with explicit row breaks (vision/preprocess.rs:119-127,
model/mod.rs:590-602).  The PDF analog: payloads are JSON-in-string
``{"kind":"pdf","pages":[{"page":N,"blocks":[{"x","y","w","h","font",
"text"}]}]}`` with blocks in *shuffled* order; we restore deterministic
reading order by sorting on ``(page, y, x)`` (ties broken by the remaining
fields so the sort is total), then classify:

  drop   empty text; pure page-furniture (digit-only strings, e.g. page
         numbers) and tiny-font blocks (font <= FOOTER_FONT_MAX)
  h1     font >= H1_FONT_MIN
  h2     font >= H2_FONT_MIN
  p      otherwise

Returned as dom.Block objects so markdown assembly and span bookkeeping are
shared with the HTML path (U3 ordered union of per-view extractions).
"""

from __future__ import annotations

import json
from typing import List, Optional

from deepseek_ocr_rs_spark.functions.dom import Block
from deepseek_ocr_rs_spark.functions.normalize import normalize_text

FOOTER_FONT_MAX = 7.0
H1_FONT_MIN = 20.0
H2_FONT_MIN = 15.0


def looks_like_pdf(payload: str) -> bool:
    head = payload.lstrip()[:64]
    return head.startswith("{") and '"kind"' in payload[:256] and '"pdf"' in payload[:256]


def parse_pdf_payload(payload: str) -> Optional[List[Block]]:
    """Parse + order + classify. None when the JSON is malformed (-> quarantine)."""
    try:
        doc = json.loads(payload)
    except (ValueError, TypeError):
        return None
    if not isinstance(doc, dict) or doc.get("kind") != "pdf":
        return None
    rows = []
    for page in doc.get("pages", []) or []:
        pno = int(page.get("page", 0))
        for blk in page.get("blocks", []) or []:
            rows.append(
                (
                    pno,
                    float(blk.get("y", 0.0)),
                    float(blk.get("x", 0.0)),
                    float(blk.get("font", 10.0)),
                    str(blk.get("text", "")),
                )
            )
    # total order: (page, y, x, font, text) — deterministic under shuffling
    rows.sort(key=lambda r: (r[0], r[1], r[2], r[3], r[4]))
    blocks: List[Block] = []
    for pno, y, x, font, raw in rows:
        text = normalize_text(raw)
        if text == "":
            continue
        if text.isdigit():  # page furniture (page numbers)
            continue
        if font <= FOOTER_FONT_MAX:  # running headers/footers
            continue
        if font >= H1_FONT_MIN:
            tag = "h1"
        elif font >= H2_FONT_MIN:
            tag = "h2"
        else:
            tag = "p"
        blocks.append(Block(tag=tag, depth=pno, block_idx=len(blocks), text=text))
    return blocks
