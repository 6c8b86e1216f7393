"""PDF layout-block parsing and reading-order reconstruction.

The reference turns a 2-D tile grid into a 1-D token sequence in row-major
order with explicit row breaks (vision/preprocess.rs:119-127,
model/mod.rs:590-602).  The PDF analog: payloads are JSON-in-string
``{"kind":"pdf","pages":[{"page":N,"blocks":[{"x","y","w","h","font",
"text"}]}]}`` with blocks in *shuffled* order; we restore deterministic
reading order, then classify:

  drop   empty text; pure page-furniture (digit-only strings, e.g. page
         numbers) and tiny-font blocks (font <= FOOTER_FONT_MAX)
  h1     font >= H1_FONT_MIN
  h2     font >= H2_FONT_MIN
  p      otherwise

Reading order:

* pages with full geometry (every block has ``w > 0`` and ``h > 0``) go
  through recursive **XY-cut** (Nagy & Seth 1984): repeatedly split the
  block set at the single widest empty band — across (horizontal cut,
  top before bottom) or down (vertical cut, left before right) — and
  recurse; a region with no empty band is a leaf sorted by
  ``(y, x, font, text)``.  The widest-gap-first rule is what makes
  multi-column pages come out column-major: the column gutter is wider
  than the line spacing, so the vertical cut wins before any horizontal
  cut can interleave the columns.  A plain ``(y, x)`` sort reads a
  two-column page as ``L1 R1 L2 R2 ...`` — wrong.
* pages with any degenerate box (missing/zero ``w`` or ``h``) fall back
  to the flat total sort ``(y, x, font, text)`` — there is no geometry
  to cut on, and the fallback keeps point-block payloads byte-stable.

Both orders are shuffle-invariant: splits depend only on coordinates and
leaves use a total sort, so the result is independent of payload block
order.  Returned as dom.Block objects so markdown assembly and span
bookkeeping are shared with the HTML path (U3 ordered union of per-view
extractions).
"""

from __future__ import annotations

import json
from typing import List, Optional, Tuple

from deepseek_ocr_rs_spark.functions.dom import Block
from deepseek_ocr_rs_spark.functions.normalize import normalize_text

FOOTER_FONT_MAX = 7.0
H1_FONT_MIN = 20.0
H2_FONT_MIN = 15.0

# (x, y, w, h, font, text) — parse order; xy-cut works on these tuples
_Box = Tuple[float, float, float, float, float, str]


def _widest_gap(intervals: List[Tuple[float, float]]) -> Tuple[float, float]:
    """(gap_width, cut_position) of the widest empty band between the merged
    ``[lo, hi)`` intervals; (0, 0) when they tile without a gap.  Ties keep
    the first (lowest-coordinate) gap — deterministic."""
    ivs = sorted(intervals)
    best_w, best_at, hi = 0.0, 0.0, ivs[0][1]
    for lo, h in ivs[1:]:
        if lo > hi:
            gap = lo - hi
            if gap > best_w:
                best_w, best_at = gap, hi
        if h > hi:
            hi = h
    return best_w, best_at


def _leaf_key(b: _Box):
    return (b[1], b[0], b[4], b[5])


def xy_cut_order(boxes: List[_Box]) -> List[_Box]:
    """Recursive XY-cut reading order (see module docstring).  Pure and
    deterministic; input order never matters.  Implemented as an explicit
    work stack with a direct two-box path — the recursion bottoms out in
    tiny groups, so per-call list building dominates a naive version."""
    out: List[_Box] = []
    stack = [boxes]
    while stack:
        grp = stack.pop()
        n = len(grp)
        if n == 1:
            out.append(grp[0])
            continue
        if n == 2:
            a, b = grp
            gy = max(a[1], b[1]) - min(a[1] + a[3], b[1] + b[3])
            gx = max(a[0], b[0]) - min(a[0] + a[2], b[0] + b[2])
            if gy <= 0.0 and gx <= 0.0:
                out.extend(sorted(grp, key=_leaf_key))
            elif gy >= gx:  # ties prefer the horizontal cut
                out.extend(grp if a[1] + a[3] <= b[1] + b[3] else [b, a])
            else:
                out.extend(grp if a[0] + a[2] <= b[0] + b[2] else [b, a])
            continue
        gy, cy = _widest_gap([(b[1], b[1] + b[3]) for b in grp])
        gx, cx = _widest_gap([(b[0], b[0] + b[2]) for b in grp])
        if gy <= 0.0 and gx <= 0.0:
            out.extend(sorted(grp, key=_leaf_key))
            continue
        # widest gap wins; ties prefer the horizontal cut (top-to-bottom)
        if gy >= gx:
            first = [b for b in grp if b[1] + b[3] <= cy]
            rest = [b for b in grp if b[1] + b[3] > cy]
        else:
            first = [b for b in grp if b[0] + b[2] <= cx]
            rest = [b for b in grp if b[0] + b[2] > cx]
        stack.append(rest)   # LIFO: first is processed before rest
        stack.append(first)
    return out


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
    by_page: dict[int, List[_Box]] = {}
    for page in doc.get("pages", []) or []:
        pno = int(page.get("page", 0))
        by_page.setdefault(pno, []).extend(
            (
                float(blk.get("x", 0.0)),
                float(blk.get("y", 0.0)),
                float(blk.get("w", 0.0)),
                float(blk.get("h", 0.0)),
                float(blk.get("font", 10.0)),
                str(blk.get("text", "")),
            )
            for blk in page.get("blocks", []) or []
        )
    blocks: List[Block] = []
    for pno in sorted(by_page):
        boxes = by_page[pno]
        if boxes and all(b[2] > 0.0 and b[3] > 0.0 for b in boxes):
            ordered = xy_cut_order(boxes)
        else:  # degenerate geometry: flat total sort (see module docstring)
            ordered = sorted(boxes, key=lambda b: (b[1], b[0], b[4], b[5]))
        for _x, _y, _w, _h, font, raw in ordered:
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
            blocks.append(Block(tag=tag, depth=pno, block_idx=len(blocks),
                                text=text))
    return blocks
