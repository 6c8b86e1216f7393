"""Lightweight DOM-node array builder.

The reference segments a document into an ordered grid of views with explicit
layout/separator structure (crates/infer-deepseek/src/vision/preprocess.rs:
113-137, model/mod.rs:590-709).  The analog for HTML payloads is a flat,
document-ordered array of *block nodes* — one per block-level element — each
carrying the features the boilerplate classifier needs: tag, depth,
character count, link-character count, and whether it sits inside a
drop-subtree (nav/header/footer/aside/script/style).

Only a bounded HTML subset matters (FIXTURES.md §2): block containers
``html body div section article main ul ol table``, block leaves
``p h1..h6 li pre blockquote tr`` (cells joined with `` | ``), inline
``a b i em strong span code br``; everything else is treated as inline.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Iterable, List

from deepseek_ocr_rs_spark.functions.normalize import normalize_text
from deepseek_ocr_rs_spark.functions.tokenizer import Event

# subtrees whose entire content is structural boilerplate
DROP_SUBTREE_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "script", "style", "noscript",
     "template", "head", "title", "form", "button", "iframe", "svg"}
)

# block leaf tags: opening one starts a node, closing flushes it
BLOCK_LEAF_TAGS = frozenset(
    {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote", "tr"}
)

# block containers: flush any implicit text run at their boundary
BLOCK_CONTAINER_TAGS = frozenset(
    {"html", "body", "div", "section", "article", "main", "ul", "ol",
     "table", "thead", "tbody", "figure"}
)

_CELL_TAGS = frozenset({"td", "th"})

# Readability/Trafilatura negative hints: an element whose class/id names
# it as chrome (sidebar, share bar, comments, cookie banner, ...) is
# boilerplate regardless of its tag — the single most load-bearing
# heuristic in Readability's unlikelyCandidates (public readability.js).
# Word-ish boundaries so content classes like "main"/"grid" never match.
_BOILER_HINT_RE = re.compile(
    r"(?:^|[\s_-])(?:comment(?:s)?|sidebar|side-bar|footer|masthead"
    r"|nav(?:bar|igation)?|menu|share|sharing|social|sponsor(?:ed)?"
    r"|advert(?:isement)?|ads?|promo(?:tion)?|related|recommend(?:ed|ation)?"
    r"|breadcrumbs?|banner|cookie|gdpr|consent|popup|modal|overlay|widget"
    r"|disqus|pag(?:er|ination)|skyscraper|newsletter|subscribe|signup"
    r")(?:$|[\s_-])",
    re.IGNORECASE,
)


def _hinted_boilerplate(attrs: dict) -> bool:
    if not attrs:
        return False
    c = attrs.get("class")
    if c and _BOILER_HINT_RE.search(c):
        return True
    i = attrs.get("id")
    return bool(i and _BOILER_HINT_RE.search(i))

# single-probe tag category (the four sets are disjoint): one dict get in
# the per-event hot path instead of up to five frozenset membership tests
_CAT_DROP, _CAT_LEAF, _CAT_CONTAINER, _CAT_CELL, _CAT_A, _CAT_BR = range(1, 7)
_TAG_CAT = {t: _CAT_DROP for t in DROP_SUBTREE_TAGS}
_TAG_CAT.update({t: _CAT_LEAF for t in BLOCK_LEAF_TAGS})
_TAG_CAT.update({t: _CAT_CONTAINER for t in BLOCK_CONTAINER_TAGS})
_TAG_CAT.update({t: _CAT_CELL for t in _CELL_TAGS})
_TAG_CAT["a"] = _CAT_A
_TAG_CAT["br"] = _CAT_BR


@dataclass
class Block:
    """One block-level node with classifier features."""

    tag: str
    depth: int
    block_idx: int
    text: str  # normalized (CRLF/sentinel/trim) flat text
    n_chars: int = 0
    n_link_chars: int = 0
    in_drop_subtree: bool = False

    def __post_init__(self) -> None:
        self.n_chars = len(self.text)


class _Builder:
    __slots__ = ("blocks", "stack", "drop_depth", "link_depth", "buf",
                 "link_buf", "cur_tag", "cur_depth", "cells", "in_cell",
                 "hint_pos")

    def __init__(self) -> None:
        self.blocks: List[Block] = []
        self.stack: List[str] = []
        self.drop_depth = 0   # >0 while inside any DROP_SUBTREE tag
        self.link_depth = 0   # >0 while inside <a>
        self.buf: List[str] = []
        self.link_buf: List[str] = []  # chars contributed while inside <a>
        self.cur_tag: str = ""         # open block leaf tag, "" if none
        self.cur_depth = 0
        self.cells: List[str] = []     # td/th cell texts for current tr
        self.in_cell = False
        # stack indices of elements dropped via class/id boilerplate hint
        # (monotone ascending; the matching close undoes ONE drop level)
        self.hint_pos: List[int] = []

    # ---- flushing ----------------------------------------------------

    def _flush(self) -> None:
        tag = self.cur_tag
        if not self.buf and not self.cells and not self.in_cell:
            # nothing buffered: the dominant case (every block open flushes);
            # text=="" would return below anyway, skip the joins/normalize
            if not self.link_buf:
                self.cur_tag = ""
                return
        if tag == "tr":
            # join completed cells with ' | ' (grid -> row-major sequence,
            # mirroring tile row order preprocess.rs:119-127)
            self._end_cell()
            cells = [normalize_text(c) for c in self.cells]
            cells = [c for c in cells if c != ""]
            text = " | ".join(cells)
            self.cells = []
        else:
            text = normalize_text("".join(self.buf))
        link_chars = len(normalize_text("".join(self.link_buf)))
        self.buf = []
        self.link_buf = []
        eff_tag = tag if tag else "p"  # implicit text run -> paragraph
        self.cur_tag = ""
        if text == "":
            return
        blk = Block(
            tag=eff_tag,
            depth=self.cur_depth,
            block_idx=len(self.blocks),
            text=text,
            in_drop_subtree=self.drop_depth > 0,
        )
        blk.n_link_chars = min(link_chars, blk.n_chars)
        self.blocks.append(blk)

    def _end_cell(self) -> None:
        if self.in_cell or self.buf:
            self.cells.append("".join(self.buf))
            self.buf = []
            self.in_cell = False

    # ---- event handling ------------------------------------------------

    def open(self, tag: str, attrs: dict) -> None:
        if attrs and tag != "br" and _hinted_boilerplate(attrs):
            # class/id names this element as chrome: the whole subtree is
            # boilerplate whatever its tag (Readability unlikelyCandidates)
            self._flush()
            self.hint_pos.append(len(self.stack))
            self.stack.append(tag)
            self.drop_depth += 1
            return
        cat = _TAG_CAT.get(tag, 0)
        if cat == _CAT_LEAF:
            self._flush()
            self.cur_tag = tag
            self.cur_depth = len(self.stack)
            self.stack.append(tag)
            return
        if cat == 0:
            self.stack.append(tag)  # generic inline
            return
        if cat == _CAT_DROP:
            self._flush()
            self.drop_depth += 1
            self.stack.append(tag)
            return
        if cat == _CAT_CONTAINER:
            self._flush()
            self.stack.append(tag)
            return
        if cat == _CAT_CELL:
            self._end_cell()
            self.in_cell = True
            self.stack.append(tag)
            return
        if cat == _CAT_A:
            self.link_depth += 1
            self.stack.append(tag)
            return
        self.buf.append("\n")  # br

    def close(self, tag: str) -> None:
        if tag == "br":
            return
        stack = self.stack
        # well-formed fast path: the close matches the top of the stack
        if stack and stack[-1] == tag:
            stack.pop()
            if self.hint_pos and self.hint_pos[-1] == len(stack):
                # closing a hint-dropped element: undo exactly the one
                # drop level its open added (its tag category was ignored)
                self.hint_pos.pop()
                self.drop_depth = max(0, self.drop_depth - 1)
                self._flush()
                return
            cat = _TAG_CAT.get(tag, 0)
            if cat == _CAT_LEAF or cat == _CAT_CONTAINER:
                self._flush()
            elif cat == _CAT_DROP:
                self.drop_depth = max(0, self.drop_depth - 1)
            elif cat == _CAT_CELL:
                self._end_cell()
            elif cat == _CAT_A:
                self.link_depth = max(0, self.link_depth - 1)
            return
        # pop to the matching open if present (tolerates mild malformation)
        if tag in stack:
            while stack:
                popped = stack.pop()
                if self.hint_pos and self.hint_pos[-1] == len(stack):
                    # hint-dropped entry: undo its one drop level and skip
                    # its tag-category bookkeeping (the open skipped it too)
                    self.hint_pos.pop()
                    self.drop_depth = max(0, self.drop_depth - 1)
                    if popped == tag:
                        self._flush()
                        return
                    continue
                if popped in DROP_SUBTREE_TAGS:
                    self.drop_depth = max(0, self.drop_depth - 1)
                if popped == "a":
                    self.link_depth = max(0, self.link_depth - 1)
                if popped in BLOCK_LEAF_TAGS and popped == tag:
                    self._flush()
                    return
                if popped in _CELL_TAGS and popped == tag:
                    self._end_cell()
                    return
                if popped == tag:
                    if popped in BLOCK_CONTAINER_TAGS:
                        self._flush()
                    return

    def text(self, s: str) -> None:
        if self.drop_depth > 0:
            # content inside nav/header/footer/title/... never reaches a
            # block — otherwise text directly under a drop tag would leak
            # into the next flushed block once the subtree closes
            return
        self.buf.append(s)
        if self.link_depth > 0:
            self.link_buf.append(s)

    def finish(self) -> List[Block]:
        self._flush()
        return self.blocks


def build_blocks(events: Iterable[Event]) -> List[Block]:
    """Fold a tokenizer event stream into a document-ordered Block array."""
    b = _Builder()
    for ev in events:
        kind = ev[0]
        if kind == "text":
            b.text(ev[1])
        elif kind == "open":
            b.open(ev[1], ev[2])
        else:
            b.close(ev[1])
    return b.finish()


def build_blocks_fast(payload: str) -> List[Block]:
    """Fused whole-string scan -> Block array (the batch hot path).

    Exactly ``build_blocks(tokenize_html_fast(payload))`` without
    materializing the intermediate event-tuple list (~100 tuples per
    payload whose only consumer is the fold above).  The scan loop mirrors
    ``tokenize_html_fast`` statement-for-statement; differential tests pin
    Block-level equality against the streaming tokenizer under hostile
    chunkings (tests/test_kernel_pure.py).
    """
    from deepseek_ocr_rs_spark.functions.tokenizer import (
        _RAWTEXT_CLOSE_RE,
        _RAWTEXT_TAGS,
        _TAG_MEMO,
        VOID_TAGS,
        _parse_tag,
        decode_entities,
    )

    memo_get = _TAG_MEMO.get
    b = _Builder()
    b_text, b_open, b_close = b.text, b.open, b.close
    s = payload
    n = len(s)
    find = s.find
    pos = 0
    while True:
        lt = find("<", pos)
        if lt < 0:
            if pos < n:
                b_text(decode_entities(s[pos:]))
            break
        if lt > pos:
            b_text(decode_entities(s[pos:lt]))
        gt = find(">", lt + 1)
        if gt < 0:
            break  # unterminated tag at EOF: dropped
        raw = s[lt + 1 : gt]
        pos = gt + 1
        if raw.startswith("!--"):
            if not raw.endswith("--"):
                end = find("-->", pos)
                if end < 0:
                    break  # unterminated comment: dropped
                pos = end + 3
            continue
        # inlined _TAG_MEMO probe (the memo dict doubles as the miss
        # sentinel, exactly as _parse_tag does); real documents hit it on
        # nearly every tag, so the wrapper call is measurable overhead
        parsed = memo_get(raw, _TAG_MEMO)
        if parsed is _TAG_MEMO:
            parsed = _parse_tag(raw)
        if parsed is None:
            continue
        kind, tag, attrs, self_closing = parsed
        if kind == "open":
            b_open(tag, attrs)
            if tag in VOID_TAGS or self_closing:
                b_close(tag)
            elif tag in _RAWTEXT_TAGS:
                m = _RAWTEXT_CLOSE_RE[tag].search(s, pos)
                if m is None:
                    break  # unterminated rawtext: body dropped, no close
                b_close(tag)
                gt2 = find(">", m.start())
                if gt2 < 0:
                    break
                pos = gt2 + 1
        else:
            b_close(tag)
    return b.finish()
