"""Streaming byte-level HTML tokenizer.

The reference streams decoded text UTF-8-safely, suppressing partial
codepoints at chunk boundaries (crates/core/src/streaming.rs:4-68) and feeds
documents through a deterministic segmentation (vision/preprocess.rs).  The
analog here is a byte-level HTML scanner that can be fed arbitrary byte
chunks — a multibyte character or a tag may span a chunk boundary — and emits
a deterministic event stream regardless of how the input was chunked.

Events (tuples):
  ("open",  tag, attrs)   attrs: dict, only ``href`` retained
  ("close", tag)
  ("text",  decoded_str)  entity-decoded text run

Determinism notes:
  * Text runs are buffered as *bytes* and only decoded when a complete run is
    flushed (at '<' or EOF).  ``0x3C`` never occurs inside a UTF-8
    continuation sequence, so splitting at '<' is always codepoint-safe; any
    genuinely malformed UTF-8 is replaced deterministically (errors=replace).
  * ``<script>``/``<style>`` bodies are consumed in raw-text mode (no entity
    decoding, no nested tags) until the matching close tag, mirroring how
    the reference drops non-content streams.
  * HTML comments ``<!-- -->`` are skipped.
"""

from __future__ import annotations

import html.entities
import re
from typing import Dict, Iterator, List, Optional, Tuple

Event = Tuple  # ("open", tag, attrs) | ("close", tag) | ("text", str)

# Pipeline-normalization overrides kept case-insensitive and ahead of the
# spec table: nbsp deliberately decodes to ASCII space (the extraction
# contract normalizes whitespace; fixtures and hashes pin this).
_LEGACY_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
    "mdash": "—",
    "ndash": "–",
    "hellip": "…",
    "copy": "©",
    "reg": "®",
    "trade": "™",
    "laquo": "«",
    "raquo": "»",
    "rsquo": "’",
    "lsquo": "‘",
    "rdquo": "”",
    "ldquo": "“",
}

# Full HTML5 named-entity map (public spec data via the stdlib): ~2.2k names
# like eacute/Ouml/frac12.  Only the ';'-terminated forms — our regex requires
# the semicolon, matching the reference's strict text handling
# (crates/core/src/streaming.rs:43-62: exact, never-guessing decode).
# Case-SENSITIVE per spec ('&Ouml;' != '&ouml;'), with a lowercase fallback
# only through the legacy overrides above.
_NAMED_ENTITIES: Dict[str, str] = {
    name[:-1]: value
    for name, value in html.entities.html5.items()
    if name.endswith(";")
}
_NAMED_ENTITIES.update(
    {k: v for k, v in _LEGACY_ENTITIES.items()}
)
_NAMED_ENTITIES.update(
    {k.upper(): v for k, v in _LEGACY_ENTITIES.items()
     if k.upper() not in _NAMED_ENTITIES}
)

_ENTITY_RE = re.compile(r"&(#x[0-9a-fA-F]{1,6}|#[0-9]{1,7}|[a-zA-Z][a-zA-Z0-9]{1,31});")

_RAWTEXT_TAGS = frozenset({"script", "style"})

_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s"'>]+))?"""
)


def decode_entities(s: str) -> str:
    """Deterministic entity decode for the supported named + numeric forms."""
    if "&" not in s:
        return s

    def _sub(m: "re.Match[str]") -> str:
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            try:
                cp = int(body[2:], 16)
            except ValueError:
                return m.group(0)
            return chr(cp) if 0 < cp <= 0x10FFFF else m.group(0)
        if body.startswith("#"):
            try:
                cp = int(body[1:], 10)
            except ValueError:
                return m.group(0)
            return chr(cp) if 0 < cp <= 0x10FFFF else m.group(0)
        hit = _NAMED_ENTITIES.get(body)
        if hit is not None:
            return hit
        # legacy names stay case-insensitive (&Amp; &NbSp; ...) — the spec
        # table is case-sensitive, so only the overrides get this fallback
        return _LEGACY_ENTITIES.get(body.lower(), m.group(0))

    return _ENTITY_RE.sub(_sub, s)


_TAG_NAME_RE = re.compile(r"[a-zA-Z][-a-zA-Z0-9:]*")
_EMPTY_ATTRS: Dict[str, str] = {}
# case-insensitive probe compiled once: one C-level scan, no .lower() copy
# semantically relevant attributes: href (link density), class/id
# (boilerplate hints, dom._BOILER_HINT_RE).  The probe needs the name in
# attribute position — a bare substring probe for "id" would fire on
# width=/… and defeat the no-attr fast path
_ATTR_PROBE_RE = re.compile(r"(?:^|\s)(?:href|class|id)\s*=", re.IGNORECASE)
_KEPT_ATTRS = frozenset({"href", "class", "id"})
# tag-scoped retention: metadata carriers keep their own attribute set and
# always take the attr scan (they essentially never appear bare), so the
# no-attr fast path for p/div/span/a is untouched.  head-metadata surface:
# <meta name/property/content/charset/http-equiv>, <link rel/href>,
# <html lang> (operators/metadata.py consumes these)
_TAG_EXTRA_ATTRS: Dict[str, frozenset] = {
    "meta": frozenset({"name", "property", "content", "charset",
                       "http-equiv"}),
    "link": frozenset({"rel", "href", "hreflang"}),
    "html": frozenset({"lang"}),
}


# memo for short tags: real documents repeat a handful of raw tag strings
# ('p', '/p', 'div', 'div class="sidebar"', ...) tens of thousands of
# times; the cached value is treated as immutable by all callers (the DOM
# builder only reads attrs — nothing may mutate a parsed attrs dict).
# Bounded: long raws skip it; the table resets at _TAG_MEMO_MAX entries.
_TAG_MEMO: Dict[str, Optional[Tuple[str, str, Dict[str, str], bool]]] = {}
_TAG_MEMO_MAX = 8192


def _parse_tag(raw: str) -> Optional[Tuple[str, str, Dict[str, str], bool]]:
    """Parse the inside of ``<...>``.

    Returns (kind, tag, attrs, self_closing) with kind in {open, close},
    or None for markup we skip (comments, doctype, processing instructions).
    """
    memo_key = raw if len(raw) <= 32 else None
    if memo_key is not None:
        hit = _TAG_MEMO.get(memo_key, _TAG_MEMO)  # sentinel: miss
        if hit is not _TAG_MEMO:
            return hit
    result = _parse_tag_uncached(raw)
    if memo_key is not None:
        if len(_TAG_MEMO) >= _TAG_MEMO_MAX:
            _TAG_MEMO.clear()
        _TAG_MEMO[memo_key] = result
    return result


def _parse_tag_uncached(
    raw: str,
) -> Optional[Tuple[str, str, Dict[str, str], bool]]:
    raw = raw.strip()
    if not raw:
        return None
    if raw[0] in "!?":
        return None  # doctype / comment remnant / PI
    closing = raw[0] == "/"
    if closing:
        raw = raw[1:]
    self_closing = raw.endswith("/")
    if self_closing:
        raw = raw[:-1]
    m = _TAG_NAME_RE.match(raw)
    if not m:
        return None
    tag = m.group(0).lower()
    if closing:
        return ("close", tag, _EMPTY_ATTRS, False)
    # only href/class/id are semantically relevant (SURVEY §2, FIXTURES §2):
    # skip the attribute scan entirely when none can be present (the hot
    # path).  case-insensitive probe: the attr matcher below lowercases
    # names, so <a HREF="..."> / <div CLASS=...> must not take the fast path
    kept = _TAG_EXTRA_ATTRS.get(tag)
    if kept is None:
        kept = _KEPT_ATTRS
        if not _ATTR_PROBE_RE.search(raw):
            return ("open", tag, _EMPTY_ATTRS, self_closing)
    attrs: Dict[str, str] = {}
    for am in _ATTR_RE.finditer(raw[m.end():]):
        name = am.group(1).lower()
        if name not in kept:
            continue
        val = am.group(2) or ""
        if len(val) >= 2 and val[0] in "\"'" and val[-1] == val[0]:
            val = val[1:-1]
        attrs[name] = val
    return ("open", tag, attrs, self_closing)


# self-closing by HTML spec; emitted as open (no matching close expected)
VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


class HtmlTokenizer:
    """Incremental byte-fed HTML tokenizer.

    Usage::

        tok = HtmlTokenizer()
        for chunk in byte_chunks:
            events.extend(tok.feed(chunk))
        events.extend(tok.finish())

    The concatenated event stream is identical for any chunking of the same
    byte string (the X5 invariant of SURVEY.md §2.9).
    """

    __slots__ = ("_buf", "_events", "_in_tag", "_in_comment", "_rawtext_until")

    def __init__(self) -> None:
        self._buf = bytearray()  # unconsumed bytes
        self._in_tag = False
        self._in_comment = False  # inside <!-- ... -->, seeking '-->'
        self._rawtext_until: Optional[bytes] = None  # e.g. b"</script"

    def feed(self, chunk: bytes) -> List[Event]:
        if isinstance(chunk, str):  # convenience
            chunk = chunk.encode("utf-8")
        self._buf.extend(chunk)
        return self._drain(final=False)

    def finish(self) -> List[Event]:
        return self._drain(final=True)

    # -- internals ---------------------------------------------------------

    def _drain(self, final: bool) -> List[Event]:
        # consumed bytes are tracked by a cursor and compacted ONCE on exit:
        # the previous del-buf[:n]-per-event form was an O(buffer) memmove
        # per tag, i.e. quadratic in chunk size on tag-dense documents
        out: List[Event] = []
        buf = self._buf
        pos = 0
        try:
            while True:
                if self._in_comment:
                    # explicit comment state: scan for '-->' with a retained
                    # 2-byte tail across chunk boundaries.  Never re-prepends
                    # a synthesized '<!--' opener — doing so could fabricate
                    # '-->' from the opener's '--' plus a tail byte and leak
                    # comment text as a text event (round-3 ADVICE).
                    end = buf.find(b"-->", pos)
                    if end >= 0:
                        pos = end + 3
                        self._in_comment = False
                        continue
                    if final:
                        # unterminated comment: drop it
                        pos = len(buf)
                        self._in_comment = False
                    else:
                        keep = min(len(buf) - pos, 2)
                        pos = len(buf) - keep
                    break

                if self._rawtext_until is not None:
                    low = bytes(buf[pos:]).lower()
                    idx = low.find(self._rawtext_until)
                    if idx < 0:
                        if final:
                            # unterminated rawtext: drop it (boilerplate)
                            pos = len(buf)
                        else:
                            # keep a tail so a split close-tag still matches
                            keep = len(self._rawtext_until) - 1
                            if len(buf) - pos > keep:
                                pos = len(buf) - keep
                        break
                    tag = self._rawtext_until[2:].decode("ascii")
                    # rawtext body dropped entirely (script/style is never
                    # content)
                    gt = buf.find(b">", pos + idx)
                    if gt < 0:
                        if final:
                            pos = len(buf)
                            out.append(("close", tag))
                            self._rawtext_until = None
                        break
                    pos = gt + 1
                    out.append(("close", tag))
                    self._rawtext_until = None
                    continue

                if self._in_tag:
                    gt = buf.find(b">", pos)
                    if gt < 0:
                        if final:
                            pos = len(buf)
                            self._in_tag = False
                        break
                    raw = buf[pos:gt].decode("utf-8", errors="replace")
                    pos = gt + 1
                    self._in_tag = False
                    if raw.startswith("!--"):
                        # a '>' inside the comment body ended it only if '-->'
                        if not raw.endswith("--"):
                            self._in_comment = True
                        continue
                    parsed = _parse_tag(raw)
                    if parsed is None:
                        continue
                    kind, tag, attrs, self_closing = parsed
                    if kind == "open":
                        out.append(("open", tag, attrs))
                        if tag in VOID_TAGS or self_closing:
                            out.append(("close", tag))
                        elif tag in _RAWTEXT_TAGS:
                            self._rawtext_until = b"</" + tag.encode("ascii")
                    else:
                        out.append(("close", tag))
                    continue

                lt = buf.find(b"<", pos)
                if lt < 0:
                    if final:
                        if pos < len(buf):
                            out.append(("text", decode_entities(
                                buf[pos:].decode("utf-8", errors="replace"))))
                            pos = len(buf)
                    break
                if lt > pos:
                    out.append(("text", decode_entities(
                        buf[pos:lt].decode("utf-8", errors="replace"))))
                pos = lt + 1
                self._in_tag = True
        finally:
            if pos:
                del buf[:pos]
        # drop empty text events for determinism
        return [e for e in out if not (e[0] == "text" and e[1] == "")]


def tokenize_html(payload: str, chunk_size: int = 0) -> List[Event]:
    """Tokenize a full payload; chunk_size>0 exercises the streaming path."""
    data = payload.encode("utf-8")
    tok = HtmlTokenizer()
    events: List[Event] = []
    if chunk_size and chunk_size > 0:
        for i in range(0, len(data), chunk_size):
            events.extend(tok.feed(data[i : i + chunk_size]))
    else:
        events.extend(tok.feed(data))
    events.extend(tok.finish())
    return events


# rawtext close-tag scanners: ASCII-only case-insensitivity (re.A) matches
# the streaming path's bytes.lower(), which maps only A-Z — full-Unicode
# folding would additionally let U+212A KELVIN match 'k'
_RAWTEXT_CLOSE_RE = {
    tag: re.compile("</" + tag, re.IGNORECASE | re.ASCII)
    for tag in _RAWTEXT_TAGS
}


def tokenize_html_fast(payload: str) -> List[Event]:
    """Whole-string tokenizer, event-identical to ``HtmlTokenizer`` on str
    input (differentially tested in test_kernel_pure / hypothesis fuzz).

    The streaming class exists for byte chunks arriving over time (X5); the
    batch hot path always holds the complete payload, where the bytearray
    cursor machinery and per-run encode/decode are pure overhead.  str input
    is valid UTF-8 by construction, so the streaming path's
    ``errors="replace"`` branches are unreachable and byte offsets and
    character scans find the same '<' '>' '-->' positions.
    """
    out: List[Event] = []
    s = payload
    n = len(s)
    find = s.find
    pos = 0
    while True:
        lt = find("<", pos)
        if lt < 0:
            if pos < n:
                out.append(("text", decode_entities(s[pos:])))
            break
        if lt > pos:
            out.append(("text", decode_entities(s[pos:lt])))
        gt = find(">", lt + 1)
        if gt < 0:
            break  # unterminated tag at EOF: dropped (streaming parity)
        raw = s[lt + 1 : gt]
        pos = gt + 1
        if raw.startswith("!--"):
            # ended at this '>' only if the body closes with '--'
            if not raw.endswith("--"):
                end = find("-->", pos)
                if end < 0:
                    break  # unterminated comment: dropped
                pos = end + 3
            continue
        parsed = _parse_tag(raw)
        if parsed is None:
            continue
        kind, tag, attrs, self_closing = parsed
        if kind == "open":
            out.append(("open", tag, attrs))
            if tag in VOID_TAGS or self_closing:
                out.append(("close", tag))
            elif tag in _RAWTEXT_TAGS:
                m = _RAWTEXT_CLOSE_RE[tag].search(s, pos)
                if m is None:
                    # unterminated rawtext: body dropped, no close event
                    # (streaming-final parity)
                    break
                out.append(("close", tag))
                gt2 = find(">", m.start())
                if gt2 < 0:
                    break
                pos = gt2 + 1
        else:
            out.append(("close", tag))
    return out


# ---------------------------------------------------------------- XML mode

_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)


def escape_cdata(s: str) -> str:
    """XML-mode preprocessor: rewrite ``<![CDATA[...]]>`` sections as
    entity-escaped text so the tokenizer surfaces their content as
    ordinary text events (``decode_entities`` restores it exactly).

    The HTML tokenizer treats ``<![...`` as bogus markup ending at the
    first ``>`` — WHATWG-faithful for HTML, where CDATA outside foreign
    content IS a bogus comment — so CDATA values in XML (RSS titles,
    sitemap locs) would otherwise drop, or worse leak a tail fragment
    when the content contains ``>``.  The XML parsers (sitemaps, feeds)
    call this first; the HTML extraction path deliberately does NOT.
    An unterminated CDATA section is left untouched (the tokenizer's
    bogus-comment handling drops it, matching its other EOF rules).
    """
    if "<![CDATA[" not in s:
        return s
    return _CDATA_RE.sub(
        lambda m: m.group(1)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;"),
        s,
    )
