"""Minimal real PDF text-layer codec (stdlib zlib only).

Third member of the real-codec family (functions/png.py, functions/
wav.py): enough of ISO 32000 to round-trip the text layer of a
digitally-born PDF — the document class a 100 TB extraction pipeline
actually meets at scale (scanned-image PDFs are the OCR engine's job;
text-layer PDFs are pure parsing).

Implemented subset:

* object scan: ``N G obj << dict >> [stream ... endstream] endobj`` —
  byte-level scan, no xref table required (the tolerant posture: real
  crawled PDFs routinely have broken xrefs; readers that insist on
  them lose documents a scanning parser recovers),
* stream payloads sliced by the /Length integer (direct values only),
  inflated when /Filter /FlateDecode,
* content-stream tokenizer: text objects BT..ET with Td/TD/Tm
  positioning and Tj/TJ/'/" show operators,
* PDF string syntax: ``(...)`` with the eight escapes + octal +
  balanced nested parens + escaped newlines, ``<...>`` hex strings
  (UTF-8 interpretation of the bytes; no font-encoding/CMap layer —
  that is the documented boundary of the subset, like PNG's
  no-interlace).

The writer emits a canonical one-page-per-doc PDF (catalog/pages/page/
font/contents, correct /Length, optional FlateDecode, valid xref +
trailer — REAL files any viewer opens) so the parser is testable
end-to-end without fixtures, exactly like encode_png / encode_wav.

Reference analog: the whole reference exists to turn documents into
markdown (crates/infer-deepseek vision pipeline); this is the
text-layer path of the same product surface, where decode is exact
parsing instead of model inference.

Scale shape: one payload = one parse inside an Arrow batch; no
shuffle; tolerant-tail per document (a malformed object ends that
document's scan, never the batch).
"""

from __future__ import annotations

import re
import zlib

__all__ = ["PdfFormatError", "extract_pdf_text", "build_pdf"]


class PdfFormatError(ValueError):
    """Malformed or unsupported-by-this-subset PDF stream."""


_OBJ_RE = re.compile(
    rb"(\d+)\s+(\d+)\s+obj\b(.*?)\bendobj", re.DOTALL
)
_STREAM_RE = re.compile(rb"stream\r?\n", re.DOTALL)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode\b")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _content_streams(data: bytes):
    """Yield decompressed stream payloads in object order."""
    if not data.startswith(b"%PDF-"):
        raise PdfFormatError("not a PDF header")
    for m in _OBJ_RE.finditer(data):
        body = m.group(3)
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        head = body[: sm.start()]
        lm = _LENGTH_RE.search(head)
        if not lm:
            raise PdfFormatError("stream without a direct /Length")
        length = int(lm.group(1))
        start = sm.end()
        payload = body[start:start + length]
        if len(payload) < length:
            raise PdfFormatError("truncated stream payload")
        if _FLATE_RE.search(head):
            try:
                payload = zlib.decompress(payload)
            except zlib.error as exc:
                raise PdfFormatError(f"FlateDecode failed: {exc}") from exc
        yield payload


def _parse_string(buf: bytes, i: int):
    """Parse a PDF literal string starting at ``buf[i] == '('``.
    Returns (bytes, next_index)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n:
        c = buf[i:i + 1]
        if c == b"\\":
            nxt = buf[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():
                j = i + 1
                while j < min(i + 4, n) and buf[j:j + 1].isdigit():
                    j += 1
                out.append(int(buf[i + 1:j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):
                i += 2  # line continuation
                if nxt == b"\r" and buf[i:i + 1] == b"\n":
                    i += 1
            else:
                i += 1  # lone backslash: dropped per spec
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out += c
            i += 1
        else:
            out += c
            i += 1
    raise PdfFormatError("unterminated string")


_NUM_RE = re.compile(rb"[+-]?\d+(?:\.\d+)?|[+-]?\.\d+")
_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")


def _tokens(stream: bytes):
    """Yield ('num', float) | ('str', bytes) | ('op', bytes) tokens."""
    i, n = 0, len(stream)
    while i < n:
        c = stream[i:i + 1]
        if c in b" \t\r\n\x00":
            i += 1
        elif c == b"(":
            s, i = _parse_string(stream, i)
            yield ("str", s)
        elif c == b"<" and stream[i + 1:i + 2] != b"<":
            m = _HEX_RE.match(stream, i)
            if not m:
                raise PdfFormatError("bad hex string")
            h = re.sub(rb"\s", b"", m.group(1))
            if len(h) % 2:
                h += b"0"
            yield ("str", bytes.fromhex(h.decode("ascii")))
            i = m.end()
        elif c == b"<":  # dict inside content (rare) — skip delimiters
            i += 2
        elif c == b">":
            i += 2 if stream[i + 1:i + 2] == b">" else 1
        elif c in b"[]":
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and stream[j:j + 1] not in b" \t\r\n/[]()<>":
                j += 1
            i = j
        else:
            m = _NUM_RE.match(stream, i)
            if m and m.start() == i:
                yield ("num", float(m.group(0)))
                i = m.end()
            else:
                j = i
                while j < n and stream[j:j + 1] not in b" \t\r\n/[]()<>":
                    j += 1
                if j == i:
                    raise PdfFormatError(
                        f"unparseable byte {stream[i:i+1]!r}"
                    )
                yield ("op", stream[i:j])
                i = j


def extract_pdf_text(data: bytes):
    """PDF bytes -> list of (order, x, y, text) text-show events.

    ``order`` is the document-order ordinal of the show operator across
    all content streams; (x, y) is the text-line origin in PDF user
    space at the time of the show (Td/TD translations accumulate from
    the BT origin; Tm sets the line matrix origin absolutely — the
    translation components e, f are honored, rotation/shear are outside
    the subset and ignored for position).  Text bytes decode as UTF-8
    with replacement (the no-CMap boundary).
    """
    rows = []
    order = 0
    for stream in _content_streams(bytes(data)):
        x = y = 0.0
        lx = ly = 0.0
        stack = []  # pending operands
        in_text = False
        for kind, val in _tokens(stream):
            if kind != "op":
                stack.append((kind, val))
                continue
            op = val
            if op == b"BT":
                in_text = True
                x = y = lx = ly = 0.0
            elif op == b"ET":
                in_text = False
            elif op in (b"Td", b"TD") and in_text:
                if len(stack) >= 2 and stack[-1][0] == stack[-2][0] == "num":
                    lx += stack[-2][1]
                    ly += stack[-1][1]
                    x, y = lx, ly
            elif op == b"Tm" and in_text:
                if len(stack) >= 6:
                    lx, ly = stack[-2][1], stack[-1][1]
                    x, y = lx, ly
            elif op == b"T*" and in_text:
                x, y = lx, ly  # leading untracked in the subset
            elif op in (b"Tj", b"'", b'"') and in_text:
                strs = [v for k, v in stack if k == "str"]
                if strs:
                    rows.append(
                        (order, x, y,
                         strs[-1].decode("utf-8", "replace"))
                    )
                    order += 1
            elif op == b"TJ" and in_text:
                parts = [v for k, v in stack if k == "str"]
                if parts:
                    rows.append(
                        (order, x, y,
                         b"".join(parts).decode("utf-8", "replace"))
                    )
                    order += 1
            stack = []
    return rows


def _pdf_escape(s: str) -> bytes:
    b = s.encode("utf-8")
    return (
        b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def build_pdf(blocks, compress: bool = True) -> bytes:
    """[(x, y, text), ...] -> a complete one-page PDF (real xref/trailer).

    Each block becomes ``BT /F1 12 Tf x y Td (text) Tj ET`` in list
    order; ``compress=True`` FlateDecodes the content stream (the
    dominant real-world encoding).
    """
    ops = [
        b"BT /F1 12 Tf %.2f %.2f Td (%s) Tj ET"
        % (float(x), float(y), _pdf_escape(text))
        for x, y, text in blocks
    ]
    content = b"\n".join(ops)
    filt = b""
    if compress:
        content = zlib.compress(content, 6)
        filt = b" /Filter /FlateDecode"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length %d%s >>\nstream\n%s\nendstream"
        % (len(content), filt, content),
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, obj)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
