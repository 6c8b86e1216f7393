"""Per-payload extraction kernel: sniff -> parse -> classify -> assemble.

This is the analog of the reference's ``OcrEngine::decode`` dispatch
(crates/core/src/inference.rs:189-209; ModelKind dispatch cli/app.rs:105-110):
one deterministic function from a payload string to the structured result
row.  Payload kind dispatch mirrors data:-URL sniffing
(server/src/generation.rs:284-298) — HTML by document prefix, PDF by the
JSON micro-format magic, anything else is plain text.

The small-payload short-circuit mirrors the no-crop predicate
(vision/preprocess.rs:73-81): payloads with no markup markers skip
segmentation entirely.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from deepseek_ocr_rs_spark.functions.classify import classify_blocks
from deepseek_ocr_rs_spark.functions.dom import build_blocks, build_blocks_fast
from deepseek_ocr_rs_spark.functions.markdown import render_blocks
from deepseek_ocr_rs_spark.functions.normalize import normalize_text
from deepseek_ocr_rs_spark.functions.pdflayout import looks_like_pdf, parse_pdf_payload
from deepseek_ocr_rs_spark.functions.tokenizer import tokenize_html

KIND_HTML = "html"
KIND_PDF = "pdf"
KIND_PLAIN = "plain"

# 0 = whole-string fast tokenizer (batch default). A positive value feeds
# the payload through the byte-streaming tokenizer in chunks of that size —
# event-identical output (X5 invariant); tests pass 1/3/7/4096 to exercise
# every boundary class through the full kernel.
DEFAULT_CHUNK_BYTES = 0


def sniff_payload_kind(text: Optional[str]) -> str:
    """Deterministic payload-kind detection (S3 analog)."""
    if text is None:
        return KIND_PLAIN
    head = text.lstrip()[:64].lower()
    if head.startswith("<!doctype") or head.startswith("<html"):
        return KIND_HTML
    if looks_like_pdf(text):
        return KIND_PDF
    return KIND_PLAIN


def extract_payload(
    text: Optional[str],
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    max_blocks: Optional[int] = None,
) -> Dict:
    """Extract one turn's payload.

    Returns dict with keys: payload_kind, text_md, text_plain, spans (list of
    {start,end,kind,block_idx}), n_blocks, n_chars, ok (bool; False routes
    the row to quarantine, C4 analog).

    ``max_blocks`` caps the per-turn output (T8 — the max_new_tokens budget
    analog, model/mod.rs:1977-2034): blocks beyond the cap are truncated
    deterministically in document order.
    """
    kind = sniff_payload_kind(text)
    if kind == KIND_HTML:
        # chunk_bytes=0 -> whole-string fast scanner (the batch hot path:
        # the full payload is already in hand, so the streaming bytearray
        # machinery is pure overhead); >0 -> byte-fed streaming path,
        # event-identical by the X5 invariant (differentially tested)
        if chunk_bytes == 0:
            blocks = classify_blocks(build_blocks_fast(text))
        else:
            events = tokenize_html(text, chunk_size=chunk_bytes)
            blocks = classify_blocks(build_blocks(events))
        if max_blocks is not None:
            blocks = blocks[:max_blocks]
        text_md, text_plain, spans, n_blocks, n_chars = render_blocks(blocks)
        return _result(kind, text_md, text_plain, spans, n_blocks, n_chars, True)
    if kind == KIND_PDF:
        blocks = parse_pdf_payload(text)
        if blocks is None:  # malformed JSON -> quarantine, don't fail the job
            return _result(kind, "", "", [], 0, 0, False)
        if max_blocks is not None:
            blocks = blocks[:max_blocks]
        text_md, text_plain, spans, n_blocks, n_chars = render_blocks(blocks)
        return _result(kind, text_md, text_plain, spans, n_blocks, n_chars, True)
    # plain path (small-payload short-circuit: no segmentation at all)
    norm = normalize_text(text)
    if norm == "":
        return _result(KIND_PLAIN, "", "", [], 0, 0, True)
    spans = [{"start": 0, "end": len(norm), "kind": "content", "block_idx": 0}]
    return _result(KIND_PLAIN, norm, norm, spans, 1, len(norm), True)


def _result(
    kind: str,
    text_md: str,
    text_plain: str,
    spans: List[Dict],
    n_blocks: int,
    n_chars: int,
    ok: bool,
) -> Dict:
    return {
        "payload_kind": kind,
        "text_md": text_md,
        "text_plain": text_plain,
        "spans": spans,
        "n_blocks": n_blocks,
        "n_chars": n_chars,
        "ok": ok,
    }
