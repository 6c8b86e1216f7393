"""Pure-Python/numpy PNG codec (stdlib zlib only) for the media tier.

The container ships no image libraries, but PNG needs none: the format
is zlib + per-scanline byte filters (RFC 2083 / ISO 15948).  This module
implements the subset a training-data media pipeline actually meets —
8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
6 (RGBA), non-interlaced — as a *real* decoder: every chunk CRC is
verified, every filter type (None/Sub/Up/Average/Paeth) is undone with
the spec's exact byte arithmetic.  Alpha is dropped on decode (PIL's
``convert("RGB")`` discipline — no compositing), gray replicates to 3
channels, so the output is always (H, W, 3) uint8.

The encoder exists to make the decoder testable end-to-end without
fixtures: it writes one IHDR/IDAT/IEND stream and can be told to cycle
filter types per scanline (``filter_mode="cycle"``), which forces a
decoder bug in ANY filter path to flip output bytes — the
media_decode_resample gate then catches it against a pure-integer
DuckDB oracle (encode -> decode is byte-lossless, so the oracle is the
same arithmetic as the direct-synthesis bicubic gate).

Reference analog: the reference decodes request images before its
bicubic preprocess (crates/server/src/generation.rs:284-313 ->
crates/infer-deepseek/src/vision/preprocess.rs:73-137); this is that
codec slot, spec-implemented instead of library-wrapped.

Scale note: filters Sub/Average/Paeth carry a left-neighbor dependency,
so unfiltering is sequential per scanline (numpy across rows where
possible, Python across the width otherwise).  Decode cost is
O(pixels) per payload inside an Arrow batch — embarrassingly parallel
across rows, never a shuffle concern.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["PngFormatError", "decode_png", "encode_png"]

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (before palette expansion)
_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngFormatError(ValueError):
    """Malformed or unsupported-by-this-subset PNG stream."""


def _chunks(data: bytes):
    """Yield (type, payload) with CRC verification; stop after IEND."""
    pos = len(_SIGNATURE)
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body_end = pos + 8 + length
        if body_end + 4 > n:
            raise PngFormatError("truncated chunk")
        body = data[pos + 8:body_end]
        (crc,) = struct.unpack(">I", data[body_end:body_end + 4])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngFormatError(f"bad CRC in {ctype!r} chunk")
        yield ctype, body
        if ctype == b"IEND":
            return
        pos = body_end + 4
    raise PngFormatError("missing IEND")


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering: raw is (height, 1 + stride) uint8.

    Returns (height, stride) uint8.  Spec arithmetic is mod-256 byte
    addition; Average uses the floor of an UNtruncated sum, Paeth the
    exact predictor (RFC 2083 §6).
    """
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                line[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise PngFormatError(f"unknown filter type {ftype}")
        out[y] = line
        prev = line
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8.  Raises :class:`PngFormatError` on
    anything outside the supported subset (see module docstring)."""
    if not isinstance(data, (bytes, bytearray)) or not bytes(data).startswith(
        _SIGNATURE
    ):
        raise PngFormatError("not a PNG signature")
    data = bytes(data)
    ihdr = None
    palette = None
    idat = []
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            if ihdr is not None:
                raise PngFormatError("duplicate IHDR")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if len(body) % 3:
                raise PngFormatError("PLTE length not a multiple of 3")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        # ancillary chunks (tEXt, gAMA, ...) are CRC-checked and skipped
    if ihdr is None:
        raise PngFormatError("missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if width == 0 or height == 0:
        raise PngFormatError("zero-sized image")
    if depth != 8:
        raise PngFormatError(f"unsupported bit depth {depth}")
    if color not in _SAMPLES:
        raise PngFormatError(f"unsupported color type {color}")
    if comp != 0 or filt != 0:
        raise PngFormatError("unsupported compression/filter method")
    if interlace != 0:
        raise PngFormatError("interlaced PNG not supported")
    if not idat:
        raise PngFormatError("missing IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise PngFormatError(f"IDAT inflate failed: {exc}") from exc
    bpp = _SAMPLES[color]
    stride = width * bpp
    if len(raw) != height * (1 + stride):
        raise PngFormatError(
            f"IDAT size {len(raw)} != expected {height * (1 + stride)}"
        )
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, 1 + stride)
    px = _unfilter(rows, height, stride, bpp).reshape(height, width, bpp)
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 2:
        return px.copy()
    if color == 3:
        if palette is None:
            raise PngFormatError("palette image without PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise PngFormatError("palette index out of range")
        return palette[idx]
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # color 6: drop alpha (PIL convert("RGB"))


def _filter_line(
    line: np.ndarray, prev: np.ndarray, ftype: int, bpp: int
) -> np.ndarray:
    """Apply filter ``ftype`` to one unfiltered scanline (encoder side)."""
    n = line.size
    li = line.astype(np.int32)
    out = np.empty(n, dtype=np.uint8)
    for i in range(n):
        a = int(li[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (int(li[i]) - pred) & 0xFF
    return out


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_mode: str = "none") -> bytes:
    """(H, W, 3) uint8 -> PNG bytes (color type 2, depth 8).

    ``filter_mode``: ``"none"`` writes filter 0 everywhere; ``"cycle"``
    uses filter ``y % 5`` on scanline y, exercising every decoder filter
    path — any conformant decoder recovers identical pixels either way.
    """
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_png expects (H, W, 3) uint8")
    height, width, _ = img.shape
    flat = img.reshape(height, width * 3)
    lines = []
    prev = np.zeros(width * 3, dtype=np.uint8)
    for y in range(height):
        ftype = (y % 5) if filter_mode == "cycle" else 0
        lines.append(bytes([ftype]))
        lines.append(_filter_line(flat[y], prev, ftype, 3).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _chunk(b"IEND", b"")
    )
