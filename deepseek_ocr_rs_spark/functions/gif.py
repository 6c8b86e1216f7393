"""Pure-Python/numpy GIF89a codec for the media tier (multi-frame video).

The container ships no video/image libraries, but animated GIF needs none:
the format is palette indices + LZW (GIF89a spec, ISO-ish via W3C's
GIF89a.txt).  This module implements the subset a frame-sampling pipeline
actually meets — 8-bit global/local color tables, Graphic Control
Extension delays, interlaced and non-interlaced frames, full-canvas
compositing with disposal methods 0/1/2 and transparency — as a *real*
decoder: variable-width LSB-first LZW with clear/EOI handling (including
the KwKwK first-unseen-code case), sub-block framing, and the 4-pass
interlace row permutation are all spec arithmetic.

The encoder exists to make the decoder testable end-to-end without
fixtures: it writes one animated GIF89a stream and deliberately cycles
decoder paths per frame — every other frame is interlaced, and every
third frame uses a LOCAL color table that stores ``index ^ 0xA5`` with a
correspondingly permuted palette (the decoded RGB is unchanged, so a
decoder that ignores local tables or misorders interlace rows flips
oracle-checked bytes downstream while correct decoders agree with the
pure-integer SQL oracle).

Reference analog: the reference decodes request images before its vision
preprocess (crates/server/src/generation.rs:284-313 ->
crates/infer-deepseek/src/vision/preprocess.rs:73-137); this is that
codec slot for the multi-frame (video) case, spec-implemented instead of
library-wrapped.

Scale note: LZW is inherently sequential per frame, O(pixels) per payload
inside an Arrow batch — embarrassingly parallel across media rows, never
a shuffle concern.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["GifFormatError", "decode_gif", "encode_gif", "gray_palette"]

_HEADERS = (b"GIF89a", b"GIF87a")

# 4-pass interlace: (start row, step) per pass, spec appendix E
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class GifFormatError(ValueError):
    """Malformed or unsupported-by-this-subset GIF stream."""


def gray_palette() -> np.ndarray:
    """256-entry identity grayscale palette: palette[i] = (i, i, i)."""
    ramp = np.arange(256, dtype=np.uint8)
    return np.stack([ramp, ramp, ramp], axis=1)


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable 3..12-bit codes)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """LZW-decode ``data`` (sub-blocks already stripped) into ``expected``
    palette indices."""
    if not 2 <= min_code_size <= 8:
        raise GifFormatError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(expected, dtype=np.uint8)
    n_out = 0

    # table entries as (prefix, suffix byte); roots are implicit
    prefix = np.zeros(4096, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    width = min_code_size + 1
    next_code = eoi + 1
    prev = -1

    bitbuf = 0
    bitcnt = 0
    pos = 0
    n = len(data)
    stack = bytearray()
    while True:
        while bitcnt < width:
            if pos >= n:
                raise GifFormatError("LZW stream truncated (no EOI)")
            bitbuf |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width

        if code == clear:
            width = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise GifFormatError("first LZW code is not a root")
            if n_out >= expected:
                raise GifFormatError("LZW output overruns frame")
            out[n_out] = code
            n_out += 1
            prev = code
            continue

        if code < next_code:
            cur = code
        elif code == next_code:  # KwKwK: prev + first byte of prev
            cur = prev
        else:
            raise GifFormatError(f"LZW code {code} out of range")

        # expand cur (walk prefix chain), remembering its first byte
        stack.clear()
        c = cur
        while c >= clear:
            stack.append(suffix[c])
            c = int(prefix[c])
        first = c
        stack.append(c)
        if code == next_code:
            stack.insert(0, first)  # the KwKwK extra byte (appended last)
        m = len(stack)
        if n_out + m > expected:
            raise GifFormatError("LZW output overruns frame")
        out[n_out:n_out + m] = np.frombuffer(bytes(stack), dtype=np.uint8)[::-1]
        n_out += m

        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code if code < next_code else cur
    if n_out != expected:
        raise GifFormatError(f"LZW produced {n_out} of {expected} pixels")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int = 8) -> bytes:
    """Palette indices -> GIF LZW bytes (without sub-block framing)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    codes: list[int] = []
    table: dict[tuple[int, int], int] = {}
    width_changes: list[tuple[int, int]] = []  # (code position, new width)
    width = min_code_size + 1
    next_code = eoi + 1

    codes.append(clear)
    prev = -1
    for v in indices.ravel().tolist():
        if prev < 0:
            prev = v
            continue
        key = (prev, v)
        hit = table.get(key)
        if hit is not None:
            prev = hit
            continue
        codes.append(prev)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                # width grows when next_code EXCEEDS the current range —
                # i.e. the first code emitted AFTER the table fills the
                # range is wider (matches decoder's post-insert check)
                width_changes.append((len(codes), width + 1))
                width += 1
        else:
            codes.append(clear)
            table.clear()
            width_changes.append((len(codes), min_code_size + 1))
            width = min_code_size + 1
            next_code = eoi + 1
        prev = v
    if prev >= 0:
        codes.append(prev)
    codes.append(eoi)

    out = bytearray()
    bitbuf = 0
    bitcnt = 0
    width = min_code_size + 1
    changes = dict(width_changes)
    for i, code in enumerate(codes):
        w = changes.get(i)
        if w is not None:
            width = w
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap raw bytes into <=255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            raise GifFormatError("truncated sub-block stream")
        size = data[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise GifFormatError("truncated sub-block")
        out += data[pos:pos + size]
        pos += size


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Reorder (h, w) rows from interlaced transmission order."""
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        n_rows = len(range(start, h, step))
        out[start::step] = rows[src:src + n_rows]
        src += n_rows
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    """Reorder (h, w) rows INTO interlaced transmission order."""
    h = rows.shape[0]
    parts = [rows[start::step] for start, step in _INTERLACE_PASSES]
    out = np.concatenate(parts, axis=0)
    if out.shape[0] != h:
        raise GifFormatError("interlace row accounting failed")
    return out


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def decode_gif(data: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF bytes -> ((n_frames, H, W, 3) uint8 RGB, delays in ms).

    Frames are composited onto the logical-screen canvas per the spec:
    disposal 0/1 leave the canvas, disposal 2 restores the background
    color; transparent pixels leave the underlying canvas untouched.
    Raises :class:`GifFormatError` outside the supported subset."""
    data = bytes(data)
    if len(data) < 13 or data[:6] not in _HEADERS:
        raise GifFormatError("not a GIF87a/GIF89a stream")
    width, height, packed, bg_idx, _aspect = struct.unpack(
        "<HHBBB", data[6:13]
    )
    if width == 0 or height == 0:
        raise GifFormatError("zero logical screen size")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise GifFormatError("truncated global color table")
        gct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8)
        gct = gct.reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((height, width), dtype=np.uint8)
    if gct is not None:
        canvas[:] = bg_idx if bg_idx < gct.shape[0] else 0

    frames: list[np.ndarray] = []
    delays_ms: list[int] = []
    delay_cs = 0
    transparent = -1
    disposal = 0
    n = len(data)
    while True:
        if pos >= n:
            raise GifFormatError("missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n:
                raise GifFormatError("truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _read_sub_blocks(data, pos)
            if label == 0xF9:  # Graphic Control Extension
                if len(body) < 4:
                    raise GifFormatError("short GCE body")
                gce_packed = body[0]
                delay_cs = struct.unpack("<H", body[1:3])[0]
                disposal = (gce_packed >> 2) & 0x07
                if disposal > 2:  # 3 = restore-previous: out of subset
                    raise GifFormatError(f"unsupported disposal {disposal}")
                transparent = body[3] if gce_packed & 0x01 else -1
            # 0xFF (application/NETSCAPE), 0xFE (comment): skipped
            continue
        if block != 0x2C:
            raise GifFormatError(f"unknown block 0x{block:02x}")

        if pos + 9 > n:
            raise GifFormatError("truncated image descriptor")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        if left + fw > width or top + fh > height or fw == 0 or fh == 0:
            raise GifFormatError("frame exceeds logical screen")
        lct = None
        if fpacked & 0x80:
            cnt = 2 << (fpacked & 0x07)
            if pos + 3 * cnt > len(data):
                raise GifFormatError("truncated local color table")
            lct = np.frombuffer(data[pos:pos + 3 * cnt], dtype=np.uint8)
            lct = lct.reshape(cnt, 3)
            pos += 3 * cnt
        palette = lct if lct is not None else gct
        if palette is None:
            raise GifFormatError("frame has no color table")
        if pos >= n:
            raise GifFormatError("missing LZW min code size")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        idx = _lzw_decode(lzw, mcs, fw * fh).reshape(fh, fw)
        if idx.max(initial=0) >= palette.shape[0]:
            raise GifFormatError("pixel index outside color table")
        if fpacked & 0x40:
            idx = _deinterlace(idx)

        # composite indices onto the canvas (transparency-aware), then
        # materialize RGB through THIS frame's active palette
        region = canvas[top:top + fh, left:left + fw]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = idx[mask]
        else:
            region[:] = idx
        frame_rgb = palette[canvas]
        frames.append(frame_rgb)
        delays_ms.append(delay_cs * 10)

        if disposal == 2:  # restore to background color
            canvas[top:top + fh, left:left + fw] = (
                bg_idx if gct is not None and bg_idx < gct.shape[0] else 0
            )
        delay_cs = 0
        transparent = -1
        disposal = 0

    if not frames:
        raise GifFormatError("no image frames")
    return np.stack(frames), delays_ms


def encode_gif(
    frames: np.ndarray,
    delays_ms: list[int],
    cycle_paths: bool = True,
) -> bytes:
    """(n_frames, H, W) uint8 palette indices -> animated GIF89a bytes
    against the identity grayscale palette (decoded RGB = (v, v, v)).

    With ``cycle_paths`` (the default, mirroring PNG's
    ``filter_mode="cycle"``): odd frames are interlaced and every third
    frame ships a LOCAL color table holding ``gray(j ^ 0xA5)`` at entry j
    with indices stored pre-permuted — decoded output is identical, but a
    decoder that skips LCTs or botches interlace diverges."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise GifFormatError("frames must be (n, h, w) palette indices")
    n_frames, h, w = frames.shape
    if n_frames == 0 or len(delays_ms) != n_frames:
        raise GifFormatError("need one delay per frame")

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 entries
    out += gray_palette().tobytes()

    # NETSCAPE2.0 looping application extension (exercises the skip path)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    for f in range(n_frames):
        delay_cs = max(0, int(delays_ms[f]) // 10)
        out += b"\x21\xf9"
        out += bytes([4, 0x00])  # GCE: no disposal, no transparency
        out += struct.pack("<H", delay_cs)
        out += bytes([0, 0])  # transparent idx, terminator

        interlaced = cycle_paths and (f % 2 == 1)
        use_lct = cycle_paths and (f % 3 == 2)
        fpacked = (0x40 if interlaced else 0) | (0x80 | 0x07 if use_lct else 0)
        out.append(0x2C)  # image separator
        out += struct.pack("<HHHHB", 0, 0, w, h, fpacked)

        idx = frames[f]
        if use_lct:
            # LCT[j] = gray(j ^ 0xA5); store index v ^ 0xA5 so RGB is
            # unchanged while the table path is genuinely exercised
            ramp = (np.arange(256, dtype=np.uint8) ^ 0xA5)
            out += np.stack([ramp, ramp, ramp], axis=1).tobytes()
            idx = idx ^ np.uint8(0xA5)
        if interlaced:
            idx = _interlace(idx)
        out.append(8)  # LZW min code size
        out += _sub_blocks(_lzw_encode(idx, 8))

    out.append(0x3B)
    return bytes(out)
