"""PIL-exact fixed-point bicubic resampling (SURVEY §2 F7).

The reference reimplements PIL's bicubic resize with integer fixed-point
arithmetic so outputs are bit-exact across platforms
(crates/infer-deepseek/src/vision/resample.rs:1-160): per-axis coefficient
rows are computed in f64, normalized, then quantized to i32 at
``PRECISION_BITS = 22`` with half-away-from-zero rounding; each separable
pass accumulates ``bias + sum(pixel * weight)`` in i64 and clips with an
arithmetic right shift (``clip8``).  This module replicates that contract
with vectorized numpy (dense per-axis weight matrices + int64 matmuls —
one BLAS-shaped pass per axis instead of the reference's per-pixel loops),
so the same coefficients and the same integer rounding produce the same
bytes.

Determinism notes that make this oracle-checkable in SQL:

* the coefficient table for a fixed (in_size, out_size) pair is a pure
  function — it can be embedded as an integer VALUES literal in a DuckDB
  oracle, turning the whole resample into exact integer arithmetic on both
  engines;
* ``>>`` on negative int64 is an arithmetic shift (floor division by
  2**PRECISION_BITS) in Rust, numpy, and DuckDB alike.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np

PRECISION_BITS = 22
_PRECISION_SCALE = float(1 << PRECISION_BITS)
ROUNDING_BIAS = 1 << (PRECISION_BITS - 1)

_A = -0.5  # Catmull-Rom / PIL bicubic "a"


def _bicubic_kernel(x: np.ndarray) -> np.ndarray:
    """PIL's bicubic kernel (a = -0.5), vectorized (resample.rs:26-36)."""
    ax = np.abs(x)
    inner = ((_A + 2.0) * ax - (_A + 3.0)) * ax * ax + 1.0
    outer = (((ax - 5.0) * ax + 8.0) * ax - 4.0) * _A
    return np.where(ax < 1.0, inner, np.where(ax < 2.0, outer, 0.0))


def _round_half_towards_zero(v: float) -> int:
    """(v + 0.5) floored for v >= 0, ceiled for v < 0 (resample.rs:18-24)."""
    return int(math.floor(v + 0.5)) if v >= 0.0 else int(math.ceil(v + 0.5))


def resample_coeffs(in_size: int, out_size: int) -> List[Tuple[int, List[int]]]:
    """Per-output-index (xmin, [int weights]) rows (resample.rs:38-101).

    Weights are normalized f64 rows quantized to int at 2**22 with
    half-away-from-zero rounding; ``sum(weights) ~= 2**22`` per row.
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    ss = 1.0 / filterscale

    rows: List[Tuple[int, List[int]]] = []
    for out_index in range(out_size):
        center = (out_index + 0.5) * scale
        xmin = max(_round_half_towards_zero(center - support), 0)
        xmax = min(_round_half_towards_zero(center + support), in_size)
        if xmin >= in_size:
            xmin = max(in_size - 1, 0)
        if xmax <= xmin:
            xmax = xmin + 1
        length = xmax - xmin
        pos = xmin + np.arange(length, dtype=np.float64)
        weights = _bicubic_kernel((pos - center + 0.5) * ss)
        total = float(weights.sum())
        if total != 0.0:
            weights = weights / total
        # half-away-from-zero quantization, truncated toward zero like
        # Rust's `as i32` (resample.rs:84-90)
        quant = [
            int(w * _PRECISION_SCALE + 0.5) if w >= 0.0
            else int(w * _PRECISION_SCALE - 0.5)
            for w in weights.tolist()
        ]
        rows.append((xmin, quant))
    return rows


def coeff_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) int64 weight matrix for one axis.

    Dense is the right call for the tile/thumbnail sizes this engine
    resizes (the reference's vision path tops out at 1024px); rows are
    ksize-sparse so a 4K input would want a banded variant.
    """
    mat = np.zeros((out_size, in_size), dtype=np.int64)
    for out_index, (xmin, weights) in enumerate(resample_coeffs(in_size, out_size)):
        mat[out_index, xmin:xmin + len(weights)] = weights
    return mat


def _clip8(acc: np.ndarray) -> np.ndarray:
    """bias-added i64 accumulator -> u8 (resample.rs:13-16)."""
    return np.clip(acc >> PRECISION_BITS, 0, 255).astype(np.uint8)


def resize_bicubic(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Resize an (H, W, C) uint8 image, bit-exact vs the reference.

    Two separable integer passes (horizontal then vertical), each
    ``clip8(bias + sum(px * w))`` — the intermediate is re-quantized to u8
    between passes exactly like resample.rs:118-158, which is load-bearing
    for bit-exactness (a fused float path rounds differently).
    """
    if img.ndim == 2:
        img = img[:, :, None]
    src_h, src_w, channels = img.shape
    if out_w <= 0 or out_h <= 0:
        return np.zeros((max(out_h, 0), max(out_w, 0), channels), dtype=np.uint8)

    wx = coeff_matrix(src_w, out_w)          # (out_w, src_w)
    wy = coeff_matrix(src_h, out_h)          # (out_h, src_h)

    # horizontal: (H, W, C) x (out_w, W) -> (H, out_w, C)
    acc = np.einsum("hwc,ow->hoc", img.astype(np.int64), wx) + ROUNDING_BIAS
    horizontal = _clip8(acc)
    # vertical: (H, out_w, C) x (out_h, H) -> (out_h, out_w, C)
    acc = np.einsum("hwc,yh->ywc", horizontal.astype(np.int64), wy) + ROUNDING_BIAS
    return _clip8(acc)


def resize_bicubic_batch(imgs: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Batch variant: (N, H, W, C) uint8 -> (N, out_h, out_w, C).

    One einsum per axis for the WHOLE batch — this is the shape the Arrow
    batch path wants (no per-row Python in the hot loop)."""
    n, src_h, src_w, channels = imgs.shape
    wx = coeff_matrix(src_w, out_w)
    wy = coeff_matrix(src_h, out_h)
    acc = np.einsum("nhwc,ow->nhoc", imgs.astype(np.int64), wx) + ROUNDING_BIAS
    horizontal = _clip8(acc)
    acc = np.einsum("nhwc,yh->nywc", horizontal.astype(np.int64), wy) + ROUNDING_BIAS
    return _clip8(acc)


# --- deterministic synthetic pixel grid (shared with the SQL oracle) ----

_LCG_MUL = 1103515245
_LCG_ADD = 12345
_Y_STEP = 40503
_X_STEP = 9973
_C_STEP = 131
_LCG_MOD = 2147483647


def synth_image(key: int, height: int, width: int, channels: int = 3) -> np.ndarray:
    """Deterministic uint8 grid from an int64 key — SQL-replicable.

    pixel(y, x, c) = ((key*M + y*Y + x*X + c*C + A) % (2**31 - 1)) % 256
    with key in [0, 2**32) so every term is nonnegative (Python, numpy
    int64 and DuckDB BIGINT agree on ``%`` for nonnegative operands) and
    the largest intermediate (< 2**63) never overflows int64.
    """
    if not 0 <= key < (1 << 32):
        raise ValueError("key must fit in [0, 2**32)")
    y = np.arange(height, dtype=np.int64)[:, None, None] * _Y_STEP
    x = np.arange(width, dtype=np.int64)[None, :, None] * _X_STEP
    c = np.arange(channels, dtype=np.int64)[None, None, :] * _C_STEP
    v = (np.int64(key) * _LCG_MUL + y + x + c + _LCG_ADD) % _LCG_MOD % 256
    return v.astype(np.uint8)


def synth_image_batch(keys: np.ndarray, height: int, width: int,
                      channels: int = 3) -> np.ndarray:
    """(N,) int64 keys -> (N, H, W, C) uint8, same formula as synth_image."""
    keys = np.asarray(keys, dtype=np.int64)
    if keys.size and (keys.min() < 0 or keys.max() >= (1 << 32)):
        raise ValueError("keys must fit in [0, 2**32)")
    k = keys[:, None, None, None] * _LCG_MUL
    y = np.arange(height, dtype=np.int64)[None, :, None, None] * _Y_STEP
    x = np.arange(width, dtype=np.int64)[None, None, :, None] * _X_STEP
    c = np.arange(channels, dtype=np.int64)[None, None, None, :] * _C_STEP
    v = (k + y + x + c + _LCG_ADD) % _LCG_MOD % 256
    return v.astype(np.uint8)


def coeff_values_sql(in_size: int, out_size: int, alias: str,
                     dst: str, src: str) -> str:
    """The axis coefficient table as a DuckDB VALUES literal.

    Embedding the integers (rather than re-deriving the f64 kernel in SQL)
    makes the oracle pure integer arithmetic — no cross-engine float risk.
    """
    rows = []
    for out_index, (xmin, weights) in enumerate(resample_coeffs(in_size, out_size)):
        for i, w in enumerate(weights):
            rows.append(f"({out_index},{xmin + i},{w})")
    return f"(VALUES {','.join(rows)}) AS {alias}({dst},{src},w)"
