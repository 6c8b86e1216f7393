"""Pure-Python/numpy WAV (RIFF PCM) codec for the audio media tier.

Companion to functions/png.py: the container ships no audio libraries,
but canonical PCM WAV needs none — RIFF chunk framing + little-endian
16-bit samples.  Implemented subset: ``RIFF/WAVE`` with a ``fmt `` chunk
of audio format 1 (PCM), 16-bit depth, 1 or 2 channels, any sample
rate; unknown chunks (LIST, fact, cue) are length-skipped per spec.
Everything outside the subset raises :class:`WavFormatError`, so batch
pipelines can degrade to a stand-in instead of failing a job.

The decode is byte-lossless (PCM is uncompressed), so — exactly like
the PNG gate — an encode->decode round trip lets a pure-integer DuckDB
oracle check every downstream sample statistic without implementing
RIFF in SQL.

Reference analog: the reference's media ingestion decodes request
payloads before preprocessing (crates/server/src/generation.rs:284-313);
this is the audio-side codec slot, spec-implemented.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["WavFormatError", "decode_wav", "encode_wav"]


class WavFormatError(ValueError):
    """Malformed or unsupported-by-this-subset WAV stream."""


def decode_wav(data: bytes):
    """WAV bytes -> ((n_samples, n_channels) int16 array, sample_rate).

    Walks RIFF sub-chunks; requires one ``fmt `` (PCM, 16-bit, 1-2
    channels) before ``data``; skips unknown chunks; tolerates the
    spec's pad byte after odd-sized chunks.
    """
    if not isinstance(data, (bytes, bytearray)):
        raise WavFormatError("not bytes")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavFormatError("not a RIFF/WAVE signature")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise WavFormatError("truncated RIFF payload")
    pos = 12
    fmt = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (csize,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + csize]
        if len(body) < csize:
            raise WavFormatError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if csize < 16:
                raise WavFormatError("fmt chunk too short")
            audio_fmt, n_ch, rate, _brate, _align, depth = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise WavFormatError(f"unsupported audio format {audio_fmt}")
            if depth != 16:
                raise WavFormatError(f"unsupported bit depth {depth}")
            if n_ch not in (1, 2):
                raise WavFormatError(f"unsupported channel count {n_ch}")
            fmt = (n_ch, rate)
        elif cid == b"data":
            if fmt is None:
                raise WavFormatError("data chunk before fmt")
            n_ch, rate = fmt
            if csize % (2 * n_ch):
                raise WavFormatError("data size not sample-aligned")
            samples = np.frombuffer(body, dtype="<i2").reshape(-1, n_ch)
            return samples.astype(np.int16), rate
        pos += 8 + csize + (csize & 1)  # spec: odd chunks get a pad byte
    raise WavFormatError("missing data chunk")


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 -> canonical PCM WAV bytes."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[1] not in (1, 2) or arr.dtype != np.int16:
        raise ValueError("encode_wav expects (n,) or (n, 1|2) int16")
    n_ch = arr.shape[1]
    payload = arr.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, int(sample_rate),
        int(sample_rate) * n_ch * 2, n_ch * 2, 16,
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
