"""Audio media tier: real WAV decode + integer-exact signal features.

Mirrors the image tier's structure (operators/multimodal.py +
functions/png.py): deterministic PCM is synthesized per key, serialized
through the REAL RIFF codec (functions/wav.py), decoded back, and
reduced to *integer-exact* per-clip and per-frame statistics, so a
DuckDB oracle can re-derive every value from the synthesis formula —
the encode->decode round trip is byte-lossless, which makes the oracle
codec-free.

Features are chosen to be the ones an audio curation pipeline actually
filters on, expressed without floats:

* ``duration_ms``   exact ``n * 1000 div rate``
* ``peak_abs``      max |sample| (clipping detector)
* ``sum_sq``        total energy as a BIGINT (RMS = sqrt(sum_sq/n) is a
                    consumer-side float; the gate hashes the exact int)
* ``n_zero_cross``  strict sign flips (v[i] * v[i+1] < 0) — the classic
                    cheap voicing/noisiness proxy
* per-frame energy  sliding windows (frame_len, hop) via numpy stride
                    tricks — the framing primitive under every
                    spectral feature

Scale shape: synth/encode/decode/reduce are all mapInPandas map stages
(no shuffle; rides the media table's partitioning).  Per-frame output
explodes rows but stays a map — at 100 TB of audio the frame table is
written partition-aligned with its source.

Reference analog: media ingestion + preprocessing
(crates/server/src/generation.rs:284-313); the per-turn metrics
discipline follows the reference's per-stage counters
(benchsuite/models/base.py stage totals).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame

from deepseek_ocr_rs_spark.functions.wav import (
    WavFormatError,
    decode_wav,
    encode_wav,
)
from deepseek_ocr_rs_spark.operators.multimodal import DecodeNotAvailable

__all__ = [
    "synth_pcm_batch",
    "synth_gained_pcm_batch",
    "decode_audio",
    "encode_wav_payloads",
    "audio_features",
    "audio_frame_energy",
    "audio_envelope_signatures",
    "audio_duplicate_groups",
]

# the repo's shared LCG constants (functions/resample.py synth grid)
_MUL = 1103515245
_STEP = 40503
_ADD = 12345
_MOD = 2147483647


def synth_pcm_batch(keys: np.ndarray, n_samples: int) -> np.ndarray:
    """(N,) int64 keys -> (N, n_samples) int16, SQL-replicable:
    ``((k*MUL + i*STEP + ADD) % MOD) % 65536 - 32768``."""
    keys = np.asarray(keys, dtype=np.int64)
    if keys.size and (keys.min() < 0 or keys.max() >= (1 << 32)):
        raise ValueError("keys must fit in [0, 2**32)")
    i = np.arange(n_samples, dtype=np.int64)[None, :]
    v = (keys[:, None] * _MUL + i * _STEP + _ADD) % _MOD % 65536 - 32768
    return v.astype(np.int16)


def decode_audio(payload: bytes):
    """Binary payload -> ((n, ch) int16, rate); WAV decodes for real,
    everything else raises :class:`DecodeNotAvailable` (the tolerant
    batch contract shared with decode_image)."""
    if payload is None:
        raise DecodeNotAvailable("NULL payload")
    try:
        return decode_wav(bytes(payload))
    except WavFormatError as exc:
        raise DecodeNotAvailable(str(exc)) from exc


def synth_gained_pcm_batch(
    keys: np.ndarray,
    n_samples: int,
    n_segments: int = 8,
    gain_mod: int = 4,
) -> np.ndarray:
    """Key-distinct LOUDNESS CONTOURS for envelope-fingerprint fixtures.

    :func:`synth_pcm_batch` gives every key the same stationary noise —
    k only phase-shifts the LCG, so energy envelopes (and any
    gain-invariant fingerprint) collide across keys (measured: 50 keys
    -> 14 distinct 8-bit envelopes).  Here the base noise is scaled by
    a per-key amplitude STAIRCASE — segment s of ``n_segments`` gets
    gain ``1 + (k >> 4*s) % gain_mod`` (nibble s of the key) — so the
    envelope carries ~``gain_mod**n_segments`` distinguishable shapes
    while staying SQL-replicable:
    ``(((k*MUL + i*STEP + ADD) % MOD) % 16384 - 8192)
    * (1 + (k >> (4 * (i * n_segments div n))) % gain_mod)``.
    Base range ±8192 times max gain ``gain_mod`` must stay inside
    int16 (default 4 * 8192 = 32768 exactly hits the edge: -8192*4 =
    -32768 ok, 8191*4 = 32764 ok).
    """
    keys = np.asarray(keys, dtype=np.int64)
    if keys.size and (keys.min() < 0 or keys.max() >= (1 << 32)):
        raise ValueError("keys must fit in [0, 2**32)")
    if gain_mod * 8192 > 32768:
        raise ValueError("gain_mod overflows int16")
    i = np.arange(n_samples, dtype=np.int64)[None, :]
    base = (keys[:, None] * _MUL + i * _STEP + _ADD) % _MOD % 16384 - 8192
    seg = i * n_segments // n_samples
    gain = 1 + (keys[:, None] >> (4 * seg)) % gain_mod
    return (base * gain).astype(np.int16)


def encode_wav_payloads(
    df: DataFrame,
    n_samples: int,
    sample_rate: int,
    id_col: str = "doc_id",
    key_col: str = "k",
    synth=None,
) -> DataFrame:
    """(id, key) -> (id, payload): deterministic PCM as real WAV bytes.

    ``synth``: ``(keys, n_samples) -> (N, n_samples) int16``; defaults
    to :func:`synth_pcm_batch`."""
    import pandas as pd

    synth_fn = synth if synth is not None else synth_pcm_batch

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf[key_col].to_numpy(dtype=np.int64)
            pcm = synth_fn(keys, n_samples)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        encode_wav(row, sample_rate) for row in pcm
                    ],
                }
            )

    return df.select(id_col, key_col).mapInPandas(
        run, schema="doc_id string, payload binary"
    )


def audio_features(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, WAV payload) -> integer-exact per-clip signal features.

    Output: ``(doc_id, n_samples long, sample_rate long, duration_ms
    long, peak_abs long, sum_sq long, n_zero_cross long)``.  Stereo
    clips reduce over channel 0 — the deterministic (and
    oracle-replicable) choice; mix down upstream if a mono mix is
    wanted.  Undecodable payloads raise (curated-media contract).
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {
                "doc_id": [], "n_samples": [], "sample_rate": [],
                "duration_ms": [], "peak_abs": [], "sum_sq": [],
                "n_zero_cross": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, rate = decode_audio(payload)
                v = samples[:, 0].astype(np.int64)
                n = v.size
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out["sample_rate"].append(rate)
                out["duration_ms"].append(n * 1000 // rate)
                out["peak_abs"].append(int(np.abs(v).max()) if n else 0)
                out["sum_sq"].append(int((v * v).sum()))
                out["n_zero_cross"].append(
                    int(((v[:-1] * v[1:]) < 0).sum()) if n > 1 else 0
                )
            yield pd.DataFrame(out)

    schema = (
        "doc_id string, n_samples long, sample_rate long, duration_ms long,"
        " peak_abs long, sum_sq long, n_zero_cross long"
    )
    return media.select(id_col, payload_col).mapInPandas(run, schema=schema)


def audio_frame_energy(
    media: DataFrame,
    frame_len: int,
    hop: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, WAV payload) -> one row per analysis frame.

    Output: ``(doc_id, frame_idx int, frame_sum_sq long)`` for frames
    ``[f*hop, f*hop + frame_len)``, ``f in [0, 1 + (n-frame_len) div
    hop)`` (clips shorter than one frame emit nothing).  Overlapping
    windows via numpy stride tricks — one memory view, no copy — the
    framing primitive under FFT/MFCC-style features.
    """
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, fidx, energy = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, _rate = decode_audio(payload)
                v = samples[:, 0].astype(np.int64)
                if v.size < frame_len:
                    continue
                windows = sliding_window_view(v, frame_len)[::hop]
                e = (windows * windows).sum(axis=1)
                ids.extend([doc_id] * len(e))
                fidx.extend(range(len(e)))
                energy.extend(int(x) for x in e)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="object"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "frame_sum_sq": pd.Series(energy, dtype="int64"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        run, schema="doc_id string, frame_idx int, frame_sum_sq long"
    )


def audio_envelope_signatures(
    media: DataFrame,
    frame_len: int,
    hop: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, WAV payload) -> (doc_id, signature): perceptual audio
    fingerprint from the energy envelope.

    The clip is framed exactly as :func:`audio_frame_energy` (so the
    two operators agree on window arithmetic), then each consecutive
    frame pair contributes one bit — 1 iff energy RISES
    (``e[f+1] > e[f]``) — the time-axis analog of the image tier's
    right-neighbor dHash bit (operators/imagehash.py): the hash tracks
    the SHAPE of the loudness contour, not its absolute level, which is
    what survives re-encoding and gain normalization while reorder or
    content edits flip bits.  Bits are packed little-endian into 32-bit
    BIGINT chunks joined by 'x' — the repo's type-stable cross-engine
    string contract (ann_pq_codes, video_dhash_signatures).  Clips
    shorter than two frames hash to the empty signature.

    Scale shape: one mapInPandas pass (decode + stride-view framing +
    bit pack, all vectorized); no shuffle.
    """
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            sigs = []
            for payload in pdf[payload_col]:
                samples, _rate = decode_audio(payload)
                v = samples[:, 0].astype(np.int64)
                if v.size < frame_len:
                    sigs.append("")
                    continue
                windows = sliding_window_view(v, frame_len)[::hop]
                e = (windows * windows).sum(axis=1)
                bits = (e[1:] > e[:-1]).astype(np.int64)
                if not bits.size:
                    sigs.append("")
                    continue
                chunks = []
                for off in range(0, bits.size, 32):
                    blk = bits[off:off + 32]
                    chunks.append(
                        str(int((blk << np.arange(blk.size)).sum()))
                    )
                sigs.append("x".join(chunks))
            yield pd.DataFrame({"doc_id": pdf[id_col], "signature": sigs})

    return media.select(id_col, payload_col).mapInPandas(
        run, schema="doc_id string, signature string"
    )


def audio_duplicate_groups(signatures: DataFrame) -> DataFrame:
    """(doc_id, signature) -> one row per perceptual-duplicate clip group.

    Output ``(signature, n_clips, doc_ids)``, doc_ids sorted and
    '-'-joined.  ONE map-side combinable aggregate on the signature
    string — ids-only shuffle, the same scale posture as
    dhash_duplicate_groups / video_duplicate_groups.
    """
    from pyspark.sql import functions as F

    return (
        signatures.groupBy("signature")
        .agg(
            F.count("*").cast("long").alias("n_clips"),
            F.array_join(
                F.sort_array(F.collect_list("doc_id")), "-"
            ).alias("doc_ids"),
        )
    )
