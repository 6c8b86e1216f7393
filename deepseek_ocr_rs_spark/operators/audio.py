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
    "decode_audio",
    "encode_wav_payloads",
    "audio_features",
    "audio_frame_energy",
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


def encode_wav_payloads(
    df: DataFrame,
    n_samples: int,
    sample_rate: int,
    id_col: str = "doc_id",
    key_col: str = "k",
) -> DataFrame:
    """(id, key) -> (id, payload): deterministic PCM as real WAV bytes."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf[key_col].to_numpy(dtype=np.int64)
            pcm = synth_pcm_batch(keys, n_samples)
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
