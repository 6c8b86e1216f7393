"""Video media tier: real animated-GIF decode + timestamp frame sampling.

Completes the media column family (operators/multimodal.py = image/PNG,
operators/audio.py = audio/WAV) with the MULTI-FRAME case: deterministic
palette frames are synthesized per key, serialized through the REAL
GIF89a codec (functions/gif.py — LZW, interlace, local color tables,
GCE delays), decoded back, and reduced to *integer-exact* per-sample
statistics.  Frame timing comes from the decoded Graphic Control
Extension delays, so the sampling arithmetic — which frame is on screen
at t = 0, every_ms, 2*every_ms, ... — is exercised end-to-end through
the container format, not through a metadata column.

The encode->decode round trip is byte-exact on the palette indices
(identity grayscale palette: decoded RGB = (v, v, v)), so a DuckDB
oracle re-derives every sampled value from the synthesis formula
codec-free; a codec bug anywhere (LZW widths, interlace order, local
color tables, delay parsing) flips oracle-checked integers.

This replaces the former frame-sampling *plan* stub
(multimodal.frame_sample_plan synthesized timestamps from a duration
column; the decode slot raised DecodeNotAvailable for video).  The plan
query remains as the JVM-side topology gate; this module is the real
codec path.

Scale shape: synth/encode/decode/sample are all mapInPandas map stages
(no shuffle; rides the media table's partitioning).  Sampling explodes
~duration/every_ms rows per clip but stays a map — at 100 TB of video
the frame-sample table is written partition-aligned with its source.

Reference analog: media ingestion + preprocessing
(crates/server/src/generation.rs:284-313 ->
crates/infer-deepseek/src/vision/preprocess.rs:73-137); multi-view
sampling mirrors the reference's one-global-plus-tiles view selection
(model/mod.rs:127-142) in the time axis.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame

from deepseek_ocr_rs_spark.functions.gif import (
    GifFormatError,
    decode_gif,
    encode_gif,
)
from deepseek_ocr_rs_spark.operators.multimodal import DecodeNotAvailable

__all__ = [
    "synth_frame_batch",
    "frame_delays_ms",
    "decode_video",
    "encode_gif_payloads",
    "video_frame_samples",
    "video_dhash_signatures",
    "video_duplicate_groups",
]

# the repo's shared LCG constants (functions/resample.py synth grid) plus
# a frame-axis step (prime, distinct from the y/x/c steps)
_MUL = 1103515245
_F_STEP = 7919
_Y_STEP = 40503
_X_STEP = 9973
_ADD = 12345
_MOD = 2147483647


def synth_frame_batch(
    keys: np.ndarray, n_frames: int, height: int, width: int
) -> np.ndarray:
    """(N,) int64 keys -> (N, n_frames, H, W) uint8 palette indices,
    SQL-replicable: ``((k*MUL + f*7919 + y*40503 + x*9973 + 12345)
    % 2147483647) % 256``."""
    keys = np.asarray(keys, dtype=np.int64)
    if keys.size and (keys.min() < 0 or keys.max() >= (1 << 32)):
        raise ValueError("keys must fit in [0, 2**32)")
    k = keys[:, None, None, None] * _MUL
    f = np.arange(n_frames, dtype=np.int64)[None, :, None, None] * _F_STEP
    y = np.arange(height, dtype=np.int64)[None, None, :, None] * _Y_STEP
    x = np.arange(width, dtype=np.int64)[None, None, None, :] * _X_STEP
    return ((k + f + y + x + _ADD) % _MOD % 256).astype(np.uint8)


def frame_delays_ms(n_frames: int) -> list[int]:
    """Deterministic per-frame display times: 40/70/100 ms cycling —
    non-uniform so the timestamp->frame interval mapping is nontrivial
    (SQL replica: ``(4 + 3 * (f % 3)) * 10``)."""
    return [(4 + 3 * (f % 3)) * 10 for f in range(n_frames)]


def decode_video(payload: bytes):
    """Binary payload -> ((n, H, W, 3) uint8 frames, delays in ms); GIF
    decodes for real, everything else raises :class:`DecodeNotAvailable`
    (the tolerant batch contract shared with decode_image/decode_audio)."""
    if payload is None:
        raise DecodeNotAvailable("NULL payload")
    try:
        return decode_gif(bytes(payload))
    except GifFormatError as exc:
        raise DecodeNotAvailable(str(exc)) from exc


def encode_gif_payloads(
    df: DataFrame,
    n_frames: int,
    src_h: int,
    src_w: int,
    id_col: str = "doc_id",
    key_col: str = "k",
) -> DataFrame:
    """(id, key) -> (id, payload): deterministic frames as real animated
    GIF89a bytes, cycling interlace and local-color-table paths per frame
    (functions/gif.py ``cycle_paths`` — the PNG filter-cycling analog)."""
    import pandas as pd

    delays = frame_delays_ms(n_frames)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf[key_col].to_numpy(dtype=np.int64)
            clips = synth_frame_batch(keys, n_frames, src_h, src_w)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [encode_gif(clip, delays) for clip in clips],
                }
            )

    return df.select(id_col, key_col).mapInPandas(
        run, schema="doc_id string, payload binary"
    )


def video_frame_samples(
    media: DataFrame,
    every_ms: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Timestamp sampling over REAL decoded video: one row per
    (clip, sample_ts_ms) for ts = 0, every_ms, ... < total duration,
    carrying the index and integer pixel sum of the frame on screen at
    that instant ([start, start+delay) intervals from the decoded GCE
    delays).

    Output: (doc_id, sample_ts_ms, frame_idx, n_frames, duration_ms,
    frame_pixel_sum) — all integers, so the gate's DuckDB oracle replays
    the synthesis + interval arithmetic exactly.  Undecodable payloads
    are dropped (the tolerant batch contract; quarantine them upstream
    via extract_media_features if counts must balance)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "sample_ts_ms": [],
                "frame_idx": [],
                "n_frames": [],
                "duration_ms": [],
                "frame_pixel_sum": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    frames, delays = decode_video(payload)
                except DecodeNotAvailable:
                    continue
                n = frames.shape[0]
                # R channel only: palette is grayscale, R = G = B = index
                sums = frames[:, :, :, 0].astype(np.int64).sum(axis=(1, 2))
                starts = np.concatenate(
                    ([0], np.cumsum(np.asarray(delays, dtype=np.int64))[:-1])
                )
                total = int(starts[-1] + delays[-1]) if n else 0
                for ts in range(0, total, every_ms):
                    f = int(np.searchsorted(starts, ts, side="right") - 1)
                    out["doc_id"].append(doc_id)
                    out["sample_ts_ms"].append(ts)
                    out["frame_idx"].append(f)
                    out["n_frames"].append(n)
                    out["duration_ms"].append(total)
                    out["frame_pixel_sum"].append(int(sums[f]))
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "sample_ts_ms": pd.Series(
                        out["sample_ts_ms"], dtype="int32"
                    ),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "duration_ms": pd.Series(
                        out["duration_ms"], dtype="int32"
                    ),
                    "frame_pixel_sum": pd.Series(
                        out["frame_pixel_sum"], dtype="int64"
                    ),
                }
            )

    return media.select(id_col, "payload").mapInPandas(
        run,
        schema=(
            "doc_id string, sample_ts_ms int, frame_idx int, n_frames int,"
            " duration_ms int, frame_pixel_sum long"
        ),
    )


def video_dhash_signatures(
    media: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, GIF payload) -> (id, signature): perceptual video fingerprint.

    Every frame is decoded, bicubic-resized to the dHash 9x8 grid and
    difference-hashed (operators/imagehash.py — the byte-exact integer
    chain), then the per-frame ``h1xh2`` halves are '-'-joined in frame
    order: two clips share a signature iff every frame matches
    perceptually IN ORDER (re-encoding survives; frame reorder/drop
    breaks it, as video dedup wants).  String serialization is the
    repo's type-stable cross-engine hashing contract (ann_pq_codes,
    search_posting_lists).

    Scale shape: one mapInPandas pass, all frames of a batch resized in
    ONE einsum pair; no shuffle.  All payloads in one call share a
    decoded frame size (curated-media contract, same as dhash_media);
    undecodable payloads raise."""
    import pandas as pd

    from deepseek_ocr_rs_spark.functions.resample import resize_bicubic_batch
    from deepseek_ocr_rs_spark.operators.imagehash import (
        DHASH_H,
        DHASH_W,
        dhash_pixels,
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            clips = [decode_video(p)[0] for p in pdf["payload"]]
            counts = [c.shape[0] for c in clips]
            small = resize_bicubic_batch(
                np.concatenate(clips), DHASH_W, DHASH_H
            )
            hh = dhash_pixels(small)
            sigs = []
            off = 0
            for c in counts:
                sigs.append(
                    "-".join(
                        f"{int(h1)}x{int(h2)}" for h1, h2 in hh[off:off + c]
                    )
                )
                off += c
            yield pd.DataFrame({"doc_id": pdf[id_col], "signature": sigs})

    return media.select(id_col, "payload").mapInPandas(
        run, schema="doc_id string, signature string"
    )


def video_duplicate_groups(signatures: DataFrame) -> DataFrame:
    """(doc_id, signature) -> one row per perceptual-duplicate clip group.

    Output ``(signature, n_clips, doc_ids)``, doc_ids sorted and
    '-'-joined.  ONE map-side combinable aggregate on the signature
    string — ids-only shuffle, same scale posture as
    dhash_duplicate_groups."""
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
