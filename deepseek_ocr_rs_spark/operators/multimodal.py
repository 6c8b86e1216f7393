"""Multimodal column plumbing: binary payloads + typed metadata.

The reference's vision path (image decode -> letterbox -> tile ->
normalize: crates/infer-deepseek/src/vision/preprocess.rs,
model/mod.rs:2295-2347) maps to: an opaque ``binary`` column with a typed
metadata struct, processed by Arrow-batched ``mapInPandas``.

The codec slot is REAL for PNG as of round 5: ``decode_image`` runs the
in-repo spec decoder (functions/png.py — stdlib zlib + numpy, CRC-checked,
all five scanline filters), so PNG payloads flow decode -> PIL-exact
bicubic (functions/resample.py) end-to-end with every output byte
oracle-checked (the media_decode_resample gate).  Audio and video have
their own real codec slots (operators/audio.py -> functions/wav.py;
operators/video.py -> functions/gif.py with GCE frame timing).  Remaining
formats (JPEG, MP4, ...) raise ``DecodeNotAvailable`` — those libraries
are not in this container — and fall back to the deterministic stand-in
features, so the Spark-side plumbing stays exercised for every media
kind.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_sha256", StringType(), False),
        StructField("features", ArrayType(DoubleType()), False),
    ]
)


class DecodeNotAvailable(NotImplementedError):
    """Raised by the decoder slot for formats this container can't decode
    (and for malformed streams, so batch pipelines degrade to the
    deterministic stand-in instead of failing a 100 TB job on one file)."""


def decode_image(payload: bytes) -> np.ndarray:
    """Binary payload -> (H, W, 3) uint8.

    PNG decodes for real (functions/png.py: spec subset — 8-bit,
    gray/RGB/palette/alpha color types, non-interlaced, CRC-verified).
    Everything else — other magics, unsupported PNG variants, corrupt
    streams — raises :class:`DecodeNotAvailable`.
    """
    from deepseek_ocr_rs_spark.functions.png import PngFormatError, decode_png

    if payload is None:
        raise DecodeNotAvailable("NULL payload")
    try:
        return decode_png(bytes(payload))
    except PngFormatError as exc:
        raise DecodeNotAvailable(str(exc)) from exc


def _fake_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for decode+embed: sha256-seeded features.

    Keeps every downstream contract (shape, dtype, determinism) honest while
    the codec slot is stubbed."""
    if payload is None:
        payload = b""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim)


def _decoded_features(img: np.ndarray, dim: int) -> list:
    """Deterministic stats of a decoded (H, W, 3) image: dimensions,
    per-channel means, global min/max — padded/truncated to ``dim``."""
    base = [
        float(img.shape[0]),
        float(img.shape[1]),
        float(img[:, :, 0].mean()),
        float(img[:, :, 1].mean()),
        float(img[:, :, 2].mean()),
        float(img.min()),
        float(img.max()),
        float(img.std()),
    ]
    return (base + [0.0] * dim)[:dim]


def extract_media_features(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """mapInPandas over media rows -> per-item features.

    PNG payloads decode for real and yield image-stat features
    (:func:`_decoded_features`); undecodable payloads fall back to the
    sha256-seeded stand-in, so one corrupt file can never fail a batch.

    Batch shape: whole Arrow record batches; the payload column is only
    materialized inside the batch (never collected), so this scales to
    arbitrarily large media tables — partition by media_id upstream."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = []
            hashes = []
            sizes = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                sizes.append(len(b))
                hashes.append(hashlib.sha256(b).hexdigest())
                try:
                    img = decode_image(b)
                    feats.append(_decoded_features(img, feature_dim))
                except DecodeNotAvailable:
                    feats.append([float(x) for x in _fake_features(b, feature_dim)])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "content_sha256": hashes,
                    "features": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms).

    The decode is stubbed, but the explode/partition topology — the part
    that matters at scale — is real: sequence() is JVM-side, no UDF."""
    return (
        df.where(F.col("kind") == "video")
        .where(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("duration_ms"), F.lit(int(every_ms))
                )
            ).alias("frame_ts_ms"),
        )
    )


PIXEL_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("y", IntegerType(), False),
        StructField("x", IntegerType(), False),
        StructField("chan", IntegerType(), False),
        StructField("v", IntegerType(), False),
    ]
)


def bicubic_pixel_grid(
    df: DataFrame,
    src_h: int,
    src_w: int,
    dst_w: int,
    dst_h: int,
    id_col: str = "doc_id",
    key_col: str = "k",
) -> DataFrame:
    """Fixed-point bicubic resize over deterministic per-row images (F7).

    Each input row carries an int64 key in [0, 2**32); the key synthesizes
    an (src_h, src_w, 3) uint8 grid (the codec slot's deterministic
    stand-in — see DecodeNotAvailable), the whole Arrow batch is resized to
    (dst_h, dst_w) with ONE pair of int64 einsums (resample.rs:103-159
    semantics, PIL-exact), and the result explodes to one row per output
    pixel channel so a pure-integer SQL oracle can check every byte.

    Scale posture: per-batch work is O(rows * H * W); no shuffle is
    introduced (mapInPandas is a map), so this rides whatever partitioning
    the media table already has.
    """
    import pandas as pd

    from deepseek_ocr_rs_spark.functions.resample import (
        resize_bicubic_batch,
        synth_image_batch,
    )

    yy, xx, cc = np.indices((dst_h, dst_w, 3))
    y_flat = yy.ravel().astype(np.int32)
    x_flat = xx.ravel().astype(np.int32)
    c_flat = cc.ravel().astype(np.int32)
    px_per_img = y_flat.size

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf[key_col].to_numpy(dtype=np.int64)
            imgs = synth_image_batch(keys, src_h, src_w)
            out = resize_bicubic_batch(imgs, dst_w, dst_h)  # (N,dst_h,dst_w,3)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf[id_col].to_numpy(), px_per_img),
                    "y": np.tile(y_flat, n),
                    "x": np.tile(x_flat, n),
                    "chan": np.tile(c_flat, n),
                    "v": out.reshape(n, -1).ravel().astype(np.int32),
                }
            )

    return df.select(id_col, key_col).mapInPandas(run, schema=PIXEL_SCHEMA)


def encode_png_payloads(
    df: DataFrame,
    src_h: int,
    src_w: int,
    id_col: str = "doc_id",
    key_col: str = "k",
) -> DataFrame:
    """(id, key) -> (id, payload binary): deterministic synthetic images
    serialized as REAL PNG streams, cycling the scanline filter type per
    row (y % 5) so a decoder bug in any of the five filter paths flips
    payload-derived bytes downstream."""
    import pandas as pd

    from deepseek_ocr_rs_spark.functions.png import encode_png
    from deepseek_ocr_rs_spark.functions.resample import synth_image_batch

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf[key_col].to_numpy(dtype=np.int64)
            imgs = synth_image_batch(keys, src_h, src_w)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        encode_png(img, filter_mode="cycle") for img in imgs
                    ],
                }
            )

    return df.select(id_col, key_col).mapInPandas(
        run, schema="doc_id string, payload binary"
    )


def decoded_pixel_grid(
    media: DataFrame,
    dst_w: int,
    dst_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """The REAL vision preprocess path: PNG payload -> decode_image ->
    PIL-exact fixed-point bicubic -> one row per output pixel channel.

    This is :func:`bicubic_pixel_grid` with the synthesis replaced by the
    actual codec (generation.rs:284-313 -> preprocess.rs:73-137 in the
    reference): any byte the decoder gets wrong lands in the output and
    fails the integer oracle.  All images in one call must share a source
    size (the batch resize is one einsum pair); undecodable payloads
    raise — this operator is for curated media, use
    :func:`extract_media_features` for tolerant sweeps.
    """
    import pandas as pd

    from deepseek_ocr_rs_spark.functions.resample import resize_bicubic_batch

    yy, xx, cc = np.indices((dst_h, dst_w, 3))
    y_flat = yy.ravel().astype(np.int32)
    x_flat = xx.ravel().astype(np.int32)
    c_flat = cc.ravel().astype(np.int32)
    px_per_img = y_flat.size

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            imgs = np.stack(
                [decode_image(p) for p in pdf[payload_col]]
            )
            out = resize_bicubic_batch(imgs, dst_w, dst_h)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf[id_col].to_numpy(), px_per_img),
                    "y": np.tile(y_flat, n),
                    "x": np.tile(x_flat, n),
                    "chan": np.tile(c_flat, n),
                    "v": out.reshape(n, -1).ravel().astype(np.int32),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        run, schema=PIXEL_SCHEMA
    )
