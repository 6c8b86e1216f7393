"""Multimodal column plumbing: binary payloads + typed metadata.

The reference's vision path (image decode -> letterbox -> tile ->
normalize: crates/infer-deepseek/src/vision/preprocess.rs,
model/mod.rs:2295-2347) maps to: an opaque ``binary`` column with a typed
metadata struct, processed by Arrow-batched ``mapInPandas``.  The actual
codec work (image/audio decode) is STUBBED — the libraries are not in this
container — behind ``DecodeNotAvailable``; everything Spark-side (schema,
batching, partitioning, UDF signatures, deterministic fake features) is real
and tested, so swapping in a real decoder is a one-function change.
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
    """Raised by the real-decoder slot; container has no codec libraries."""


def decode_image(payload: bytes):  # pragma: no cover - stub slot
    """Real implementation would return an HxWx3 uint8 array (PIL/OpenCV)."""
    raise DecodeNotAvailable("image codecs not present in this environment")


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


def extract_media_features(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """mapInPandas over media rows -> per-item features.

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
                    decode_image(b)  # the real slot — currently always raises
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
