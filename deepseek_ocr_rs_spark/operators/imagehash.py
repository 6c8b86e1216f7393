"""Perceptual image hashing (dHash) + duplicate grouping over media rows.

Training corpora dedupe images the way they dedupe text: not by byte
hash (one re-encode defeats it) but by a perceptual fingerprint of the
decoded pixels.  dHash (difference hash) is the bucketed-linear member
of that family — resize to a (9 wide x 8 tall) grid, compare each pixel
to its right neighbor, pack the 64 booleans into an integer — and
composes entirely from pieces this repo already trusts byte-exactly:
the real PNG decoder (functions/png.py) and the PIL-exact fixed-point
bicubic (functions/resample.py).  Every step is integer arithmetic, so
a DuckDB oracle can replay the whole chain (decode is byte-lossless,
the resize has embedded integer coefficient tables, the gray transform
is ``(77r + 151g + 28b) >> 8``), making this the rare *perceptual*
operator with an exact cross-engine gate.

Outputs pack the 64 bits as two BIGINT halves (``h1`` rows 0-3, ``h2``
rows 4-7, 32 bits each) — bit 63 of a single int64 would flip its sign
and complicate cross-engine hashing; two halves keep every value
positive and hamming distance is ``bit_count(h1 ^ h1') +
bit_count(h2 ^ h2')`` on both engines.

Scale shape (100 TB of images / 1000 executors): decode+hash is one
mapInPandas pass (no shuffle, rides the media table's partitioning);
duplicate grouping is ONE hash aggregate on (h1, h2) — map-side
combinable, ids-only shuffle.  Near-dup (hamming <= t) retrieval reuses
the banded discipline of operators/dedup.py simhash_candidates: band
the 64 bits, bucket-join, verify — never all-pairs.

Reference analog: the reference fingerprints request images by content
digest for its fixture matrix (benchsuite orchestrator case keys); this
is the decoded-pixel analog that survives re-encoding.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dhash_media", "dhash_pixels", "dhash_duplicate_groups"]

DHASH_W = 9  # resize width (8 comparisons per row)
DHASH_H = 8

# integer ITU-ish luma: (77 r + 151 g + 28 b) >> 8  (weights sum to 256)
_LUMA_R, _LUMA_G, _LUMA_B = 77, 151, 28


def dhash_pixels(imgs: np.ndarray) -> np.ndarray:
    """(N, 8, 9, 3) uint8 ALREADY-RESIZED batch -> (N, 2) int64 halves."""
    g = (
        imgs[..., 0].astype(np.int64) * _LUMA_R
        + imgs[..., 1].astype(np.int64) * _LUMA_G
        + imgs[..., 2].astype(np.int64) * _LUMA_B
    ) >> 8
    bits = (g[:, :, 1:] > g[:, :, :-1]).astype(np.int64)  # (N, 8, 8)
    weights = 1 << np.arange(32, dtype=np.int64).reshape(4, 8)
    h1 = (bits[:, :4, :] * weights).sum(axis=(1, 2))
    h2 = (bits[:, 4:, :] * weights).sum(axis=(1, 2))
    return np.stack([h1, h2], axis=1)


def dhash_media(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, PNG payload) -> (id, h1, h2): decode, 9x8 bicubic, dHash.

    All payloads in one call share a decoded size (one einsum-pair batch
    resize); undecodable payloads raise — curated-media contract, same
    as decoded_pixel_grid.
    """
    import pandas as pd

    from deepseek_ocr_rs_spark.functions.resample import resize_bicubic_batch
    from deepseek_ocr_rs_spark.operators.multimodal import decode_image

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            imgs = np.stack([decode_image(p) for p in pdf[payload_col]])
            small = resize_bicubic_batch(imgs, DHASH_W, DHASH_H)
            hh = dhash_pixels(small)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "h1": hh[:, 0],
                    "h2": hh[:, 1],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        run, schema="doc_id string, h1 long, h2 long"
    )


def dhash_duplicate_groups(hashes: DataFrame) -> DataFrame:
    """(doc_id, h1, h2) -> one row per perceptual-duplicate group.

    Output: ``(h1, h2, n_images, doc_ids)`` with doc_ids sorted and
    '-'-joined (the type-stable serialization contract).  ONE map-side
    combinable aggregate; downstream keeps min(doc_ids) per group the
    way exact text dedup does.
    """
    return (
        hashes.groupBy("h1", "h2")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.array_join(
                F.sort_array(F.collect_list("doc_id")), "-"
            ).alias("doc_ids"),
        )
    )
