"""Perceptual dHash (operators/imagehash.py).

The gate (media_image_dedup) pins the exact integer chain vs DuckDB;
these tests pin the *perceptual* properties the gate can't see: hash
stability under re-encode, locality under small perturbations, and the
duplicate-grouping shape.
"""

import numpy as np
import pytest

from deepseek_ocr_rs_spark.functions.png import encode_png
from deepseek_ocr_rs_spark.functions.resample import resize_bicubic_batch
from deepseek_ocr_rs_spark.operators.imagehash import (
    DHASH_H,
    DHASH_W,
    dhash_duplicate_groups,
    dhash_media,
    dhash_pixels,
)


def _img(seed, h=24, w=32):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def _hash_of(img):
    small = resize_bicubic_batch(img[None, ...], DHASH_W, DHASH_H)
    return tuple(dhash_pixels(small)[0])


def _hamming(a, b):
    return bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")


class TestDhashProperties:
    def test_halves_are_32_bit_nonnegative(self):
        for seed in range(10):
            h1, h2 = _hash_of(_img(seed))
            assert 0 <= h1 < (1 << 32) and 0 <= h2 < (1 << 32)

    def test_identical_pixels_identical_hash(self):
        img = _img(1)
        assert _hash_of(img) == _hash_of(img.copy())

    def test_reencode_invariant(self):
        """Different PNG filter choices = different bytes, same pixels,
        same hash — the property byte-hash dedup lacks."""
        from deepseek_ocr_rs_spark.operators.multimodal import decode_image

        img = _img(2)
        a = decode_image(encode_png(img, filter_mode="none"))
        b = decode_image(encode_png(img, filter_mode="cycle"))
        assert encode_png(img) != encode_png(img, filter_mode="cycle")
        assert _hash_of(a) == _hash_of(b)

    def test_small_perturbation_small_distance(self):
        """+-1 on a few pixels moves few bits; unrelated images are far.
        (64-bit dHash: unrelated ~32 bits apart on average.)"""
        img = _img(3)
        tweaked = img.copy().astype(np.int16)
        tweaked[::7, ::9] += 1
        tweaked = np.clip(tweaked, 0, 255).astype(np.uint8)
        near = _hamming(_hash_of(img), _hash_of(tweaked))
        far = _hamming(_hash_of(img), _hash_of(_img(99)))
        assert near <= 10
        assert far >= 16
        assert near < far


class TestDhashSpark:
    def test_media_pipeline_and_grouping(self, spark):
        """Two docs share an image (different PNG bytes via filter
        choice), one is unique -> one group of 2, one group of 1."""
        shared = _img(5)
        rows = [
            ("a", bytearray(encode_png(shared, filter_mode="none"))),
            ("b", bytearray(encode_png(shared, filter_mode="cycle"))),
            ("c", bytearray(encode_png(_img(6)))),
        ]
        media = spark.createDataFrame(rows, "doc_id string, payload binary")
        groups = {
            r["doc_ids"]: r["n_images"]
            for r in dhash_duplicate_groups(dhash_media(media)).collect()
        }
        assert groups == {"a-b": 2, "c": 1}

    def test_partitioning_invariance(self, spark):
        rows = [
            (str(i), bytearray(encode_png(_img(i % 4))))
            for i in range(12)
        ]
        media = spark.createDataFrame(rows, "doc_id string, payload binary")
        a = sorted(
            tuple(r)
            for r in dhash_duplicate_groups(dhash_media(media)).collect()
        )
        b = sorted(
            tuple(r)
            for r in dhash_duplicate_groups(
                dhash_media(media.repartition(7))
            ).collect()
        )
        assert a == b

    def test_undecodable_raises(self, spark):
        media = spark.createDataFrame(
            [("x", bytearray(b"not a png"))],
            "doc_id string, payload binary",
        )
        with pytest.raises(Exception, match="DecodeNotAvailable|PNG|signature"):
            dhash_media(media).collect()
