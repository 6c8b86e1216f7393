"""PNG codec (functions/png.py) + the real decode slot (multimodal.py).

The decoder is spec-subset but REAL: CRC verification, all five scanline
filters, gray/palette/alpha expansion.  The strongest check is the last
test: encode -> decode -> bicubic over Spark equals the direct-synthesis
bicubic path byte-for-byte (the same invariant the media_decode_resample
gate pins against a pure-integer DuckDB oracle).
"""

import struct
import zlib

import numpy as np
import pytest

from deepseek_ocr_rs_spark.functions.png import (
    PngFormatError,
    decode_png,
    encode_png,
)

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _raw_png(width, height, depth, color, pixels_bytes, extra=b"",
             interlace=0):
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0,
                       interlace)
    return (
        _SIG + _chunk(b"IHDR", ihdr) + extra
        + _chunk(b"IDAT", zlib.compress(pixels_bytes))
        + _chunk(b"IEND", b"")
    )


def _rng_img(h, w, seed=7):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


class TestRoundTrip:
    def test_filter_none(self):
        img = _rng_img(5, 9)
        assert np.array_equal(decode_png(encode_png(img)), img)

    def test_filter_cycle_exercises_all_five(self):
        img = _rng_img(11, 7)  # >= 5 rows -> every filter type used
        assert np.array_equal(
            decode_png(encode_png(img, filter_mode="cycle")), img
        )

    def test_single_pixel_and_single_row(self):
        for shape in [(1, 1, 3), (1, 6, 3), (6, 1, 3)]:
            img = np.arange(np.prod(shape), dtype=np.uint8).reshape(shape)
            for mode in ("none", "cycle"):
                assert np.array_equal(
                    decode_png(encode_png(img, filter_mode=mode)), img
                )

    def test_extremes(self):
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        img[::2] = 255
        assert np.array_equal(
            decode_png(encode_png(img, filter_mode="cycle")), img
        )


class TestColorTypes:
    def test_grayscale_replicates(self):
        # 2x2 gray, filter 0 per line
        raw = bytes([0, 10, 20, 0, 30, 40])
        got = decode_png(_raw_png(2, 2, 8, 0, raw))
        want = np.array(
            [[[10] * 3, [20] * 3], [[30] * 3, [40] * 3]], dtype=np.uint8
        )
        assert np.array_equal(got, want)

    def test_palette(self):
        plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0, 0, 0, 255]))
        raw = bytes([0, 0, 1, 0, 2, 0])  # rows: [0,1], [2,0]
        got = decode_png(_raw_png(2, 2, 8, 3, raw, extra=plte))
        want = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]],
            dtype=np.uint8,
        )
        assert np.array_equal(got, want)

    def test_palette_index_out_of_range(self):
        plte = _chunk(b"PLTE", bytes([1, 2, 3]))
        raw = bytes([0, 0, 5])
        with pytest.raises(PngFormatError, match="palette index"):
            decode_png(_raw_png(2, 1, 8, 3, raw, extra=plte))

    def test_rgba_drops_alpha(self):
        raw = bytes([0, 1, 2, 3, 128, 4, 5, 6, 0])  # 2x1 RGBA
        got = decode_png(_raw_png(2, 1, 8, 6, raw))
        assert np.array_equal(
            got, np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)
        )

    def test_gray_alpha(self):
        raw = bytes([0, 9, 255, 17, 0])  # 2x1 gray+alpha
        got = decode_png(_raw_png(2, 1, 8, 4, raw))
        assert np.array_equal(
            got, np.array([[[9] * 3, [17] * 3]], dtype=np.uint8)
        )


class TestRejections:
    def test_not_png(self):
        with pytest.raises(PngFormatError, match="signature"):
            decode_png(b"JFIF not a png")

    def test_bad_crc(self):
        good = encode_png(_rng_img(3, 3))
        bad = bytearray(good)
        bad[-5] ^= 0xFF  # flip a byte inside IEND's CRC
        with pytest.raises(PngFormatError, match="CRC"):
            decode_png(bytes(bad))

    def test_truncated(self):
        good = encode_png(_rng_img(3, 3))
        with pytest.raises(PngFormatError):
            decode_png(good[: len(good) // 2])

    def test_interlaced_rejected(self):
        raw = bytes([0, 1, 2, 3])
        with pytest.raises(PngFormatError, match="interlaced"):
            decode_png(_raw_png(1, 1, 8, 2, raw, interlace=1))

    def test_16bit_rejected(self):
        with pytest.raises(PngFormatError, match="bit depth"):
            decode_png(_raw_png(1, 1, 16, 2, bytes(7)))

    def test_idat_size_mismatch(self):
        with pytest.raises(PngFormatError, match="IDAT size"):
            decode_png(_raw_png(2, 2, 8, 2, bytes(5)))


class TestDecodeSlot:
    def test_decode_image_png(self):
        from deepseek_ocr_rs_spark.operators.multimodal import decode_image

        img = _rng_img(4, 6)
        assert np.array_equal(decode_image(encode_png(img)), img)

    def test_decode_image_other_formats_fall_back(self):
        from deepseek_ocr_rs_spark.operators.multimodal import (
            DecodeNotAvailable,
            decode_image,
        )

        for payload in [b"", b"\xff\xd8\xff jpeg", None]:
            with pytest.raises(DecodeNotAvailable):
                decode_image(payload)

    def test_media_features_real_vs_fake(self, spark):
        """PNG payloads get image-stat features (h, w leading); opaque
        payloads keep the sha-seeded stand-in — both deterministic."""
        from deepseek_ocr_rs_spark.operators.multimodal import (
            extract_media_features,
        )

        img = _rng_img(4, 6)
        rows = [
            ("png", "image", bytearray(encode_png(img))),
            ("blob", "image", bytearray(b"not an image")),
        ]
        df = spark.createDataFrame(
            rows, "media_id string, kind string, payload binary"
        )
        got = {
            r["media_id"]: r["features"]
            for r in extract_media_features(df).collect()
        }
        assert got["png"][0] == 4.0 and got["png"][1] == 6.0
        assert got["png"][2] == pytest.approx(float(img[:, :, 0].mean()))
        assert got["blob"][0] != 4.0 or got["blob"][1] != 6.0
        # determinism across runs
        again = {
            r["media_id"]: r["features"]
            for r in extract_media_features(df).collect()
        }
        assert again == got


class TestDecodedPixelGrid:
    def test_decode_path_equals_synthesis_path(self, spark):
        """encode -> decode -> resize over Spark == direct synth -> resize:
        the invariant the media_decode_resample gate checks in DuckDB."""
        from deepseek_ocr_rs_spark.operators.multimodal import (
            bicubic_pixel_grid,
            decoded_pixel_grid,
            encode_png_payloads,
        )

        keyed = spark.createDataFrame(
            [(str(i), (i * 2654435761) % (1 << 32)) for i in range(8)],
            "doc_id string, k long",
        )
        media = encode_png_payloads(keyed, src_h=9, src_w=12)
        via_png = sorted(
            tuple(r) for r in decoded_pixel_grid(media, 5, 4).collect()
        )
        direct = sorted(
            tuple(r)
            for r in bicubic_pixel_grid(
                keyed, src_h=9, src_w=12, dst_w=5, dst_h=4
            ).collect()
        )
        assert via_png == direct
        assert len(via_png) == 8 * 5 * 4 * 3
