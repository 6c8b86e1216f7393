"""GIF89a codec (functions/gif.py) + the video frame-sampling operator
(operators/video.py).

The decoder is spec-subset but REAL: variable-width LSB-first LZW with
clear/EOI and the KwKwK case, 4-pass interlace, local color tables,
GCE delays, transparency-aware full-canvas compositing.  The strongest
check is the last test: encode -> decode -> sample over Spark equals the
direct synthesis + interval arithmetic (the same invariant the
media_video_frames gate pins against a pure-integer DuckDB oracle).
"""

import struct

import numpy as np
import pytest

from deepseek_ocr_rs_spark.functions.gif import (
    GifFormatError,
    _interlace,
    _deinterlace,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _rng_frames(n, h, w, seed=7):
    return np.random.default_rng(seed).integers(
        0, 256, size=(n, h, w), dtype=np.uint8
    )


def _expect_rgb(frames):
    return np.stack([np.stack([f, f, f], axis=-1) for f in frames])


class TestLzw:
    def test_round_trip_random(self):
        rng = np.random.default_rng(3)
        for size in (1, 2, 255, 256, 1000, 5000):
            data = rng.integers(0, 256, size=size, dtype=np.uint8)
            enc = _lzw_encode(data, 8)
            assert (_lzw_decode(enc, 8, size) == data).all()

    def test_round_trip_repetitive_kwkwk(self):
        # aaaaa... is the classic KwKwK trigger (code == next_code)
        for pattern in (b"\x00" * 500, b"abcabcabc" * 60, b"aab" * 200):
            data = np.frombuffer(pattern, dtype=np.uint8)
            enc = _lzw_encode(data, 8)
            assert (_lzw_decode(enc, 8, data.size) == data).all()

    def test_table_full_clear_reset(self):
        # > 4096 distinct phrases forces the encoder's mid-stream clear
        rng = np.random.default_rng(11)
        data = rng.integers(0, 256, size=30000, dtype=np.uint8)
        enc = _lzw_encode(data, 8)
        assert (_lzw_decode(enc, 8, data.size) == data).all()

    def test_truncated_stream_raises(self):
        data = np.arange(64, dtype=np.uint8)
        enc = _lzw_encode(data, 8)
        with pytest.raises(GifFormatError, match="truncated|overruns"):
            _lzw_decode(enc[: len(enc) // 2], 8, 64)

    def test_wrong_expected_count_raises(self):
        data = np.arange(64, dtype=np.uint8)
        enc = _lzw_encode(data, 8)
        with pytest.raises(GifFormatError):
            _lzw_decode(enc, 8, 63)  # overrun detected

    def test_bad_min_code_size(self):
        with pytest.raises(GifFormatError, match="min code size"):
            _lzw_decode(b"\x00", 9, 1)


class TestInterlace:
    def test_inverse(self):
        for h in (1, 2, 3, 7, 8, 17, 40):
            rows = np.arange(h * 4, dtype=np.uint8).reshape(h, 4)
            assert (_deinterlace(_interlace(rows)) == rows).all()


class TestRoundTrip:
    def test_cycled_paths(self):
        """Interlace (odd frames) + LCT permutation (every 3rd frame)."""
        frames = _rng_frames(6, 40, 60)
        delays = [40, 70, 100, 40, 70, 100]
        dec, dms = decode_gif(encode_gif(frames, delays))
        assert dms == delays
        assert (dec == _expect_rgb(frames)).all()

    def test_plain(self):
        frames = _rng_frames(3, 8, 10, seed=5)
        dec, dms = decode_gif(
            encode_gif(frames, [10, 20, 30], cycle_paths=False)
        )
        assert dms == [10, 20, 30]
        assert (dec == _expect_rgb(frames)).all()

    def test_single_pixel_single_frame(self):
        frames = np.full((1, 1, 1), 200, dtype=np.uint8)
        dec, dms = decode_gif(encode_gif(frames, [0]))
        assert dec.shape == (1, 1, 1, 3)
        assert dec[0, 0, 0, 0] == 200 and dms == [0]

    def test_constant_frames(self):
        const = np.zeros((3, 16, 16), dtype=np.uint8)
        const[1] = 255
        dec, _ = decode_gif(encode_gif(const, [10, 20, 30]))
        assert (dec[:, :, :, 1] == const).all()

    def test_width_growth_and_table_full(self):
        # 80x80 random indices exceed 4096 LZW entries within one frame
        frames = _rng_frames(1, 80, 80, seed=13)
        dec, _ = decode_gif(encode_gif(frames, [10], cycle_paths=False))
        assert (dec == _expect_rgb(frames)).all()


class TestAdversarial:
    def test_not_gif(self):
        for blob in (b"", b"GIF", b"PNG89a" + b"\x00" * 20, b"\x89PNG"):
            with pytest.raises(GifFormatError):
                decode_gif(blob)

    def test_gif87a_header_accepted(self):
        frames = _rng_frames(1, 4, 4)
        blob = bytearray(encode_gif(frames, [10]))
        blob[4] = ord("7")  # GIF89a -> GIF87a
        dec, _ = decode_gif(bytes(blob))
        assert (dec == _expect_rgb(frames)).all()

    def test_missing_trailer(self):
        blob = encode_gif(_rng_frames(1, 4, 4), [10])
        with pytest.raises(GifFormatError, match="trailer|truncated"):
            decode_gif(blob[:-1])

    def test_corrupt_sub_block_length(self):
        blob = bytearray(encode_gif(_rng_frames(1, 8, 8), [10]))
        # inflate the last data sub-block length byte past stream end
        blob[-10] = 0xFF
        with pytest.raises(GifFormatError):
            decode_gif(bytes(blob))

    def test_frame_exceeds_screen(self):
        blob = bytearray(encode_gif(_rng_frames(1, 4, 4), [10]))
        # image separator after header(13) + GCT(768) + NETSCAPE(19) +
        # GCE(8); patch the descriptor width to 5 (> logical screen 4)
        idx = 13 + 768 + 19 + 8
        assert blob[idx] == 0x2C
        blob[idx + 5:idx + 7] = struct.pack("<H", 5)
        with pytest.raises(GifFormatError):
            decode_gif(bytes(blob))

    def test_unsupported_disposal(self):
        blob = bytearray(encode_gif(_rng_frames(1, 4, 4), [10]))
        gce = bytes(blob).index(b"\x21\xf9")
        blob[gce + 3] = 3 << 2  # disposal 3 = restore previous
        with pytest.raises(GifFormatError, match="disposal"):
            decode_gif(bytes(blob))

    def test_zero_screen(self):
        with pytest.raises(GifFormatError):
            decode_gif(b"GIF89a" + struct.pack("<HHBBB", 0, 0, 0, 0, 0)
                       + b"\x3b")


class TestTransparencyCompositing:
    def test_transparent_pixels_keep_canvas(self):
        """Hand-build a 2-frame GIF: frame 2 marks index 7 transparent —
        those pixels must show frame 1's pixels through."""
        f1 = np.full((4, 4), 50, dtype=np.uint8)
        f2 = np.full((4, 4), 9, dtype=np.uint8)
        f2[0, 0] = 7  # transparent slot
        blob = bytearray()
        blob += b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x87, 0, 0)
        ramp = np.arange(256, dtype=np.uint8)
        blob += np.stack([ramp, ramp, ramp], axis=1).tobytes()
        for frame, transparent in ((f1, -1), (f2, 7)):
            packed = 0x01 if transparent >= 0 else 0x00
            blob += b"\x21\xf9" + bytes([4, packed, 10, 0,
                                         max(transparent, 0), 0])
            blob += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
            blob.append(8)
            lzw = _lzw_encode(frame.ravel(), 8)
            blob += bytes([len(lzw)]) + lzw + b"\x00"
        blob.append(0x3B)
        dec, dms = decode_gif(bytes(blob))
        assert dms == [100, 100]
        assert dec[1, 0, 0, 0] == 50  # transparent -> frame-1 pixel
        assert dec[1, 1, 1, 0] == 9


class TestVideoOperator:
    def test_frame_delays_schedule(self):
        from deepseek_ocr_rs_spark.operators.video import frame_delays_ms

        assert frame_delays_ms(6) == [40, 70, 100, 40, 70, 100]

    def test_decode_video_contract(self):
        from deepseek_ocr_rs_spark.operators.multimodal import (
            DecodeNotAvailable,
        )
        from deepseek_ocr_rs_spark.operators.video import decode_video

        for payload in (b"", b"RIFFxxxx", None):
            with pytest.raises(DecodeNotAvailable):
                decode_video(payload)

    def test_samples_equal_synthesis(self, spark):
        """encode -> decode -> sample over Spark == direct synthesis +
        interval arithmetic: the media_video_frames gate invariant."""
        from deepseek_ocr_rs_spark.operators.video import (
            encode_gif_payloads,
            frame_delays_ms,
            synth_frame_batch,
            video_frame_samples,
        )

        keyed = spark.createDataFrame(
            [(str(i), (i * 2654435761) % (1 << 32)) for i in range(6)],
            "doc_id string, k long",
        )
        media = encode_gif_payloads(keyed, n_frames=6, src_h=8, src_w=10)
        got = {
            (r["doc_id"], r["sample_ts_ms"]): (
                r["frame_idx"], r["duration_ms"], r["frame_pixel_sum"]
            )
            for r in video_frame_samples(media, every_ms=50).collect()
        }
        delays = frame_delays_ms(6)
        starts = np.concatenate(([0], np.cumsum(delays)[:-1]))
        total = int(sum(delays))
        n_rows = 0
        for i in range(6):
            k = (i * 2654435761) % (1 << 32)
            sums = (
                synth_frame_batch(np.array([k]), 6, 8, 10)[0]
                .astype(np.int64).sum(axis=(1, 2))
            )
            for ts in range(0, total, 50):
                f = int(np.searchsorted(starts, ts, side="right") - 1)
                assert got[(str(i), ts)] == (f, total, int(sums[f]))
                n_rows += 1
        assert len(got) == n_rows

    def test_undecodable_rows_dropped(self, spark):
        from deepseek_ocr_rs_spark.operators.video import (
            video_frame_samples,
        )

        df = spark.createDataFrame(
            [("bad", bytearray(b"not a gif"))],
            "doc_id string, payload binary",
        )
        assert video_frame_samples(df, every_ms=50).count() == 0


class TestVideoDedup:
    def _media(self, spark, keys):
        from deepseek_ocr_rs_spark.operators.video import (
            encode_gif_payloads,
        )

        keyed = spark.createDataFrame(
            [(str(i), k) for i, k in enumerate(keys)],
            "doc_id string, k long",
        )
        return encode_gif_payloads(keyed, n_frames=4, src_h=8, src_w=10)

    def test_planted_duplicates_group(self, spark):
        from deepseek_ocr_rs_spark.operators.video import (
            video_dhash_signatures,
            video_duplicate_groups,
        )

        # docs 0/2 and 1/3 share keys -> two groups of 2; doc 4 is alone
        media = self._media(spark, [111, 222, 111, 222, 333])
        groups = {
            r["doc_ids"]: r["n_clips"]
            for r in video_duplicate_groups(
                video_dhash_signatures(media)
            ).collect()
        }
        assert groups == {"0-2": 2, "1-3": 2, "4": 1}

    def test_signature_is_frame_ordered(self, spark):
        """Same frames, different order -> different signatures (the
        property byte-hash dedup shares but pooled/bag-of-frames
        hashing would lose)."""
        import pandas as pd

        from deepseek_ocr_rs_spark.functions.gif import encode_gif
        from deepseek_ocr_rs_spark.operators.video import (
            synth_frame_batch,
            video_dhash_signatures,
        )

        frames = synth_frame_batch(np.array([999]), 4, 8, 10)[0]
        fwd = encode_gif(frames, [10, 10, 10, 10])
        rev = encode_gif(frames[::-1], [10, 10, 10, 10])
        df = spark.createDataFrame(
            [("fwd", bytearray(fwd)), ("rev", bytearray(rev))],
            "doc_id string, payload binary",
        )
        sigs = {
            r["doc_id"]: r["signature"]
            for r in video_dhash_signatures(df).collect()
        }
        assert sigs["fwd"] != sigs["rev"]
        assert sigs["fwd"] == "-".join(sigs["rev"].split("-")[::-1])

    def test_reencode_invariance(self, spark):
        """cycle_paths on vs off produces different GIF bytes but the
        same perceptual signature — the property dedup exists for."""
        from deepseek_ocr_rs_spark.functions.gif import encode_gif
        from deepseek_ocr_rs_spark.operators.video import (
            synth_frame_batch,
            video_dhash_signatures,
        )

        frames = synth_frame_batch(np.array([424242]), 4, 8, 10)[0]
        a = encode_gif(frames, [10] * 4, cycle_paths=True)
        b = encode_gif(frames, [10] * 4, cycle_paths=False)
        assert a != b
        df = spark.createDataFrame(
            [("a", bytearray(a)), ("b", bytearray(b))],
            "doc_id string, payload binary",
        )
        sigs = {r["doc_id"]: r["signature"]
                for r in video_dhash_signatures(df).collect()}
        assert sigs["a"] == sigs["b"]
