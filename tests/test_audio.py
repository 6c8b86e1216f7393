"""WAV codec (functions/wav.py) + audio operators (operators/audio.py).

The gate pins the decode->features chain against integer DuckDB
oracles; these tests pin the codec subset itself (round trips, chunk
walking, rejections) and the operator semantics the oracle construction
assumes (channel-0 reduction, short-clip framing, tolerance contract).
"""

import struct

import numpy as np
import pytest

from deepseek_ocr_rs_spark.functions.wav import (
    WavFormatError,
    decode_wav,
    encode_wav,
)
from deepseek_ocr_rs_spark.operators.audio import (
    audio_features,
    audio_frame_energy,
    decode_audio,
    encode_wav_payloads,
    synth_pcm_batch,
)
from deepseek_ocr_rs_spark.operators.multimodal import DecodeNotAvailable


def _pcm(n, seed=3, ch=1):
    rng = np.random.default_rng(seed)
    a = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int64)
    return a.astype(np.int16).reshape(n, ch) if ch > 1 else \
        a.astype(np.int16).reshape(n)


class TestWavRoundTrip:
    def test_mono(self):
        pcm = _pcm(777)
        samples, rate = decode_wav(encode_wav(pcm, 16000))
        assert rate == 16000
        assert np.array_equal(samples[:, 0], pcm)

    def test_stereo(self):
        pcm = _pcm(123, ch=2)
        samples, rate = decode_wav(encode_wav(pcm, 44100))
        assert rate == 44100 and samples.shape == (123, 2)
        assert np.array_equal(samples, pcm)

    def test_extreme_values_survive(self):
        pcm = np.array([-32768, 32767, 0, -1, 1], dtype=np.int16)
        samples, _ = decode_wav(encode_wav(pcm, 8000))
        assert np.array_equal(samples[:, 0], pcm)

    def test_unknown_chunks_skipped(self):
        """A LIST chunk (odd-sized, so the spec pad byte is exercised)
        between fmt and data must be skipped, not tripped over."""
        raw = encode_wav(_pcm(10), 8000)
        # splice LIST chunk before 'data'
        di = raw.index(b"data")
        junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad
        spliced = raw[:di] + junk + raw[di:]
        # RIFF size field must cover the new bytes
        spliced = (
            spliced[:4]
            + struct.pack("<I", len(spliced) - 8)
            + spliced[8:]
        )
        samples, _ = decode_wav(spliced)
        assert samples.shape == (10, 1)


class TestWavRejections:
    def test_not_riff(self):
        with pytest.raises(WavFormatError, match="signature"):
            decode_wav(b"OggS not a wav")

    def test_truncated(self):
        raw = encode_wav(_pcm(50), 8000)
        with pytest.raises(WavFormatError):
            decode_wav(raw[: len(raw) - 20])

    def test_non_pcm_format_rejected(self):
        raw = bytearray(encode_wav(_pcm(4), 8000))
        fi = raw.index(b"fmt ") + 8
        raw[fi:fi + 2] = struct.pack("<H", 3)  # IEEE float
        with pytest.raises(WavFormatError, match="audio format"):
            decode_wav(bytes(raw))

    def test_8bit_rejected(self):
        raw = bytearray(encode_wav(_pcm(4), 8000))
        fi = raw.index(b"fmt ") + 8
        raw[fi + 14:fi + 16] = struct.pack("<H", 8)
        with pytest.raises(WavFormatError, match="bit depth"):
            decode_wav(bytes(raw))

    def test_decode_audio_tolerant_contract(self):
        for payload in [None, b"", b"\xff\xfb mp3 frame"]:
            with pytest.raises(DecodeNotAvailable):
                decode_audio(payload)


class TestSynth:
    def test_formula_matches_sql_semantics(self):
        # spot-check the LCG against hand-computed values
        k = np.array([7], dtype=np.int64)
        v = synth_pcm_batch(k, 3)[0]
        want = [
            ((7 * 1103515245 + i * 40503 + 12345) % 2147483647) % 65536
            - 32768
            for i in range(3)
        ]
        assert list(v.astype(int)) == want

    def test_key_range_guard(self):
        with pytest.raises(ValueError):
            synth_pcm_batch(np.array([1 << 32]), 4)


class TestOperators:
    def test_features_hand_checked(self, spark):
        df = spark.createDataFrame([("a", 5)], "doc_id string, k long")
        media = encode_wav_payloads(df, n_samples=4, sample_rate=1000)
        row = audio_features(media).collect()[0]
        v = synth_pcm_batch(np.array([5]), 4)[0].astype(np.int64)
        assert row["n_samples"] == 4
        assert row["duration_ms"] == 4 * 1000 // 1000
        assert row["peak_abs"] == int(np.abs(v).max())
        assert row["sum_sq"] == int((v * v).sum())
        assert row["n_zero_cross"] == int(((v[:-1] * v[1:]) < 0).sum())

    def test_frames_overlap_and_short_clip(self, spark):
        df = spark.createDataFrame(
            [("long", 1), ("short", 2)], "doc_id string, k long"
        )
        # 'long' gets 10 samples -> frames of 4 hop 2 -> 4 frames;
        # encode both at 10 samples then hand-shorten? simpler: frames
        # over a 10-sample clip; the short-clip case uses frame_len >
        # n_samples via a second call
        media = encode_wav_payloads(df, n_samples=10, sample_rate=100)
        rows = audio_frame_energy(media, frame_len=4, hop=2).collect()
        per_doc = {}
        for r in rows:
            per_doc.setdefault(r["doc_id"], []).append(
                (r["frame_idx"], r["frame_sum_sq"])
            )
        for doc, k in [("long", 1), ("short", 2)]:
            v = synth_pcm_batch(np.array([k]), 10)[0].astype(np.int64)
            want = [
                (f, int((v[f * 2:f * 2 + 4] ** 2).sum())) for f in range(4)
            ]
            assert sorted(per_doc[doc]) == want
        # clips shorter than one frame emit nothing
        tiny = encode_wav_payloads(df, n_samples=3, sample_rate=100)
        assert audio_frame_energy(tiny, frame_len=4, hop=2).count() == 0

    def test_partitioning_invariance(self, spark):
        df = spark.createDataFrame(
            [(str(i), i * 7) for i in range(20)], "doc_id string, k long"
        )
        media = encode_wav_payloads(df, n_samples=64, sample_rate=8000)
        a = sorted(tuple(r) for r in audio_features(media).collect())
        b = sorted(
            tuple(r)
            for r in audio_features(media.repartition(5)).collect()
        )
        assert a == b


class TestEnvelopeDedup:
    def test_gained_synth_bounds_and_formula(self):
        """int16-safe and SQL-replicable: base mod 16384 - 8192 times
        1 + nibble(k, seg) % 4, seg = i * 8 div n."""
        from deepseek_ocr_rs_spark.operators.audio import (
            synth_gained_pcm_batch,
        )

        k, n = 0xDEADBEEF, 160
        v = synth_gained_pcm_batch(np.array([k]), n)[0].astype(np.int64)
        for i in [0, 1, 19, 20, 80, 159]:
            base = ((k * 1103515245 + i * 40503 + 12345)
                    % 2147483647) % 16384 - 8192
            gain = 1 + (k >> (4 * (i * 8 // n))) % 4
            assert v[i] == base * gain, i
        assert v.min() >= -32768 and v.max() <= 32767
        with pytest.raises(ValueError):
            synth_gained_pcm_batch(np.array([1]), 8, gain_mod=5)

    def test_signatures_group_duplicates(self, spark):
        """Same key -> same signature; distinct gain staircases ->
        distinct signatures; a sub-frame clip hashes to ''."""
        from deepseek_ocr_rs_spark.operators.audio import (
            audio_duplicate_groups,
            audio_envelope_signatures,
            synth_gained_pcm_batch,
        )

        # keys chosen with visibly different nibble staircases
        df = spark.createDataFrame(
            [("a1", 0x01234567), ("a2", 0x01234567), ("b", 0x76543210)],
            "doc_id string, k long",
        )
        media = encode_wav_payloads(
            df, n_samples=2000, sample_rate=16000,
            synth=synth_gained_pcm_batch,
        )
        sigs = audio_envelope_signatures(media, frame_len=200, hop=100)
        groups = {
            r["doc_ids"]: r["n_clips"]
            for r in audio_duplicate_groups(sigs).collect()
        }
        assert groups == {"a1-a2": 2, "b": 1}

    def test_short_clip_empty_signature(self, spark):
        from deepseek_ocr_rs_spark.operators.audio import (
            audio_envelope_signatures,
        )

        df = spark.createDataFrame([("t", 9)], "doc_id string, k long")
        media = encode_wav_payloads(df, n_samples=5, sample_rate=100)
        rows = audio_envelope_signatures(
            media, frame_len=8, hop=4
        ).collect()
        assert rows[0]["signature"] == ""

    def test_bit_pack_chunking(self, spark):
        """>32 envelope bits split into 'x'-joined 32-bit chunks
        (little-endian within each chunk)."""
        from numpy.lib.stride_tricks import sliding_window_view

        from deepseek_ocr_rs_spark.operators.audio import (
            audio_envelope_signatures,
        )

        n, fl, hop = 400, 10, 10  # 40 frames -> 39 bits -> 2 chunks
        df = spark.createDataFrame([("c", 77)], "doc_id string, k long")
        media = encode_wav_payloads(df, n_samples=n, sample_rate=8000)
        sig = audio_envelope_signatures(
            media, frame_len=fl, hop=hop
        ).collect()[0]["signature"]
        v = synth_pcm_batch(np.array([77]), n)[0].astype(np.int64)
        e = (sliding_window_view(v, fl)[::hop] ** 2).sum(axis=1)
        bits = (e[1:] > e[:-1]).astype(int)
        want = "x".join(
            str(sum(int(b) << j for j, b in enumerate(bits[off:off + 32])))
            for off in range(0, len(bits), 32)
        )
        assert sig == want and "x" in sig
