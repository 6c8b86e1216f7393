"""F7 fixed-point bicubic resample: PIL-exactness discipline.

The reference computes bit-exact resizes via integer fixed-point separable
convolution (crates/infer-deepseek/src/vision/resample.rs:1-160).  These
tests pin the same contract on the numpy kernel: exact integer invariants,
batch/single agreement, clamp engagement on overshoot, and a golden output.
"""

import numpy as np
import pytest

from deepseek_ocr_rs_spark.functions.resample import (
    PRECISION_BITS,
    coeff_matrix,
    resample_coeffs,
    resize_bicubic,
    resize_bicubic_batch,
    synth_image,
    synth_image_batch,
)


@pytest.mark.parametrize(
    "in_size,out_size",
    [(12, 5), (9, 4), (5, 12), (7, 7), (1024, 640), (3, 1), (640, 1024)],
)
def test_quantized_rows_sum_to_precision_scale(in_size, out_size):
    # normalized f64 rows quantized half-away at 2**22: the integer row sum
    # can drift from 2**22 by at most one rounding step per tap
    for xmin, weights in resample_coeffs(in_size, out_size):
        assert abs(sum(weights) - (1 << PRECISION_BITS)) <= len(weights)
        assert 0 <= xmin < in_size


def test_bounds_cover_input_and_stay_in_range():
    for in_size, out_size in [(12, 5), (5, 12), (2, 3), (1, 4)]:
        for xmin, weights in resample_coeffs(in_size, out_size):
            assert xmin + len(weights) <= in_size
            assert len(weights) >= 1


@pytest.mark.parametrize("value", [0, 1, 127, 200, 255])
def test_constant_image_preserved_exactly(value):
    img = np.full((9, 12, 3), value, dtype=np.uint8)
    assert (resize_bicubic(img, 5, 4) == value).all()    # downscale
    assert (resize_bicubic(img, 25, 17) == value).all()  # upscale


def test_same_size_resize_is_identity():
    img = synth_image(123456789, 9, 12)
    assert (resize_bicubic(img, 12, 9) == img).all()


def test_horizontal_flip_commutes():
    img = synth_image(42, 9, 12)
    out = resize_bicubic(img, 5, 4)
    flipped = resize_bicubic(np.ascontiguousarray(img[:, ::-1]), 5, 4)
    assert (flipped == out[:, ::-1]).all()


def test_batch_matches_single():
    keys = np.array([1, 99, 123456789, (1 << 32) - 1], dtype=np.int64)
    imgs = synth_image_batch(keys, 9, 12)
    batch = resize_bicubic_batch(imgs, 5, 4)
    for i, k in enumerate(keys):
        assert (imgs[i] == synth_image(int(k), 9, 12)).all()
        assert (batch[i] == resize_bicubic(imgs[i], 5, 4)).all()


def test_clamp_engages_on_overshoot():
    # a hard 0/255 step: bicubic's negative lobes overshoot past the range
    # and clip8 must clamp — verify outputs stay in range AND that the
    # unclamped accumulator would have left it (the clamp is load-bearing)
    img = np.zeros((8, 16, 1), dtype=np.uint8)
    img[:, 8:] = 255
    wx = coeff_matrix(16, 7)
    acc = np.einsum("hwc,ow->hoc", img.astype(np.int64), wx) \
        + (1 << (PRECISION_BITS - 1))
    shifted = acc >> PRECISION_BITS
    assert shifted.min() < 0 or shifted.max() > 255
    out = resize_bicubic(img, 7, 3)
    assert out.min() >= 0 and out.max() <= 255


def test_golden_output_pinned():
    # regression pin: channel 0 of synth_image(123456789, 9x12) -> 5x4
    img = synth_image(123456789, 9, 12)
    out = resize_bicubic(img, 5, 4)
    expected = np.array(
        [
            [158, 176, 173, 173, 144],
            [112, 83, 97, 110, 125],
            [141, 176, 168, 145, 126],
            [80, 93, 77, 130, 146],
        ],
        dtype=np.uint8,
    )
    assert (out[:, :, 0] == expected).all()


def test_synth_image_rejects_out_of_range_keys():
    with pytest.raises(ValueError):
        synth_image(-1, 4, 4)
    with pytest.raises(ValueError):
        synth_image_batch(np.array([1 << 32]), 4, 4)
