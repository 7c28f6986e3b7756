"""MSAA mask LUT tests (reference: renderer/mask.go)."""

import numpy as np

from jello_tpu.renderer.mask import (
    MASK16_WIDTH,
    MASK8_WIDTH,
    mask_lut_16,
    mask_lut_8,
)


def test_lut_shapes():
    assert mask_lut_8().shape == (32 * 32,)
    assert mask_lut_16().shape == (64 * 64,)
    assert mask_lut_8().dtype == np.uint8
    assert mask_lut_16().dtype == np.uint16


def test_lut8_extremes():
    lut = mask_lut_8()
    # translation ~1 (u = width-1) for negative slopes: half-plane covers
    # nearly everything -> all 8 samples set.
    assert lut[MASK8_WIDTH - 1] == 0xFF
    # translation ~0: almost nothing covered.
    assert bin(int(lut[0])).count("1") <= 1


def _assert_monotone(lut, width, height):
    # Coverage grows with translation for negative slopes (first half of
    # rows) and shrinks for positive slopes (second half; the reference
    # flips the translation for isPos, mask.go:19-21).
    for v in range(height):
        row = lut[v * width : (v + 1) * width]
        pops = [bin(int(x)).count("1") for x in row]
        diffs = [b - a for a, b in zip(pops, pops[1:])]
        if v < height // 2:
            assert all(d >= 0 for d in diffs), (v, pops)
        else:
            assert all(d <= 0 for d in diffs), (v, pops)


def test_lut8_monotone_in_translation():
    _assert_monotone(mask_lut_8(), 32, 32)


def test_lut16_monotone_in_translation():
    _assert_monotone(mask_lut_16(), 64, 64)


def test_lut16_extremes():
    lut = mask_lut_16()
    assert lut[MASK16_WIDTH - 1] == 0xFFFF
