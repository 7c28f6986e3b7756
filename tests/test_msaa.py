"""MSAA fine-rasterization modes (exact per-sample winding)."""

import numpy as np

import jello_tpu as jt
from jello_tpu.cpu import render_numpy
from jello_tpu.renderer.params import AaConfig, RenderParams

DIAMOND = jt.BezPath().move_to(128, 28).line_to(228, 128).line_to(128, 228).line_to(28, 128).close()


def _render(aa, path=DIAMOND, rule=jt.Fill.NON_ZERO):
    s = jt.Scene()
    s.fill(rule, jt.Affine.identity(), jt.SolidBrush(jt.Color.rgba(0, 1, 0, 1)), None, path)
    img, flags, _ = render_numpy(
        s, RenderParams(width=256, height=256, antialiasing_method=aa)
    )
    assert not any(bool(v) for v in flags.values())
    return img[..., 3]


def test_msaa_coverage_close_to_area():
    a = _render(AaConfig.AREA)
    for aa in (AaConfig.MSAA8, AaConfig.MSAA16):
        m = _render(aa)
        assert abs(m.sum() - a.sum()) / a.sum() < 0.02
        assert m[128, 128] == 1.0
        assert m[10, 10] == 0.0
        # edge pixels are within one sample step of the analytic value
        step = 1 / 8 if aa == AaConfig.MSAA8 else 1 / 16
        assert np.abs(m - a).max() <= 0.5 + step


def test_msaa_quantization():
    for aa, n in ((AaConfig.MSAA8, 8), (AaConfig.MSAA16, 16)):
        m = _render(aa)
        assert np.allclose((m * n) % 1.0, 0.0, atol=1e-4)


def test_msaa_even_odd():
    ring = (
        jt.BezPath()
        .move_to(40, 40).line_to(200, 40).line_to(200, 200).line_to(40, 200).close()
        .move_to(80, 80).line_to(160, 80).line_to(160, 160).line_to(80, 160).close()
    )
    m = _render(AaConfig.MSAA16, path=ring, rule=jt.Fill.EVEN_ODD)
    assert m[120, 120] == 0.0
    assert m[60, 120] == 1.0
    assert abs(m.sum() - (160 * 160 - 80 * 80)) < 200  # point sampling slack
