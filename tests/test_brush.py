"""Brush tests: gradients (linear/radial/sweep) and images."""

import numpy as np

import jello_tpu as jt
from .helpers import render_scene

FULL = jt.BezPath().move_to(0, 0).line_to(256, 0).line_to(256, 256).line_to(0, 256).close()
STOPS = (
    jt.ColorStop(0.0, jt.Color.rgba(1, 0, 0, 1)),
    jt.ColorStop(1.0, jt.Color.rgba(0, 0, 1, 1)),
)


def _grad_scene(gradient, path=FULL):
    def build(scene):
        scene.fill(
            jt.Fill.NON_ZERO,
            jt.Affine.identity(),
            jt.GradientBrush(gradient),
            None,
            path,
        )

    return build


def _srgb_mix_linear(t):
    """Red->blue interpolated in sRGB, converted to linear (per channel)."""
    from jello_tpu.gfx import _srgb_eotf

    r = _srgb_eotf(np.array([1 - t]))[0]
    b = _srgb_eotf(np.array([t]))[0]
    return r, b


def test_linear_gradient_horizontal():
    img = render_scene(_grad_scene(jt.LinearGradient((0, 0), (256, 0), STOPS)))
    for x in (16, 128, 240):
        t = x / 256
        r, b = _srgb_mix_linear(t)
        px = img[100, x]
        assert abs(px[0] - r) < 0.02, (x, px)
        assert abs(px[2] - b) < 0.02, (x, px)
    # vertical invariance
    assert np.abs(img[10, 128] - img[200, 128]).max() < 1e-5


def test_linear_gradient_extend_pad():
    img = render_scene(
        _grad_scene(jt.LinearGradient((96, 0), (160, 0), STOPS, jt.Extend.PAD))
    )
    assert img[50, 20, 0] > 0.98 and img[50, 20, 2] < 0.02  # pure red
    assert img[50, 240, 2] > 0.98 and img[50, 240, 0] < 0.02  # pure blue


def test_linear_gradient_extend_repeat():
    img = render_scene(
        _grad_scene(jt.LinearGradient((0, 0), (64, 0), STOPS, jt.Extend.REPEAT))
    )
    # same phase every 64px
    assert np.abs(img[100, 10] - img[100, 74]).max() < 0.02
    assert np.abs(img[100, 10] - img[100, 138]).max() < 0.02


def test_linear_gradient_extend_reflect():
    img = render_scene(
        _grad_scene(jt.LinearGradient((0, 0), (64, 0), STOPS, jt.Extend.REFLECT))
    )
    # mirror around x=64: t(60) == t(68)
    assert np.abs(img[100, 60] - img[100, 68]).max() < 0.03


def test_radial_gradient_circular():
    g = jt.RadialGradient((128, 128), 0.0, (128, 128), 100.0, STOPS)
    img = render_scene(_grad_scene(g))
    # center red, ring at r=100 blue
    assert img[128, 128, 0] > 0.95
    assert img[128, 228 - 1, 2] > 0.9
    # radial symmetry
    assert np.abs(img[128, 178] - img[178, 128]).max() < 0.02


def test_radial_gradient_focal():
    # off-center focal point (two-point conical)
    g = jt.RadialGradient((100, 128), 10.0, (128, 128), 90.0, STOPS)
    img = render_scene(_grad_scene(g))
    assert img[128, 100, 0] > 0.9  # near start center: red
    assert img[128, 215, 2] > 0.8  # near end radius: blue


def test_sweep_gradient():
    g = jt.SweepGradient((128, 128), 0.0, 2 * np.pi, STOPS)
    img = render_scene(_grad_scene(g))
    # angle 0 is +x axis; sweep t grows with angle
    assert img[128, 200, 0] > 0.9  # just above +x axis -> t~0 red
    px_left = img[128, 50]  # angle pi -> t=0.5
    r, b = _srgb_mix_linear(0.5)
    assert abs(px_left[0] - r) < 0.03 and abs(px_left[2] - b) < 0.03


def test_gradient_multi_stop():
    stops = (
        jt.ColorStop(0.0, jt.Color.rgba(1, 0, 0, 1)),
        jt.ColorStop(0.5, jt.Color.rgba(0, 1, 0, 1)),
        jt.ColorStop(1.0, jt.Color.rgba(0, 0, 1, 1)),
    )
    img = render_scene(_grad_scene(jt.LinearGradient((0, 0), (256, 0), stops)))
    assert img[100, 128, 1] > 0.99  # middle is exactly green
    assert img[100, 1, 0] > 0.95
    assert img[100, 254, 2] > 0.95


def test_image_brush():
    # 2x2 checkerboard image scaled 64x
    pix = np.zeros((2, 2, 4), dtype=np.uint8)
    pix[0, 0] = [255, 0, 0, 255]
    pix[0, 1] = [0, 255, 0, 255]
    pix[1, 0] = [0, 0, 255, 255]
    pix[1, 1] = [255, 255, 255, 255]
    image = jt.Image(pixels=pix)

    def build(scene):
        scene.fill(
            jt.Fill.NON_ZERO,
            jt.Affine.scale(64),  # image space 2x2 -> device 128x128
            jt.ImageBrush(image),
            None,
            jt.BezPath().move_to(0, 0).line_to(2, 0).line_to(2, 2).line_to(0, 2).close(),
        )

    img = render_scene(build)
    # The reference bilinearly interpolates between texels at uv =
    # pixel/scale; pure texel colors appear at integer uv only.
    assert img[2, 2, 0] > 0.9 and img[2, 2, 1] < 0.1  # texel (0,0) red
    assert img[2, 64, 1] > 0.9  # texel (0,1) green
    assert img[64, 2, 2] > 0.9  # texel (1,0) blue
    assert img[64, 64, :3].min() > 0.2  # interpolated interior
    # outside the path: background
    assert img[200, 200, 3] == 0.0
