"""Fill rasterization tests against analytic areas and supersampled
ground truth (the oracle the reference lacks; SURVEY §4)."""

import numpy as np

import jello_tpu as jt
from .helpers import fill_scene, line_soup, render_scene, supersample_coverage


def _cov(path, rule=None, **kw):
    img = render_scene(fill_scene(path, rule=rule), **kw)
    return img[..., 3]


def test_rect_aligned():
    p = jt.BezPath().move_to(16, 16).line_to(112, 16).line_to(112, 80).line_to(16, 80).close()
    c = _cov(p)
    assert abs(c.sum() - 96 * 64) < 0.1
    assert c[40, 40] == 1.0
    assert c[10, 10] == 0.0


def test_rect_fractional():
    p = jt.BezPath().move_to(10.5, 20.25).line_to(100.75, 20.25).line_to(100.75, 60.5).line_to(10.5, 60.5).close()
    c = _cov(p)
    assert abs(c.sum() - 90.25 * 40.25) < 2.0


def test_diamond_exact():
    p = jt.BezPath().move_to(128, 28).line_to(228, 128).line_to(128, 228).line_to(28, 128).close()
    c = _cov(p)
    assert abs(c.sum() - 20000.0) < 0.5


def test_triangle_exact():
    p = jt.BezPath().move_to(20, 20).line_to(220, 30).line_to(60, 200).close()
    c = _cov(p)
    want = 0.5 * abs((220 - 20) * (200 - 20) - (60 - 20) * (30 - 20))
    assert abs(c.sum() - want) < 0.5


def test_cubic_vs_supersample():
    p = jt.BezPath().move_to(30, 40).cubic_to(90, 10, 150, 220, 200, 240).line_to(180, 50).close()
    c = _cov(p)
    x0, y0, x1, y1, _ = line_soup(fill_scene(p))
    ref = supersample_coverage(x0, y0, x1, y1, 256, 256, ss=4)
    assert np.abs(ref - c).max() < 0.15
    assert abs(ref.sum() - c.sum()) / ref.sum() < 1e-3


def test_even_odd_ring():
    # Two concentric same-direction squares; even-odd leaves a ring.
    p = (
        jt.BezPath()
        .move_to(40, 40).line_to(200, 40).line_to(200, 200).line_to(40, 200).close()
        .move_to(80, 80).line_to(160, 80).line_to(160, 160).line_to(80, 160).close()
    )
    c = _cov(p, rule=jt.Fill.EVEN_ODD)
    assert abs(c.sum() - (160 * 160 - 80 * 80)) < 1.0
    assert c[120, 120] == 0.0  # hole
    assert c[60, 120] == 1.0  # ring
    # Non-zero fills everything.
    c2 = _cov(p, rule=jt.Fill.NON_ZERO)
    assert abs(c2.sum() - 160 * 160) < 1.0
    assert c2[120, 120] == 1.0


def test_winding_cancellation():
    # Inner square wound the opposite way: non-zero punches a hole.
    p = (
        jt.BezPath()
        .move_to(40, 40).line_to(200, 40).line_to(200, 200).line_to(40, 200).close()
        .move_to(80, 80).line_to(80, 160).line_to(160, 160).line_to(160, 80).close()
    )
    c = _cov(p, rule=jt.Fill.NON_ZERO)
    assert abs(c.sum() - (160 * 160 - 80 * 80)) < 1.0
    assert c[120, 120] == 0.0


def test_transformed_fill():
    p = jt.BezPath().move_to(-50, -50).line_to(50, -50).line_to(50, 50).line_to(-50, 50).close()
    t = jt.Affine.translate(128, 128) @ jt.Affine.rotate(np.pi / 4)
    img = render_scene(fill_scene(p, transform=t))
    c = img[..., 3]
    assert abs(c.sum() - 100 * 100) < 2.0
    assert c[128, 128] == 1.0


def test_alpha_blend_over_base():
    def build(scene):
        p = jt.BezPath().move_to(0, 0).line_to(256, 0).line_to(256, 256).line_to(0, 256).close()
        scene.fill(
            jt.Fill.NON_ZERO,
            jt.Affine.identity(),
            jt.SolidBrush(jt.Color.rgba(1, 0, 0, 0.5)),
            None,
            p,
        )

    img = render_scene(build, base=jt.Color.rgba(0, 0, 1, 1))
    px = img[128, 128]
    # 0.5 linear-red over blue
    lin_red = 1.0  # rgba(1,0,0) linear red channel = 1
    assert abs(px[0] - 0.5 * lin_red) < 1e-3
    assert abs(px[2] - 0.5) < 1e-3
    assert abs(px[3] - 1.0) < 1e-5


def test_multiple_paths_order():
    def build(scene):
        big = jt.BezPath().move_to(20, 20).line_to(200, 20).line_to(200, 200).line_to(20, 200).close()
        small = jt.BezPath().move_to(60, 60).line_to(160, 60).line_to(160, 160).line_to(60, 160).close()
        scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(), jt.SolidBrush(jt.Color.rgba(1, 0, 0, 1)), None, big)
        scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(), jt.SolidBrush(jt.Color.rgba(0, 1, 0, 1)), None, small)

    img = render_scene(build)
    assert img[40, 40, 0] > 0.9 and img[40, 40, 1] < 0.1
    assert img[100, 100, 1] > 0.9 and img[100, 100, 0] < 0.1
