"""Stroke expansion tests (Euler-spiral offsetting, caps, joins, dashes)."""

import numpy as np

import jello_tpu as jt
from .helpers import render_scene


def _stroke_cov(path, stroke, transform=None, **kw):
    def build(scene):
        scene.stroke(
            stroke,
            transform or jt.Affine.identity(),
            jt.SolidBrush(jt.Color.rgba(0, 1, 0, 1)),
            None,
            path,
        )

    return render_scene(build, **kw)[..., 3]


LINE = jt.BezPath().move_to(28, 128).line_to(228, 128)


def test_butt_caps_exact():
    c = _stroke_cov(LINE, jt.Stroke(width=10, join=jt.Join.BEVEL).with_caps(jt.Cap.BUTT))
    assert abs(c.sum() - 2000.0) < 0.5


def test_square_caps_exact():
    c = _stroke_cov(LINE, jt.Stroke(width=10, join=jt.Join.BEVEL).with_caps(jt.Cap.SQUARE))
    assert abs(c.sum() - 2100.0) < 0.5


def test_round_caps():
    c = _stroke_cov(LINE, jt.Stroke(width=10).with_caps(jt.Cap.ROUND))
    want = 2000.0 + np.pi * 25
    # round caps are inscribed polygons at tol=0.25 -> slightly under
    assert want - 8.0 < c.sum() <= want + 0.5


def test_miter_join_union():
    L = jt.BezPath().move_to(50, 50).line_to(200, 50).line_to(200, 200)
    st = jt.Stroke(width=8, join=jt.Join.MITER, miter_limit=10).with_caps(jt.Cap.BUTT)
    c = _stroke_cov(L, st)
    # union of both arms incl. miter corner
    assert abs(c.sum() - 2400.0) < 1.0
    assert c[47, 202] > 0.9  # miter corner present


def test_bevel_join():
    L = jt.BezPath().move_to(50, 50).line_to(200, 50).line_to(200, 200)
    st = jt.Stroke(width=8, join=jt.Join.BEVEL).with_caps(jt.Cap.BUTT)
    c = _stroke_cov(L, st)
    # bevel cuts the 4x4 corner triangle in half
    assert abs(c.sum() - (2400.0 - 8.0)) < 1.0


def test_closed_stroke_has_no_caps():
    sq = jt.BezPath().move_to(64, 64).line_to(192, 64).line_to(192, 192).line_to(64, 192).close()
    st = jt.Stroke(width=8, join=jt.Join.MITER, miter_limit=10).with_caps(jt.Cap.ROUND)
    c = _stroke_cov(sq, st)
    # frame: outer 136^2 minus inner 120^2 (miter corners make it exact)
    assert abs(c.sum() - (136.0**2 - 120.0**2)) < 1.0


def test_curve_stroke_width():
    p = jt.BezPath().move_to(30, 128).cubic_to(90, 30, 170, 230, 226, 128)
    st = jt.Stroke(width=6).with_caps(jt.Cap.BUTT)
    c = _stroke_cov(p, st)
    # cross-section at several x positions should be ~width wide
    for x in (64, 128, 192):
        w = c[:, x].sum()
        assert 5.5 < w < 7.5, (x, w)


def test_scaled_transform_stroke():
    st = jt.Stroke(width=10, join=jt.Join.BEVEL).with_caps(jt.Cap.BUTT)
    t = jt.Affine.scale(0.5) @ jt.Affine.translate(100, 100)
    line = jt.BezPath().move_to(-72, 28).line_to(128, 28)  # maps to (14..114, 64)
    c = _stroke_cov(line, st, transform=t)
    # device-space width is 5, length 100
    assert abs(c.sum() - 500.0) < 2.0


def test_dashed_stroke():
    st = jt.Stroke(
        width=4, dash_pattern=(20.0, 10.0), join=jt.Join.BEVEL
    ).with_caps(jt.Cap.BUTT)
    c = _stroke_cov(LINE, st)
    # 200px line, pattern 30 -> 6 full periods + 20 remainder:
    # on-length = 6*20 + 20 = 140
    assert abs(c.sum() - 140 * 4) < 2.0
    assert c[128, 30] > 0.9  # first dash on
    assert c[128, 50] < 0.1  # first gap


def test_dash_offset():
    st = jt.Stroke(
        width=4, dash_pattern=(20.0, 10.0), dash_offset=20.0, join=jt.Join.BEVEL
    ).with_caps(jt.Cap.BUTT)
    c = _stroke_cov(LINE, st)
    assert c[128, 30] < 0.1  # starts in gap
    assert c[128, 40] > 0.9
