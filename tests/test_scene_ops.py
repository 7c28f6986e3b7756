"""Scene composition: append, apply_transform, brush transforms."""

import numpy as np

import jello_tpu as jt
from .helpers import render_scene
from jello_tpu.cpu import render_numpy
from jello_tpu.renderer.params import RenderParams

RED = jt.SolidBrush(jt.Color.rgba(1, 0, 0, 1))
SQ = jt.BezPath().move_to(0, 0).line_to(40, 0).line_to(40, 40).line_to(0, 40).close()


def test_scene_append_with_transform():
    sub = jt.Scene()
    sub.fill(jt.Fill.NON_ZERO, jt.Affine.identity(), RED, None, SQ)
    main = jt.Scene()
    main.append(sub, jt.Affine.translate(100, 100))
    img, flags, _ = render_numpy(
        main, RenderParams(width=256, height=256)
    )
    assert not any(bool(v) for v in flags.values())
    assert img[120, 120, 0] > 0.99
    assert img[20, 20, 3] == 0.0
    assert abs(img[..., 3].sum() - 1600) < 1.0


def test_apply_transform_scales_existing():
    s = jt.Scene()
    s.fill(jt.Fill.NON_ZERO, jt.Affine.identity(), RED, None, SQ)
    s.apply_transform(jt.Affine.scale(2))
    img, flags, _ = render_numpy(s, RenderParams(width=256, height=256))
    assert abs(img[..., 3].sum() - 6400) < 2.0


def test_brush_transform():
    stops = (
        jt.ColorStop(0.0, jt.Color.rgba(1, 0, 0, 1)),
        jt.ColorStop(1.0, jt.Color.rgba(0, 0, 1, 1)),
    )
    grad = jt.GradientBrush(jt.LinearGradient((0, 0), (64, 0), stops))

    def build(scene):
        big = jt.BezPath().move_to(0, 0).line_to(128, 0).line_to(128, 128).line_to(0, 128).close()
        # Brush transform rotates the gradient 90 degrees: vertical ramp.
        scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(), grad,
                   jt.Affine.rotate(np.pi / 2), big)

    img = render_scene(build)
    # gradient varies along y, constant along x
    assert np.abs(img[30, 20] - img[30, 100]).max() < 0.02
    assert img[4, 64, 0] > 0.8  # near top: mostly red
    assert abs(img[4, 64, 0] - img[120, 64, 0]) > 0.5


def test_append_gradient_patch_rebase():
    stops = (
        jt.ColorStop(0.0, jt.Color.rgba(0, 1, 0, 1)),
        jt.ColorStop(1.0, jt.Color.rgba(0, 0, 1, 1)),
    )
    sub = jt.Scene()
    sub.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
             jt.GradientBrush(jt.LinearGradient((0, 0), (40, 0), stops)), None, SQ)
    main = jt.Scene()
    main.fill(jt.Fill.NON_ZERO, jt.Affine.identity(), RED, None, SQ)
    main.append(sub, jt.Affine.translate(60, 0))
    img, flags, _ = render_numpy(main, RenderParams(width=128, height=64))
    assert not any(bool(v) for v in flags.values())
    assert img[20, 20, 0] > 0.99  # red square
    assert img[20, 62, 1] > 0.85  # gradient start green
    assert img[20, 98, 2] > 0.85  # gradient end blue
