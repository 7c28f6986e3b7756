"""Clip stack and blend layer tests (reference: clip stages + fine's
blend stack, gfx/blend.go semantics)."""

import numpy as np

import jello_tpu as jt
from .helpers import render_scene

FULL = jt.BezPath().move_to(0, 0).line_to(256, 0).line_to(256, 256).line_to(0, 256).close()
RED = jt.SolidBrush(jt.Color.rgba(1, 0, 0, 1))
GREEN = jt.SolidBrush(jt.Color.rgba(0, 1, 0, 1))
IDENT = jt.Affine.identity()
CLIP_BLEND = jt.BlendMode(jt.Mix.CLIP, jt.Compose.SRC_OVER)


def _rect(x0, y0, x1, y1):
    return jt.BezPath().move_to(x0, y0).line_to(x1, y0).line_to(x1, y1).line_to(x0, y1).close()


def test_basic_clip():
    def build(scene):
        scene.push_layer(CLIP_BLEND, 1.0, IDENT, _rect(64, 64, 192, 192))
        scene.fill(jt.Fill.NON_ZERO, IDENT, RED, None, FULL)
        scene.pop_layer()

    img = render_scene(build)
    assert img[128, 128, 0] > 0.99  # inside clip
    assert img[32, 32, 3] == 0.0  # outside clip
    assert abs(img[..., 3].sum() - 128 * 128) < 2.0


def test_clip_partial_coverage_edge():
    # Clip boundary through pixel interiors: clip coverage multiplies alpha.
    def build(scene):
        scene.push_layer(CLIP_BLEND, 1.0, IDENT, _rect(64.5, 64, 192, 192))
        scene.fill(jt.Fill.NON_ZERO, IDENT, RED, None, FULL)
        scene.pop_layer()

    img = render_scene(build)
    assert abs(img[128, 64, 3] - 0.5) < 0.01


def test_nested_clips():
    def build(scene):
        scene.push_layer(CLIP_BLEND, 1.0, IDENT, _rect(32, 32, 224, 224))
        scene.push_layer(CLIP_BLEND, 1.0, IDENT, _rect(96, 96, 256, 256))
        scene.fill(jt.Fill.NON_ZERO, IDENT, RED, None, FULL)
        scene.pop_layer()
        scene.pop_layer()

    img = render_scene(build)
    # intersection is [96,224)^2
    assert abs(img[..., 3].sum() - 128 * 128) < 2.0
    assert img[128, 128, 0] > 0.99
    assert img[64, 64, 3] == 0.0
    assert img[230, 230, 3] == 0.0


def test_layer_alpha():
    def build(scene):
        scene.push_layer(jt.BlendMode(), 0.5, IDENT, FULL)
        scene.fill(jt.Fill.NON_ZERO, IDENT, RED, None, FULL)
        scene.pop_layer()

    img = render_scene(build, base=jt.Color.rgba(0, 0, 0, 1))
    px = img[128, 128]
    assert abs(px[0] - 0.5) < 1e-3
    assert abs(px[3] - 1.0) < 1e-5


def test_blend_multiply():
    def build(scene):
        scene.fill(jt.Fill.NON_ZERO, IDENT, jt.SolidBrush(jt.Color.rgba(0.5, 0.8, 1, 1)), None, FULL)
        scene.push_layer(jt.BlendMode(jt.Mix.MULTIPLY, jt.Compose.SRC_OVER), 1.0, IDENT, FULL)
        scene.fill(jt.Fill.NON_ZERO, IDENT, jt.SolidBrush(jt.Color.rgba(0.5, 0.5, 0.5, 1)), None, FULL)
        scene.pop_layer()

    img = render_scene(build)
    from jello_tpu.gfx import _srgb_eotf

    base = _srgb_eotf(np.array([0.5, 0.8, 1.0]))
    top = _srgb_eotf(np.array([0.5, 0.5, 0.5]))
    want = base * top
    assert np.abs(img[128, 128, :3] - want).max() < 1e-3


def test_clip_zero_tiles_suppressed():
    # A small clip: tiles fully outside must not show the fill, including
    # tiles where the fill alone has full coverage.
    def build(scene):
        scene.push_layer(CLIP_BLEND, 1.0, IDENT, _rect(16, 16, 32, 32))
        scene.fill(jt.Fill.NON_ZERO, IDENT, GREEN, None, FULL)
        scene.pop_layer()

    img = render_scene(build)
    assert abs(img[..., 3].sum() - 16 * 16) < 1.0
    assert img[128, 128, 3] == 0.0


def test_empty_clip_path_suppresses_all():
    def build(scene):
        scene.push_layer(CLIP_BLEND, 1.0, IDENT, jt.BezPath())
        scene.fill(jt.Fill.NON_ZERO, IDENT, RED, None, FULL)
        scene.pop_layer()

    img = render_scene(build)
    assert img[..., 3].max() == 0.0


def test_unbalanced_push_is_closed_at_resolve():
    def build(scene):
        scene.push_layer(CLIP_BLEND, 1.0, IDENT, _rect(64, 64, 192, 192))
        scene.fill(jt.Fill.NON_ZERO, IDENT, RED, None, FULL)
        # no pop: resolver appends the EndClip

    img = render_scene(build)
    assert img[128, 128, 0] > 0.99
    assert img[32, 32, 3] == 0.0


def test_nonisolated_clip_vs_blend_group_equal():
    # A pure clip and a Normal/SrcOver blend group must produce the same
    # pixels for opaque content.
    def build_clip(scene):
        scene.push_layer(CLIP_BLEND, 1.0, IDENT, _rect(40, 40, 200, 200))
        scene.fill(jt.Fill.NON_ZERO, IDENT, RED, None, FULL)
        scene.pop_layer()

    def build_group(scene):
        scene.push_layer(jt.BlendMode(), 1.0, IDENT, _rect(40, 40, 200, 200))
        scene.fill(jt.Fill.NON_ZERO, IDENT, RED, None, FULL)
        scene.pop_layer()

    a = render_scene(build_clip, base=jt.Color.rgba(0, 0, 1, 1))
    b = render_scene(build_group, base=jt.Color.rgba(0, 0, 1, 1))
    assert np.abs(a - b).max() < 1e-5
