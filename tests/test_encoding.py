"""Encoding stream golden tests (reference: encoding/path.go semantics)."""

import struct

import numpy as np

import jello_tpu as jt
from jello_tpu.encoding import Encoding, transform_from_affine
from jello_tpu.encoding.path import (
    PATH_TAG_CUBIC_TO_F32,
    PATH_TAG_LINE_TO_F32,
    PATH_TAG_PATH,
    PATH_TAG_STYLE,
    PATH_TAG_SUBPATH_END_BIT,
    PATH_TAG_TRANSFORM,
    FLAGS_FILL_BIT,
    FLAGS_STYLE_BIT,
)
from jello_tpu.renderer.resolve import Resolver


def _f32s(data: bytes):
    return list(np.frombuffer(bytes(data), dtype=np.float32))


def test_simple_fill_streams():
    scene = jt.Scene()
    path = jt.BezPath().move_to(1, 2).line_to(3, 2).line_to(3, 4).close()
    scene.fill(
        jt.Fill.NON_ZERO,
        jt.Affine.identity(),
        jt.SolidBrush(jt.Color.rgba(1, 0, 0, 1)),
        None,
        path,
    )
    enc = scene.encoding
    # transform tag, style tag, 2 lines, closing line (subpath end), path marker
    assert enc.path_tags == [
        PATH_TAG_TRANSFORM,
        PATH_TAG_STYLE,
        PATH_TAG_LINE_TO_F32,
        PATH_TAG_LINE_TO_F32,
        PATH_TAG_LINE_TO_F32 | PATH_TAG_SUBPATH_END_BIT,
        PATH_TAG_PATH,
    ]
    assert _f32s(enc.path_data) == [1, 2, 3, 2, 3, 4, 1, 2]
    assert enc.n_paths == 1
    assert enc.n_path_segments == 3
    assert enc.draw_tags == [0x50]
    # premultiplied linear red
    assert _f32s(enc.draw_data) == [1.0, 0.0, 0.0, 1.0]
    assert enc.styles == [(0, 0.0)]
    assert enc.transforms == [(1.0, 0.0, 0.0, 1.0, 0.0, 0.0)]


def test_implicit_close_of_fills():
    scene = jt.Scene()
    path = jt.BezPath().move_to(0, 0).line_to(10, 0).line_to(10, 10)
    scene.fill(
        jt.Fill.EVEN_ODD,
        jt.Affine.identity(),
        jt.SolidBrush(jt.Color.rgba(0, 0, 0, 1)),
        None,
        path,
    )
    enc = scene.encoding
    # implicit closing line back to (0,0)
    assert _f32s(enc.path_data)[-2:] == [0, 0]
    assert enc.styles[0][0] & FLAGS_FILL_BIT


def test_zero_length_segments_dropped():
    enc = Encoding()
    enc.encode_transform(transform_from_affine(jt.Affine.identity()))
    enc.encode_fill_style(jt.Fill.NON_ZERO)
    p = jt.BezPath().move_to(0, 0).line_to(0, 0).line_to(5, 0).line_to(5, 0).line_to(5, 5)
    enc.encode_path(p, True)
    seg_tags = [t for t in enc.path_tags if t & 0x3]
    # 2 real segments + closing line
    assert len(seg_tags) == 3


def test_stroke_cap_marker_open():
    scene = jt.Scene()
    path = jt.BezPath().move_to(0, 0).line_to(10, 0)
    scene.stroke(
        jt.Stroke(width=2, start_cap=jt.Cap.BUTT, end_cap=jt.Cap.BUTT),
        jt.Affine.identity(),
        jt.SolidBrush(jt.Color.rgba(0, 0, 0, 1)),
        None,
        path,
    )
    enc = scene.encoding
    assert enc.styles[0][0] & FLAGS_STYLE_BIT
    # line, quad cap marker (subpath end), path marker
    seg_tags = [t for t in enc.path_tags if t & 0x3]
    assert seg_tags[0] == PATH_TAG_LINE_TO_F32
    assert seg_tags[1] & PATH_TAG_SUBPATH_END_BIT
    assert (seg_tags[1] & 0x3) == 0x2  # quad marker for open subpath


def test_transform_dedup():
    scene = jt.Scene()
    p = jt.BezPath().move_to(0, 0).line_to(1, 1).line_to(0, 1).close()
    t = jt.Affine.translate(3, 4)
    b = jt.SolidBrush(jt.Color.rgba(0, 0, 0, 1))
    scene.fill(jt.Fill.NON_ZERO, t, b, None, p)
    scene.fill(jt.Fill.NON_ZERO, t, b, None, p)
    assert len(scene.encoding.transforms) == 1
    assert len(scene.encoding.styles) == 1


def test_resolve_layout():
    scene = jt.Scene()
    p = jt.BezPath().move_to(0, 0).cubic_to(1, 1, 2, 2, 3, 0).close()
    scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(), jt.SolidBrush(jt.Color.rgba(0.5, 0.25, 0.125, 1)), None, p)
    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    assert layout.n_paths == 1
    assert layout.n_draw_objects == 1
    # pathtag stream padded to 1024 bytes = 256 words
    assert layout.path_data_base == 256
    # tags appear in the packed buffer
    words = scene_u32[: layout.path_data_base]
    b = words.tobytes()
    assert b[0] == PATH_TAG_TRANSFORM
    assert b[1] == PATH_TAG_STYLE
    assert b[2] == PATH_TAG_CUBIC_TO_F32
    # style stream is last
    style_word = scene_u32[layout.style_base]
    assert style_word == 0


def test_ramp_cache_dedup():
    r = Resolver()
    scene = jt.Scene()
    stops = (
        jt.ColorStop(0.0, jt.Color.rgba(1, 0, 0, 1)),
        jt.ColorStop(1.0, jt.Color.rgba(0, 0, 1, 1)),
    )
    g = jt.GradientBrush(jt.LinearGradient((0, 0), (10, 0), stops))
    p = jt.BezPath().move_to(0, 0).line_to(10, 0).line_to(10, 10).close()
    scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(), g, None, p)
    scene.fill(jt.Fill.NON_ZERO, jt.Affine.translate(1, 1), g, None, p)
    layout, ramps, _, scene_u32 = r.resolve(scene.encoding)
    assert ramps.height == 1  # deduplicated
    assert ramps.data.shape == (1, 512, 4)
    # endpooints premultiplied linear: red at 0, blue at end
    assert abs(float(ramps.data[0, 0, 0]) - 1.0) < 2e-3
    assert abs(float(ramps.data[0, -1, 2]) - 1.0) < 2e-3


def test_resolve_solid_paths_only_matches_general():
    """The solid-only fast path (resolve.go:231-283) must produce the
    identical layout + packed buffer the general path produces for a
    patch-free encoding, and must refuse patched encodings."""
    import numpy as np
    import pytest

    import jello_tpu as jt
    from jello_tpu.renderer.resolve import Resolver

    s = jt.Scene()
    p = jt.BezPath().move_to(10, 10).line_to(200, 30).line_to(60, 200).close()
    s.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
           jt.SolidBrush(jt.Color.rgba(1, 0, 0, 1)), None, p)
    s.stroke(jt.Stroke(width=3.0), jt.Affine.identity(),
             jt.SolidBrush(jt.Color.rgba(0, 0, 1, 1)), None,
             jt.BezPath().move_to(5, 5).line_to(100, 100))

    lay_f, ramps_f, atlas_f, scene_f = Resolver().resolve_solid_paths_only(
        s.encoding)
    # The general entry point dispatches to the fast path itself; build
    # the general result by forcing the patch machinery.
    r2 = Resolver()
    r2._ramp_cache.maintain()
    import numpy as _np
    dd = _np.frombuffer(bytes(s.encoding.draw_data), dtype=_np.uint32)
    lay_g, scene_g = r2._pack_scene(s.encoding, dd)
    assert np.array_equal(scene_f, scene_g)
    assert lay_f == lay_g
    assert ramps_f.height == 0 and atlas_f is None

    g = jt.Scene()
    grad = jt.LinearGradient((0, 0), (64, 0), [
        jt.ColorStop(0.0, jt.Color.rgba(0, 0, 0, 1)),
        jt.ColorStop(1.0, jt.Color.rgba(1, 1, 1, 1))])
    g.fill(jt.Fill.NON_ZERO, jt.Affine.identity(), jt.GradientBrush(grad),
           None, p)
    with pytest.raises(ValueError):
        Resolver().resolve_solid_paths_only(g.encoding)
