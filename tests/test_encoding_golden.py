"""Byte-level golden fixtures for the encoding contract, hand-derived
directly from reading the reference source (NOT from running any
implementation): encoding/path.go:130-175 (tag values), :17-73 (style
bit layout), :212-405 (segment encoding), :436-482 (finish + stroke
cap markers), encoding/encoding.go:349-371 (clip encoding),
encoding/draw.go:14-41 (draw tag values).

These pin the wire format by data so a second implementation bug
cannot hide behind oracle symmetry (VERDICT r3 missing #1).
"""

import struct

import numpy as np

import jello_tpu as jt


def _f32s(data: bytes):
    return list(np.frombuffer(bytes(data), dtype=np.float32))


def test_golden_stroked_open_polyline():
    """Stroked open 2-segment polyline, miter join, round caps.

    Hand derivation (path.go):
      - MoveTo(10,10): data <- (10,10)              [path.go:212-232]
      - LineTo(50,10): tag 0x9, data <- (50,10)     [:280-311, tag :136]
      - LineTo(50,40): tag 0x9, data <- (50,40)
      - Finish(open stroke): insertStrokeCapMarkerSegment(false) =
        QuadTo(firstPoint=(10,10), firstStartTangentEnd=(50,10)):
        tag 0xA, data <- (10,10),(50,10)            [:459-482]
      - subpath-end bit 0x4 on the marker -> 0xE    [:447-449]
      - PathTagPath 0x10 appended                   [:451-453]
    Style word (path.go:17-73): style bit 0x80000000 | miter join
    0x10000000 | round start cap (0x02000000 << 2) | round end cap
    0x02000000 | f16(4.0) = 0x4400 -> 0x9A004400.
    """
    st = jt.Stroke(width=6.0, miter_limit=4.0, join=jt.Join.MITER,
                   start_cap=jt.Cap.ROUND, end_cap=jt.Cap.ROUND)
    scene = jt.Scene()
    scene.stroke(
        st, jt.Affine.identity(),
        jt.SolidBrush(jt.Color.rgba(0, 0, 0, 1)), None,
        jt.BezPath().move_to(10, 10).line_to(50, 10).line_to(50, 40),
    )
    enc = scene.encoding
    assert enc.path_tags == [
        0x20,        # transform
        0x40,        # style
        0x09,        # LineTo f32
        0x09,        # LineTo f32
        0x0A | 0x4,  # QuadTo f32 cap marker | subpath end
        0x10,        # path marker
    ]
    assert _f32s(enc.path_data) == [
        10, 10,          # move
        50, 10,          # line
        50, 40,          # line
        10, 10, 50, 10,  # cap-marker quad: first point + start tangent
    ]
    assert enc.styles == [(0x9A004400, 6.0)]
    assert enc.n_path_segments == 3
    assert enc.draw_tags == [0x50]  # DrawTagColor, draw.go:21


def test_golden_fill_even_odd_style_word():
    """Even-odd fill style word = FlagsFillBit 0x40000000 alone
    (path.go:43-47); non-zero fill = 0."""
    scene = jt.Scene()
    tri = jt.BezPath().move_to(0, 0).line_to(8, 0).line_to(0, 8).close()
    scene.fill(jt.Fill.EVEN_ODD, jt.Affine.identity(),
               jt.SolidBrush(jt.Color.rgba(0, 0, 1, 1)), None, tri)
    assert scene.encoding.styles == [(0x40000000, 0.0)]


def test_golden_clip_pair_streams():
    """BeginClip/EndClip wire format (encoding.go:349-371):
      - draw tags [0x9, <draw>, 0x21]      (draw.go:36-39)
      - BeginClip draw data = u32 (mix<<8|compose) then f32 alpha
      - EndClip appends NO draw data but a dummy PathTagPath (0x10)
    Mix/Compose zero values are jello's swapped ones (gfx/blend.go:
    12-16): MULTIPLY=1, SRC_OVER=0.
    """
    scene = jt.Scene()
    rect = (jt.BezPath().move_to(2, 2).line_to(30, 2).line_to(30, 30)
            .line_to(2, 30).close())
    scene.push_layer(jt.BlendMode(jt.Mix.MULTIPLY, jt.Compose.SRC_OVER),
                     0.5, jt.Affine.identity(), rect)
    scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
               jt.SolidBrush(jt.Color.rgba(1, 1, 1, 1)), None, rect)
    scene.pop_layer()
    enc = scene.encoding

    assert enc.draw_tags == [0x9, 0x50, 0x21]
    dd = bytes(enc.draw_data)
    # BeginClip: (1 << 8) | 0 = 0x100, alpha 0.5.
    assert dd[:8] == struct.pack("<If", 0x100, 0.5)
    # Color draw data: premultiplied white.
    assert _f32s(dd[8:24]) == [1.0, 1.0, 1.0, 1.0]
    assert len(dd) == 24  # EndClip contributes nothing
    # EndClip's dummy path marker is the LAST path tag.
    assert enc.path_tags[-1] == 0x10
    assert enc.n_clips == 2


def test_golden_draw_tag_values():
    """All draw tag u32 values (draw.go:18-39) — the monoid bit fields
    (path count, clip bit, scene/info word counts) live in these
    constants, so they are the contract."""
    from jello_tpu.encoding.draw import (
        DRAW_TAG_BEGIN_CLIP,
        DRAW_TAG_COLOR,
        DRAW_TAG_END_CLIP,
        DRAW_TAG_IMAGE,
        DRAW_TAG_LINEAR_GRADIENT,
        DRAW_TAG_NOP,
        DRAW_TAG_RADIAL_GRADIENT,
        DRAW_TAG_SWEEP_GRADIENT,
    )

    assert DRAW_TAG_NOP == 0
    assert DRAW_TAG_COLOR == 0x50
    assert DRAW_TAG_LINEAR_GRADIENT == 0x114
    assert DRAW_TAG_RADIAL_GRADIENT == 0x29C
    assert DRAW_TAG_SWEEP_GRADIENT == 0x254
    assert DRAW_TAG_IMAGE == 0x248
    assert DRAW_TAG_BEGIN_CLIP == 0x9
    assert DRAW_TAG_END_CLIP == 0x21


def test_golden_initial_line_is_move():
    """An initial LineTo with no prior MoveTo is treated as a MoveTo
    (kurbo semantics, path.go:280-287): no segment tag is emitted."""
    scene = jt.Scene()
    p = jt.BezPath()
    p.line_to(5, 5)
    p.line_to(9, 5)
    scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
               jt.SolidBrush(jt.Color.rgba(1, 0, 0, 1)), None, p)
    enc = scene.encoding
    seg_tags = [t for t in enc.path_tags if t & 0x3]
    # one real line + the implicit fill close
    assert len(seg_tags) == 2
    assert _f32s(enc.path_data)[:2] == [5, 5]
