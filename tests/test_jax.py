"""Device (jax) pipeline parity vs the numpy oracle.

One comprehensive scene exercising fills, strokes, gradients and clip
layers; compiled once (compile dominates runtime on the CPU backend).
"""

import numpy as np

import jello_tpu as jt
from jello_tpu.cpu import render_numpy
from jello_tpu.renderer.params import RenderParams


def _scene():
    scene = jt.Scene()
    blob = jt.BezPath().move_to(10, 20).cubic_to(45, 5, 75, 110, 100, 120).line_to(90, 25).close()
    scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(), jt.SolidBrush(jt.Color.rgba(0.9, 0.2, 0.1, 1)), None, blob)
    stops = (
        jt.ColorStop(0.0, jt.Color.rgba(1, 1, 0, 1)),
        jt.ColorStop(1.0, jt.Color.rgba(0, 0, 1, 1)),
    )
    from jello_tpu.curve import circle

    scene.fill(
        jt.Fill.EVEN_ODD,
        jt.Affine.identity(),
        jt.GradientBrush(jt.LinearGradient((30, 0), (100, 0), stops)),
        None,
        circle(64, 45, 28),
    )
    wave = jt.BezPath().move_to(10, 105).cubic_to(40, 85, 85, 125, 118, 102)
    scene.stroke(
        jt.Stroke(width=3, join=jt.Join.ROUND).with_caps(jt.Cap.ROUND),
        jt.Affine.identity(),
        jt.SolidBrush(jt.Color.rgba(0, 0.6, 0.1, 1)),
        None,
        wave,
    )
    clip = jt.BezPath().move_to(20, 20).line_to(110, 30).line_to(100, 110).line_to(15, 100).close()
    scene.push_layer(jt.BlendMode(jt.Mix.CLIP, jt.Compose.SRC_OVER), 1.0, jt.Affine.identity(), clip)
    scene.fill(
        jt.Fill.NON_ZERO,
        jt.Affine.identity(),
        jt.SolidBrush(jt.Color.rgba(0.1, 0.1, 0.9, 0.5)),
        None,
        jt.BezPath().move_to(0, 0).line_to(128, 0).line_to(128, 128).line_to(0, 128).close(),
    )
    scene.pop_layer()
    return scene


def test_device_matches_oracle():
    from jello_tpu.tpu import Renderer

    params = RenderParams(width=128, height=128, base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, _ = render_numpy(_scene(), params)
    assert not any(bool(v) for v in flags.values())
    dev = Renderer().render(_scene(), params)
    # CPU backend matches to f32 noise; TPU transcendentals differ a bit
    # more (measured 1.8e-3 max on v5e).
    assert np.abs(ref - dev).max() < 5e-3
