"""Interpret-mode parity tests for the record-stream fine kernel
(tpu/fine_v2.py) against the numpy reference renderer — the UseCPU
cross-check discipline (engine/wgpu_engine/wgpu.go:454-513)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import jello_tpu as jt
from jello_tpu.cpu.pipeline import build_layout_dict, render as render_numpy
from jello_tpu.pipeline import render as render_mod
from jello_tpu.pipeline.gradient import stops_table_or_empty
from jello_tpu.renderer.estimate import estimate_caps_from_scene
from jello_tpu.renderer.params import RenderParams
from jello_tpu.renderer.resolve import Resolver
from jello_tpu.tpu.fine_v2 import assemble_compact, fine_v2

IDENT = jt.Affine.identity()


def _run_v2(scene, params):
    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld = build_layout_dict(layout, params)
    caps = estimate_caps_from_scene(
        scene_u32, layout, params.width, params.height
    )
    caps["aa_mode"] = "area"
    n = 1 << (max(len(scene_u32), 1024) - 1).bit_length()
    sp = np.zeros(n, np.uint32)
    sp[: len(scene_u32)] = scene_u32
    stops = stops_table_or_empty(ramps)
    fine_impl = lambda *a, **kw: fine_v2(*a, interpret=True, **kw)
    ldj = {k: (jnp.asarray(v) if not np.isscalar(v) else v) for k, v in ld.items()}
    out, flags = render_mod.render_frame(
        jnp, jnp.asarray(sp), ldj, jnp.asarray(stops), None, caps, fine_impl
    )
    compact, tile2rank = out
    img = assemble_compact(np, np.asarray(compact), np.asarray(tile2rank), ld)
    return np.asarray(img), flags


def _check(scene, params, tol=2e-3):
    img, flags = _run_v2(scene, params)
    assert not any(bool(np.asarray(v)) for v in flags.values()), flags
    ref, _, _ = render_numpy(scene, params)
    err = np.abs(img - ref).max()
    assert err < tol, err


def test_v2_solid_fills():
    s = jt.Scene()
    s.fill(jt.Fill.NON_ZERO, IDENT, jt.SolidBrush(jt.Color.rgba(1, 0, 0, 0.8)),
           None, jt.BezPath().move_to(10, 10).cubic_to(80, 0, 120, 100, 60, 120).close())
    s.fill(jt.Fill.EVEN_ODD, IDENT, jt.SolidBrush(jt.Color.rgba(0, 0, 1, 0.5)),
           None, jt.BezPath().move_to(30, 30).line_to(120, 40).line_to(90, 110).close())
    _check(s, RenderParams(width=128, height=128, base_color=jt.Color.rgba(1, 1, 1, 1)))


def test_v2_gradients_all_kinds():
    st = (jt.ColorStop(0.0, jt.Color.rgba(1, 0, 0, 1)),
          jt.ColorStop(0.4, jt.Color.rgba(0, 1, 0, 0.6)),
          jt.ColorStop(1.0, jt.Color.rgba(0, 0, 1, 1)))
    s = jt.Scene()
    s.fill(jt.Fill.NON_ZERO, IDENT,
           jt.GradientBrush(jt.LinearGradient((0, 0), (128, 0), st)), None,
           jt.BezPath().move_to(5, 5).line_to(120, 10).line_to(100, 120).close())
    s.fill(jt.Fill.NON_ZERO, IDENT,
           jt.GradientBrush(jt.RadialGradient((64, 64), 0.0, (64, 64), 50, st)), None,
           jt.BezPath().move_to(20, 60).line_to(110, 50).line_to(70, 115).close())
    s.fill(jt.Fill.NON_ZERO, IDENT,
           jt.GradientBrush(jt.SweepGradient((64, 64), 0.1, 0.9, st)), None,
           jt.BezPath().move_to(40, 20).line_to(90, 25).line_to(80, 70).close())
    _check(s, RenderParams(width=128, height=128, base_color=jt.Color.rgba(1, 1, 1, 1)))


def test_v2_many_small_paths_multi_chunk():
    # Enough records to span several chunks, exercising carry/flush.
    rng = np.random.default_rng(7)
    s = jt.Scene()
    for i in range(120):
        cx, cy = rng.random(2) * 240
        r = 4 + 10 * rng.random()
        p = (jt.BezPath().move_to(cx - r, cy).line_to(cx, cy - r)
             .line_to(cx + r, cy).line_to(cx, cy + r).close())
        s.fill(jt.Fill.NON_ZERO, IDENT,
               jt.SolidBrush(jt.Color.rgba(rng.random(), rng.random(), rng.random(), 0.7)),
               None, p)
    _check(s, RenderParams(width=256, height=256, base_color=jt.Color.rgba(1, 1, 1, 1)))


def test_v2_standalone_overlap_fast():
    """FAST-SUITE guard for the standalone fine_v2 path (the production
    _fine_mode="v2" routing for clip-free frames): two translucent
    fills overlapping in the same tile compose record-by-record only if
    the wrapper packs singleton pass-1 segment ids — with ids all zero
    the pass-1 scan composes the whole chunk as one group (the round-3
    regression that hid behind the slow marker)."""
    s = jt.Scene()
    s.fill(jt.Fill.NON_ZERO, IDENT, jt.SolidBrush(jt.Color.rgba(1, 0, 0, 0.6)),
           None, jt.BezPath().move_to(4, 4).line_to(40, 8).line_to(30, 44).close())
    s.fill(jt.Fill.NON_ZERO, IDENT, jt.SolidBrush(jt.Color.rgba(0, 0, 1, 0.5)),
           None, jt.BezPath().move_to(10, 6).line_to(44, 20).line_to(14, 40).close())
    _check(s, RenderParams(width=64, height=64,
                           base_color=jt.Color.rgba(1, 1, 1, 1)))
