"""Streaming coverage kernel (tpu/coverage_pallas.py) vs the XLA
coverage pass (area) and the fine_ref MSAA oracle."""

import functools

import numpy as np
import jax.numpy as jnp

import jello_tpu as jt
from jello_tpu.cpu import render_numpy
from jello_tpu.cpu.pipeline import build_layout_dict, build_image_atlas
from jello_tpu.pipeline import render as render_mod
from jello_tpu.pipeline.fine_ref import assemble_image
from jello_tpu.pipeline.gradient import stops_table_or_empty
from jello_tpu.renderer.params import AaConfig, RenderParams
from jello_tpu.renderer.resolve import Resolver


def _prep(scene, params):
    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld = build_layout_dict(layout, params)
    atlas = build_image_atlas(images)
    ramps_arr = stops_table_or_empty(ramps)
    n = 1 << (max(len(scene_u32), 1024) - 1).bit_length()
    sp = np.zeros(n, np.uint32)
    sp[: len(scene_u32)] = scene_u32
    return (
        jnp.asarray(sp),
        {k: jnp.asarray(v) for k, v in ld.items()},
        jnp.asarray(ramps_arr),
        None if atlas is None else jnp.asarray(atlas),
        ld,
    )


def _scene():
    scene = jt.Scene()
    ident = jt.Affine.identity()
    path = jt.BezPath().move_to(30, 40).cubic_to(90, 10, 150, 220, 200, 240).close()
    scene.fill(jt.Fill.NON_ZERO, ident, jt.SolidBrush(jt.Color.rgba(1, 0, 0, 1)), None, path)
    tri = jt.BezPath().move_to(10, 10).line_to(200, 30).line_to(60, 200).close()
    scene.fill(jt.Fill.EVEN_ODD, ident, jt.SolidBrush(jt.Color.rgba(0, 0, 1, 0.5)), None, tri)
    st = jt.Stroke(width=3.0, join=jt.Join.ROUND,
                   start_cap=jt.Cap.ROUND, end_cap=jt.Cap.ROUND)
    wavy = jt.BezPath().move_to(20, 200).cubic_to(80, 120, 160, 260, 240, 180)
    scene.stroke(st, ident, jt.SolidBrush(jt.Color.rgba(0, 0.5, 0, 1)), None, wavy)
    return scene


def test_coverage_kernel_area_matches_xla():
    from jello_tpu.tpu.fine_v2 import assemble_compact, fine_v2

    scene = _scene()
    params = RenderParams(width=256, height=256,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    sp, ldj, ramps, atlas, ld = _prep(scene, params)

    def run(coverage_pallas):
        c = dict(caps)
        if coverage_pallas:
            c["_coverage_pallas"] = True
            c["_expand_interpret"] = True
        out, fl = render_mod.render_frame(
            jnp, sp, ldj, ramps, atlas, c,
            functools.partial(fine_v2, interpret=True),
        )
        assert not any(bool(np.asarray(v)) for v in fl.values()), {
            k: np.asarray(v) for k, v in fl.items()}
        compact, t2r = out
        return np.asarray(assemble_compact(
            np, np.asarray(compact), np.asarray(t2r), ld))

    img_xla = run(False)
    img_krn = run(True)
    assert np.abs(img_xla - img_krn).max() < 1e-5
    assert np.abs(img_krn - ref).max() < 8e-3


def test_coverage_kernel_msaa8_matches_oracle():
    from jello_tpu.tpu.fine_v2 import assemble_compact, fine_v2

    scene = _scene()
    params = RenderParams(width=256, height=256,
                          base_color=jt.Color.rgba(1, 1, 1, 1),
                          antialiasing_method=AaConfig.MSAA8)
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())
    sp, ldj, ramps, atlas, ld = _prep(scene, params)

    c = dict(caps)
    c["aa_mode"] = "msaa8"
    c["_coverage_pallas"] = True
    c["_expand_interpret"] = True
    out, fl = render_mod.render_frame(
        jnp, sp, ldj, ramps, atlas, c,
        functools.partial(fine_v2, interpret=True),
    )
    assert not any(bool(np.asarray(v)) for v in fl.values())
    compact, t2r = out
    img = np.asarray(assemble_compact(np, np.asarray(compact),
                                      np.asarray(t2r), ld))
    assert np.abs(img - ref).max() < 8e-3
