"""The fused flatten geometry megakernel (tpu/flatten_geom_pallas.py)
vs the split XLA path: same active worklists, same line streams (Euler,
simple, arc), same bboxes — up to the kernel-math transcendental
tolerance (kmath shims are ~2e-6-accurate; ESPC subdivision decisions
can flip on exact ties, so counts are compared exactly but endpoint
values with a small tolerance)."""

import numpy as np
import jax.numpy as jnp
import pytest

import jello_tpu as jt
from jello_tpu.cpu import render_numpy
from jello_tpu.cpu.pipeline import build_layout_dict
from jello_tpu.renderer.params import RenderParams
from jello_tpu.renderer.resolve import Resolver
from jello_tpu.pipeline import flatten as fmod


def _scene():
    scene = jt.Scene()
    ident = jt.Affine.identity()
    path = jt.BezPath().move_to(30, 40).cubic_to(90, 10, 150, 220, 200, 240).close()
    scene.fill(jt.Fill.NON_ZERO, ident,
               jt.SolidBrush(jt.Color.rgba(1, 0, 0, 1)), None, path)
    # Round joins/caps (arc records), miter + bevel joins, square caps,
    # dashes (subpath splits) and a transform: every slot_geometry
    # branch the megakernel fuses.
    st = jt.Stroke(width=6.0, join=jt.Join.ROUND,
                   start_cap=jt.Cap.ROUND, end_cap=jt.Cap.ROUND)
    wavy = jt.BezPath().move_to(20, 200).cubic_to(80, 120, 160, 260, 240, 180)
    scene.stroke(st, ident, jt.SolidBrush(jt.Color.rgba(0, 0.5, 0, 1)),
                 None, wavy)
    st2 = jt.Stroke(width=3.0, join=jt.Join.MITER, miter_limit=2.0,
                    start_cap=jt.Cap.SQUARE, end_cap=jt.Cap.BUTT)
    zig = (jt.BezPath().move_to(16, 30).line_to(90, 120).line_to(40, 60)
           .line_to(200, 90))
    scene.stroke(st2, jt.Affine.rotate_about(0.21, jt.Point(120, 120)),
                 jt.SolidBrush(jt.Color.rgba(0, 0, 1, 1)), None, zig)
    st3 = jt.Stroke(width=2.0, join=jt.Join.BEVEL, dash_pattern=(8, 4))
    scene.stroke(st3, ident, jt.SolidBrush(jt.Color.rgba(0.2, 0.2, 0.2, 1)),
                 None, jt.BezPath().move_to(10, 40).line_to(240, 60)
                 .line_to(180, 140))
    return scene


@pytest.mark.slow
@pytest.mark.parametrize("decode", [False, True])
def test_geom_megakernel_matches_split_path(decode):
    scene = _scene()
    params = RenderParams(width=256, height=256,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    img, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())

    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld = build_layout_dict(layout, params)
    sp = np.zeros(8192, np.uint32)
    sp[: len(scene_u32)] = scene_u32
    ldj = {k: jnp.asarray(v) for k, v in ld.items()}
    spj = jnp.asarray(sp)

    fl1 = fmod.flatten_stage(jnp, spj, ldj, dict(caps))
    c2 = dict(caps)
    c2["_geom_pallas"] = True
    c2["_geom_decode"] = decode
    c2["_expand_pallas"] = True
    c2["_expand_interpret"] = True
    fl2 = fmod.flatten_stage(jnp, spj, ldj, c2)

    assert not bool(np.asarray(fl2["overflow"]))
    # Worklist/expansion counters must agree exactly (calibration runs
    # on the host path and sizes the device class).
    for k in ("n_work_a", "n_work_b", "s_total", "a_total"):
        assert int(np.asarray(fl1[k])) == int(np.asarray(fl2[k])), k

    v1 = np.asarray(fl1["line_valid"])
    v2 = np.asarray(fl2["line_valid"])
    assert v1.sum() == v2.sum()
    for k in ("line_x0", "line_y0", "line_x1", "line_y1"):
        a = np.asarray(fl1[k])[v1]
        b = np.asarray(fl2[k])[v2]
        assert np.abs(a - b).max() < 2e-3, k
    p1 = np.asarray(fl1["line_path"])[v1]
    p2 = np.asarray(fl2["line_path"])[v2]
    assert np.array_equal(p1, p2)
    assert np.abs(
        np.asarray(fl1["path_bbox"]) - np.asarray(fl2["path_bbox"])
    ).max() < 2e-3
    # Marker-scatter outputs (decode mode sources the fill bit and the
    # arc transforms from the kernel — must be bit-identical).
    assert np.array_equal(np.asarray(fl1["path_draw_flags"]),
                          np.asarray(fl2["path_draw_flags"]))
    assert np.array_equal(np.asarray(fl1["path_trans_idx"]),
                          np.asarray(fl2["path_trans_idx"]))


@pytest.mark.slow
def test_geom_megakernel_full_frame():
    """End-to-end render_frame with the decode-fused megakernel vs the
    numpy oracle (the integration seams: caps plumbing, marker
    scatters, arc transforms, expansion consumption)."""
    from .test_full_scene import full_scene, PARAMS
    from jello_tpu.pipeline import render as render_mod
    from jello_tpu.cpu.pipeline import build_image_atlas
    from jello_tpu.pipeline.gradient import stops_table_or_empty
    from jello_tpu.pipeline.fine_ref import assemble_image

    scene = full_scene()
    ref, flags, caps = render_numpy(scene, PARAMS)
    assert not any(bool(v) for v in flags.values())

    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld = build_layout_dict(layout, PARAMS)
    atlas = build_image_atlas(images)
    ramps_arr = stops_table_or_empty(ramps)
    sp = np.zeros(8192, np.uint32)
    sp[: len(scene_u32)] = scene_u32

    c2 = dict(caps)
    c2["_geom_pallas"] = True
    c2["_geom_decode"] = True
    c2["_expand_pallas"] = True
    c2["_expand_interpret"] = True
    fine_out, out_flags = render_mod.render_frame(
        jnp,
        jnp.asarray(sp),
        {k: jnp.asarray(v) for k, v in ld.items()},
        jnp.asarray(ramps_arr),
        jnp.asarray(atlas) if atlas is not None else None,
        c2,
    )
    assert not any(bool(v) for v in out_flags.values())
    img = assemble_image(np, np.asarray(fine_out), ld)
    # Geometry through kmath transcendentals: subdivision decisions can
    # flip on exact ties; pixel error stays well under 1%.
    assert np.abs(np.asarray(img) - ref).max() < 8e-3
