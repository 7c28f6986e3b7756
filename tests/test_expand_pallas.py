"""The Pallas streaming expansion (tpu/expand_pallas.py) vs the XLA
scatter/cummax expansion — stream-exact equality (same math, same
order; fakes sort to the sentinel)."""

import numpy as np
import jax.numpy as jnp

import jello_tpu as jt
from jello_tpu.cpu import render_numpy
from jello_tpu.cpu.pipeline import build_layout_dict
from jello_tpu.renderer.params import RenderParams
from jello_tpu.renderer.resolve import Resolver
from jello_tpu.pipeline import (
    clips as cmod,
    coarse as comod,
    drawobjs,
    flatten as fmod,
    render as render_mod,
    tiling,
)


def test_expand_kernel_generic_toy():
    from jello_tpu.tpu.expand_pallas import build_expand_table, make_expand_call

    R = 50
    rng = np.random.default_rng(3)
    counts = rng.integers(0, 6, R).astype(np.int32)
    vals = rng.standard_normal(R).astype(np.float32)
    out_cap = 512

    tab, ws, total1, nch = build_expand_table(
        jnp, [jnp.asarray(vals)], jnp.asarray(counts), out_cap
    )
    assert int(total1) == int(np.maximum(counts, 1).sum())

    def compute(p, j, within, valid):
        return [p(0) * valid, within * valid, valid]

    call = make_expand_call(1, 3, nch, compute, interpret=True)
    out = np.asarray(call(ws, tab))

    exp = []
    for r in range(R):
        for k in range(max(counts[r], 1)):
            live = k < counts[r]
            exp.append((vals[r] if live else 0.0, k if live else 0.0,
                        1.0 if live else 0.0))
    exp = np.array(exp).T
    n = exp.shape[1]
    assert np.allclose(out[:, :n], exp, atol=1e-6)
    assert np.abs(out[2, n:]).max() == 0.0  # tail slots invalid


import pytest


def test_path_count_pallas_matches_xla():
    scene = jt.Scene()
    path = jt.BezPath().move_to(30, 40).cubic_to(90, 10, 150, 220, 200, 240).close()
    scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
               jt.SolidBrush(jt.Color.rgba(1, 0, 0, 1)), None, path)
    tri = jt.BezPath().move_to(10, 10).line_to(200, 30).line_to(60, 200).close()
    scene.fill(jt.Fill.EVEN_ODD, jt.Affine.identity(),
               jt.SolidBrush(jt.Color.rgba(0, 0, 1, 0.5)), None, tri)
    params = RenderParams(width=256, height=256,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    img, flags, caps = render_numpy(scene, params)

    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld = build_layout_dict(layout, params)
    sp = np.zeros(4096, np.uint32)
    sp[: len(scene_u32)] = scene_u32
    ldj = {k: jnp.asarray(v) for k, v in ld.items()}
    spj = jnp.asarray(sp)

    # Shared geometry up to the lines (plain XLA flatten, so the
    # path_count comparison below is stream-exact: the expand kernel
    # runs the same f32 math in the same order).
    xp = jnp
    fl = fmod.flatten_stage(xp, spj, ldj, dict(caps))
    D = caps["n_draws_cap"]
    dta = render_mod._draw_tags(xp, spj, ldj, D)
    dm = drawobjs.draw_monoid_scan(xp, dta)
    info, cia, cpa, tag, dd, di = drawobjs.draw_leaf(
        xp, spj, ldj, dm, fl["path_trans_idx"], fl["path_draw_flags"],
        dict(caps))
    cb, dmp, dms = cmod.clip_leaf_vectorized(
        xp, cia, cpa, fl["path_bbox"], dm["path_idx"].astype(xp.int32),
        dm["scene_offset"].astype(xp.int32), ldj, dict(caps))
    dm2 = dict(dm)
    dm2["path_idx"] = dmp
    dm2["scene_offset"] = dms
    draw_bbox = comod.binning_bboxes(xp, dm2, fl["path_bbox"], cb, ldj)
    paths = tiling.tile_alloc(xp, draw_bbox, tag, ldj, dict(caps))

    def run(use_pallas, force_resid=False):
        c = dict(caps)
        if use_pallas:
            c["_expand_pallas"] = True
            c["_expand_interpret"] = True
            if force_resid:
                # Exercise the bump residual cond branch (full SC-row
                # scatter): with no actual residuals it must agree
                # exactly with the sorted-run sums.
                c["_pc_force_resid"] = True
        return tiling.path_count(xp, fl, paths, c)

    c1 = run(False)
    c2 = run(True)
    c3 = run(True, force_resid=True)
    assert np.array_equal(np.asarray(c2["backdrop"]),
                          np.asarray(c3["backdrop"]))
    assert np.array_equal(np.asarray(c2["seg_count"]),
                          np.asarray(c3["seg_count"]))
    T = caps["tiles_cap"]
    s1 = np.asarray(c1["sorted_slot"])
    s2 = np.asarray(c2["sorted_slot"])
    n1 = int((s1 < T).sum())
    n2 = int((s2 < T).sum())
    assert n1 == n2
    assert np.array_equal(s1[:n1], s2[:n2])
    for k in ("seg_start", "seg_count", "backdrop"):
        assert np.array_equal(np.asarray(c1[k]), np.asarray(c2[k])), k
    for k in c1["segs"]:
        a = np.asarray(c1["segs"][k])[:n1]
        b = np.asarray(c2["segs"][k])[:n2]
        assert np.array_equal(a, b), k
        assert not np.isnan(np.asarray(c2["segs"][k])).any(), k


def test_flatten_euler_kernel_matches_xla():
    """The Euler line expansion kernel vs the XLA path: identical line
    order after compaction; endpoint values within the kernel-math
    transcendental tolerance (kmath atan2/asin/cbrt are ~2e-6-accurate
    replacements for the XLA intrinsics)."""
    scene = jt.Scene()
    path = jt.BezPath().move_to(30, 40).cubic_to(90, 10, 150, 220, 200, 240).close()
    scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
               jt.SolidBrush(jt.Color.rgba(1, 0, 0, 1)), None, path)
    st = jt.Stroke(width=6.0, join=jt.Join.ROUND,
                   start_cap=jt.Cap.ROUND, end_cap=jt.Cap.ROUND)
    wavy = jt.BezPath().move_to(20, 200).cubic_to(80, 120, 160, 260, 240, 180)
    scene.stroke(st, jt.Affine.identity(),
                 jt.SolidBrush(jt.Color.rgba(0, 0.5, 0, 1)), None, wavy)
    params = RenderParams(width=256, height=256,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    img, flags, caps = render_numpy(scene, params)

    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld = build_layout_dict(layout, params)
    sp = np.zeros(8192, np.uint32)
    sp[: len(scene_u32)] = scene_u32
    ldj = {k: jnp.asarray(v) for k, v in ld.items()}
    spj = jnp.asarray(sp)

    fl1 = fmod.flatten_stage(jnp, spj, ldj, dict(caps))
    c2 = dict(caps)
    c2["_expand_pallas"] = True
    c2["_expand_interpret"] = True
    fl2 = fmod.flatten_stage(jnp, spj, ldj, c2)

    EC = caps["euler_line_cap"]
    v1 = np.asarray(fl1["line_valid"])[:EC]
    v2 = np.asarray(fl2["line_valid"])[:EC]
    assert v1.sum() == v2.sum()
    for k in ("line_x0", "line_y0", "line_x1", "line_y1"):
        a = np.asarray(fl1[k])[:EC][v1]
        b = np.asarray(fl2[k])[:EC][v2]
        assert np.abs(a - b).max() < 2e-3, k
    p1 = np.asarray(fl1["line_path"])[:EC][v1]
    p2 = np.asarray(fl2["line_path"])[:EC][v2]
    assert np.array_equal(p1, p2)
    assert np.abs(
        np.asarray(fl1["path_bbox"]) - np.asarray(fl2["path_bbox"])
    ).max() < 2e-3
