"""Intra-flatten device timing: where flatten_stage's milliseconds go.

Cuts the stage at successive internal milestones (tag decode/monoids,
slot geometry, worklist compaction, lockstep kernel, euler expansion,
simple/arc expansion, bbox scatter) using the same fetch-forced warmup
methodology as profile_stages.py.

Usage: python tools/profile_flatten.py [--config N]
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jello_tpu.cpu.pipeline import build_layout_dict
    from jello_tpu.pipeline import render as render_mod
    from jello_tpu.pipeline import flatten as fm
    from jello_tpu.pipeline import ops as _ops
    from jello_tpu.renderer.resolve import Resolver
    from jello_tpu.scenes import CONFIGS
    from jello_tpu.tpu import Renderer
    from jello_tpu.tpu.render import _pow2

    scene, params = CONFIGS[args.config]()
    r = Renderer()
    r.render_device(scene, params)
    caps = dict(r._caps)
    if r.use_pallas:
        caps["_expand_pallas"] = True
        caps["_coverage_pallas"] = True

    res = Resolver()
    layout, ramps, images, scene_u32 = res.resolve(scene.encoding)
    ld_np = build_layout_dict(layout, params)
    n = _pow2(max(len(scene_u32), 1024))
    scene_padded = np.zeros(n, dtype=np.uint32)
    scene_padded[: len(scene_u32)] = scene_u32
    scene_dev = jnp.asarray(scene_padded)
    base = render_mod.pack_layout(ld_np)
    ctr = itertools.count(1)

    def fresh_layout():
        b = base.copy()
        c = np.float32(1.0 - next(ctr) * 1e-6)
        b[-4:] = np.asarray([c, c, c, np.float32(1.0)], np.float32).view(np.uint32)
        return jnp.asarray(b)

    def upto(stage):
        def body(scene, layout_packed):
            xp = jnp
            f32 = xp.float32
            layout = render_mod.unpack_layout(xp, layout_packed)
            N = caps["n_tag_slots"]
            IT = caps["max_iters"]
            tags = fm.decode_tag_stream(xp, scene, layout["path_tag_base"], N)
            monoids = fm.exclusive_monoids(xp, tags)
            active = xp.arange(N, dtype=xp.int32) < layout["n_path_tags"]
            if stage == "monoids":
                return sum(v.sum().astype(jnp.float32) for v in monoids.values())
            trans_idx = (monoids["trans_idx"] - 1).astype(xp.uint32)
            style_idx = (monoids["style_idx"] - 2).astype(xp.uint32)
            path_idx = monoids["path_idx"].astype(xp.int32)
            seg_off = monoids["path_seg_offset"].astype(xp.int32)
            S8 = fm.shifted_scene_table(xp, scene)
            srow = _ops.gather_guarded(
                xp, S8, layout["style_base"] + style_idx.astype(xp.int32))
            style_flags = srow[:, 0]
            linewidth = _ops.bitcast_u32_f32(xp, srow[:, 1])
            base_words = layout["path_data_base"] + seg_off
            raw = fm._read_points(xp, scene, base_words, tags, S8=S8)
            pts_raw, seg_type0 = raw[:8], raw[8]
            is_stroke = (style_flags & xp.uint32(fm.FLAGS_STYLE_BIT)) != 0
            T = fm._transform_read(
                xp, scene, layout["transform_base"], trans_idx, S8=S8)
            miter_limit = fm.f16_to_f32(
                xp, (style_flags & fm.MITER_LIMIT_MASK).astype(xp.uint32))
            if stage == "decode":
                return (sum(p.sum() for p in pts_raw) + sum(t.sum() for t in T)
                        + linewidth.sum())
            nxt = lambda a: xp.concatenate([a[1:], a[:1]])
            g = fm.slot_geometry(
                xp, tags, nxt(tags), pts_raw, [nxt(a) for a in pts_raw],
                seg_type0, nxt(seg_type0), is_stroke, nxt(is_stroke),
                style_flags, linewidth, miter_limit, T, path_idx, active,
                caps["n_paths_cap"])
            if stage == "geometry":
                s = jnp.float32(0)
                for c in g["tabA"]:
                    s = s + c.sum()
                for c in g["tabB"]:
                    s = s + c.sum()
                return s
            if stage == "worklists":
                NWA = caps["work_a_cap"]
                NWB = caps["work_b_cap"]
                wl_a, _, wla_valid, _, na = fm.expand_by_counts(
                    xp, g["act_a"].astype(xp.int32), NWA)
                wl_b, _, wlb_valid, _, nb = fm.expand_by_counts(
                    xp, g["act_b"].astype(xp.int32), NWB)
                return (wl_a.sum() + wl_b.sum() + na + nb
                        + wla_valid.sum() + wlb_valid.sum())
            if stage == "rows":
                NWA = caps["work_a_cap"]
                NWB = caps["work_b_cap"]
                wl_a, _, wla_valid, _, na = fm.expand_by_counts(
                    xp, g["act_a"].astype(xp.int32), NWA)
                wl_b, _, wlb_valid, _, nb = fm.expand_by_counts(
                    xp, g["act_b"].astype(xp.int32), NWB)
                tabA_N = xp.stack(g["tabA"], axis=1)
                tabB_N = xp.stack(g["tabB"], axis=1)
                rowsA = _ops.gather_guarded(xp, tabA_N, wl_a)
                rowsB = _ops.gather_guarded(xp, tabB_N, wl_b)
                return rowsA.sum() + rowsB.sum() + na + nb
            if stage == "lockstep":
                from jello_tpu.tpu.lockstep_pallas import (
                    flatten_lockstep_expansion,
                )
                NWA = caps["work_a_cap"]
                NWB = caps["work_b_cap"]
                EC = caps["euler_line_cap"]
                IT = caps["max_iters"]
                wl_a, _, wla_valid, _, na = fm.expand_by_counts(
                    xp, g["act_a"].astype(xp.int32), NWA)
                wl_b, _, wlb_valid, _, nb = fm.expand_by_counts(
                    xp, g["act_b"].astype(xp.int32), NWB)
                tabA_N = xp.stack(g["tabA"], axis=1)
                tabB_N = xp.stack(g["tabB"], axis=1)
                rowsA = _ops.gather_guarded(xp, tabA_N, wl_a)
                rowsB = _ops.gather_guarded(xp, tabB_N, wl_b)
                table = xp.concatenate([rowsA, rowsB], axis=0)
                wvalid = xp.concatenate([wla_valid, wlb_valid])
                (e_x0, e_y0, e_x1, e_y1, e_path, e_valid, e_total,
                 e_real, ovf) = flatten_lockstep_expansion(
                    xp, table, wvalid, IT, EC, caps["n_paths_cap"], caps)
                return (e_x0.sum() + e_y1.sum() + e_path.sum()
                        + e_valid.sum() + e_total)
            fl = fm.flatten_stage(xp, scene, layout, caps)
            if stage == "nobbox":
                return (fl["line_x0"].sum() + fl["line_y1"].sum()
                        + fl["n_lines"]
                        + fl["line_path"].sum() + fl["line_valid"].sum())
            if stage == "full":
                return (fl["line_x0"].sum() + fl["line_y1"].sum()
                        + fl["path_bbox"].sum() + fl["n_lines"]
                        + fl["line_path"].sum() + fl["line_valid"].sum())
            raise ValueError(stage)
        return body

    stages = ["monoids", "decode", "geometry", "worklists", "rows",
              "lockstep", "nobbox", "full"]
    prev = 0.0
    for st in stages:
        fn = jax.jit(upto(st))
        t0 = time.time()
        out = fn(scene_dev, fresh_layout())
        _ = np.asarray(out)
        compile_s = time.time() - t0
        best = 1e9
        for _trial in range(3):
            ls = [fresh_layout() for _ in range(args.reps)]
            jax.block_until_ready(ls)
            t0 = time.time()
            outs = [fn(scene_dev, l) for l in ls]
            jax.block_until_ready(outs)
            best = min(best, (time.time() - t0) / args.reps)
        ms = best * 1000
        print(f"{st:12s} cumulative {ms:8.1f} ms   delta {ms - prev:8.1f} ms"
              f"   (warmup {compile_s:.0f}s)", flush=True)
        prev = ms
    return 0


if __name__ == "__main__":
    sys.exit(main())
