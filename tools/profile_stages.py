"""Per-stage timing of a benchmark config on the real device.

Methodology notes (hard-won on the tunneled axon fabric):
  - the first execution of a new executable compiles *server-side*;
    jax.block_until_ready returns immediately during that window, so a
    warmup must FETCH a value (np.asarray) to force compile+execute;
  - after that, block_until_ready waits properly (~28 ms tunnel RTT
    floor — amortize over a queued batch);
  - repeated identical computations can be memoized by the runtime;
    vary an input (base color twiddle) per call.

Usage: python tools/profile_stages.py [--config N] [--stage NAME]
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

    from jello_tpu.cpu.pipeline import build_image_atlas, build_layout_dict
    from jello_tpu.pipeline import render as render_mod
    from jello_tpu.pipeline import flatten as flatten_mod
    from jello_tpu.pipeline import (
        clips as clips_mod,
        coarse as coarse_mod,
        drawobjs,
        tiling,
    )
    from jello_tpu.pipeline import ops as _ops
    from jello_tpu.pipeline.gradient import stops_table_or_empty
    from jello_tpu.renderer.resolve import Resolver
    from jello_tpu.scenes import CONFIGS
    from jello_tpu.tpu import Renderer
    from jello_tpu.tpu.render import _pow2

    scene, params = CONFIGS[args.config]()

    # Let the Renderer settle + calibrate the capacity class, then
    # profile with exactly the caps production uses.
    r = Renderer()
    out, _ = r.render_device(scene, params)
    if getattr(r, "flags_history", None):
        print("flag history during settle:", r.flags_history, flush=True)
    print("settle compiles:", [round(s,1) for _, s in r.compile_log], flush=True)
    caps = dict(r._caps)
    if r.use_pallas:
        caps["_expand_pallas"] = True
        caps["_coverage_pallas"] = True
    print("calibrated caps:", {k: v for k, v in sorted(caps.items())}, flush=True)

    res = Resolver()
    layout, ramps, images, scene_u32 = res.resolve(scene.encoding)
    ld_np = build_layout_dict(layout, params)
    n = _pow2(max(len(scene_u32), 1024))
    scene_padded = np.zeros(n, dtype=np.uint32)
    scene_padded[: len(scene_u32)] = scene_u32
    ramps_arr = stops_table_or_empty(ramps)
    nr = _pow2(ramps_arr.shape[0])
    if nr != ramps_arr.shape[0]:
        ramps_arr = np.concatenate(
            [ramps_arr, np.zeros((nr - ramps_arr.shape[0], ramps_arr.shape[1]),
                                 np.float32)]
        )
    atlas = build_image_atlas(images)
    scene_dev = jnp.asarray(scene_padded)
    ramps_dev = jnp.asarray(ramps_arr)
    atlas_dev = jnp.asarray(atlas) if atlas is not None else None

    base = render_mod.pack_layout(ld_np)
    ctr = itertools.count(1)

    def fresh_layout():
        b = base.copy()
        c = np.float32(1.0 - next(ctr) * 1e-6)
        b[-4:] = np.asarray([c, c, c, np.float32(1.0)], np.float32).view(np.uint32)
        return jnp.asarray(b)

    def upto(stage):
        def body(scene, layout_packed, ramps, images):
            xp = jnp
            layout = render_mod.unpack_layout(xp, layout_packed)
            fl = flatten_mod.flatten_stage(xp, scene, layout, caps)
            if stage == "flatten":
                return (fl["line_x0"].sum() + fl["line_y1"].sum()
                        + fl["path_bbox"].sum() + fl["n_lines"]
                        + fl["line_path"].sum() + fl["line_valid"].sum())
            D = caps["n_draws_cap"]
            dta = render_mod._draw_tags(xp, scene, layout, D)
            dm = drawobjs.draw_monoid_scan(xp, dta)
            info, cia, cpa, tag, dd, di = drawobjs.draw_leaf(
                xp, scene, layout, dm, fl["path_trans_idx"],
                fl["path_draw_flags"], caps)
            cb, dmp, dms = clips_mod.clip_leaf_vectorized(
                xp, cia, cpa, fl["path_bbox"],
                dm["path_idx"].astype(xp.int32),
                dm["scene_offset"].astype(xp.int32), layout, caps)
            dm = dict(dm); dm["path_idx"] = dmp; dm["scene_offset"] = dms
            dd = (layout["draw_data_base"] + dms).astype(xp.int32)
            if stage == "draw_clip":
                return cb.sum() + info.sum() + tag.sum()
            draw_bbox = coarse_mod.binning_bboxes(xp, dm, fl["path_bbox"], cb, layout)
            paths = tiling.tile_alloc(xp, draw_bbox, tag, layout, caps)
            if stage == "tile_alloc":
                return paths["tile_offset"].sum() + draw_bbox.sum()
            counted = tiling.path_count(xp, fl, paths, caps)
            if stage == "path_count":
                s = jnp.float32(0)
                for k, v in counted.items():
                    if hasattr(v, "sum"):
                        s = s + v.sum().astype(jnp.float32)
                return s
            segs = tiling.path_tiling(xp, fl, counted, caps)
            sc4 = _ops.gather_guarded(
                xp, scene, xp.concatenate([dd + k for k in range(4)])
            ).reshape(4, info.shape[0])
            dtab = xp.concatenate([xp.transpose(sc4), info[:, 1:10]], axis=1)
            cmds = coarse_mod.build_commands(
                xp, scene, layout, dm, tag, dtab, draw_bbox, paths,
                counted, fl["path_draw_flags"], caps)
            cmds["dtab"] = dtab
            if stage == "coarse":
                s = cmds["dtab"].sum()
                for k, v in cmds.items():
                    if k != "dtab" and hasattr(v, "sum"):
                        s = s + v.sum().astype(jnp.uint32)
                return s
            from jello_tpu.pipeline.coverage import compute_area_rows

            if stage == "coverage":
                caps2 = dict(caps)
                area_blk, arr, ovf = compute_area_rows(xp, cmds, counted, caps2)
                return area_blk.sum() + arr.sum()
            impl = r._fine_impl(dict(caps, _fine_mode=None))
            fine_out, fine_flags = impl(
                scene, cmds, segs, counted, info, ramps, images, layout, caps)
            if isinstance(fine_out, tuple):
                return fine_out[0].sum() + fine_out[1].sum()
            return fine_out.sum()
        return body

    stages = ["flatten", "draw_clip", "tile_alloc", "path_count", "coarse",
              "coverage", "fine"]
    prev = 0.0
    for st in stages:
        fn = jax.jit(upto(st))
        t0 = time.time()
        out = fn(scene_dev, fresh_layout(), ramps_dev, atlas_dev)
        _ = np.asarray(out)  # force server compile + execution
        compile_s = time.time() - t0
        best = 1e9
        for _trial in range(3):
            ls = [fresh_layout() for _ in range(args.reps)]
            jax.block_until_ready(ls)
            t0 = time.time()
            outs = [fn(scene_dev, l, ramps_dev, atlas_dev) for l in ls]
            jax.block_until_ready(outs)
            best = min(best, (time.time() - t0) / args.reps)
        ms = best * 1000
        print(f"{st:12s} cumulative {ms:8.1f} ms   delta {ms - prev:8.1f} ms"
              f"   (warmup {compile_s:.0f}s)", flush=True)
        prev = ms
    return 0


if __name__ == "__main__":
    sys.exit(main())
