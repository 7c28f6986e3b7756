"""Sub-stage timing of path_count on the real device.

Cuts the stage at the `upto` points added to pipeline/tiling.py::
path_count: params (DDA + bbox clip), compact (nonzero-line compaction
+ row gathers), expand (the Pallas streaming expansions), backdrop (the
two scatter_adds), sort (the slot sort with 5 payloads), bincount
(seg_start/bd-prefix/rank cumsums), full (everything).

Same methodology as profile_stages.py: fetch-forced warmup, content-
varied layout per timed call. Deltas are approximate — each cut point
lets XLA DCE whatever the returned sums don't need.

Usage: python tools/profile_path_count.py [--config N]
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
    ap.add_argument("--points", default="", help="comma list; default all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jello_tpu.cpu.pipeline import build_layout_dict
    from jello_tpu.pipeline import render as render_mod
    from jello_tpu.pipeline import flatten as flatten_mod
    from jello_tpu.pipeline import coarse as coarse_mod, drawobjs, tiling
    from jello_tpu.pipeline import clips as clips_mod
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
        b[-4:] = np.asarray([c, c, c, np.float32(1.0)], np.float32).view(
            np.uint32
        )
        return jnp.asarray(b)

    def upto(point):
        def body(scene, layout_packed):
            xp = jnp
            layout = render_mod.unpack_layout(xp, layout_packed)
            fl = flatten_mod.flatten_stage(xp, scene, layout, caps)
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
            draw_bbox = coarse_mod.binning_bboxes(
                xp, dm, fl["path_bbox"], cb, layout)
            paths = tiling.tile_alloc(xp, draw_bbox, tag, layout, caps)
            if point == "pre":
                s = paths["tile_offset"].sum().astype(jnp.float32)
                for k in ("line_x0", "line_y1"):
                    s = s + fl[k].sum()
                return s
            out = tiling.path_count(xp, fl, paths, caps, upto=point)
            s = jnp.float32(0)

            def acc(v):
                nonlocal s
                if isinstance(v, dict):
                    for vv in v.values():
                        acc(vv)
                elif isinstance(v, (tuple, list)):
                    for vv in v:
                        acc(vv)
                elif hasattr(v, "sum"):
                    s = s + v.sum().astype(jnp.float32)

            acc(out)
            return s
        return body

    points = ["pre", "setup", "pgather", "clip", "compact", "expand",
              "backdrop", "sort", "bincount", None]
    if args.points:
        sel = args.points.split(",")
        points = [None if p == "full" else p for p in sel]
    prev = 0.0
    for pt in points:
        fn = jax.jit(upto(pt))
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
        name = pt or "full"
        print(f"{name:10s} cumulative {ms:8.1f} ms   delta {ms - prev:8.1f}"
              f" ms   (warmup {compile_s:.0f}s)", flush=True)
        prev = ms
    return 0


if __name__ == "__main__":
    sys.exit(main())
