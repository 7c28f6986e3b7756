"""Sub-stage timing of the hybrid fine pass on the real device.

Splits fine_hybrid's ~80 ms into: coverage-row sweep, record packing,
the record-stream kernel (fine_v2), the legacy slab build, and the
legacy interpreter + merge. Same methodology as profile_stages.py
(fetch-forced warmup, content-varied layout per timed call).

Usage: python tools/profile_fine.py [--config N]
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
            draw_bbox = coarse_mod.binning_bboxes(xp, dm, fl["path_bbox"], cb, layout)
            paths = tiling.tile_alloc(xp, draw_bbox, tag, layout, caps)
            counted = tiling.path_count(xp, fl, paths, caps)
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

            # ---- fine sub-stages (mirrors fine_hybrid) ----------------
            from jello_tpu.pipeline.coverage import compute_area_rows
            from jello_tpu.pipeline.coarse import (
                CMD_BEGIN_CLIP, CMD_END_CLIP, CMD_IMAGE)
            from jello_tpu.tpu.fine_pallas import (
                atlas_planar, build_records, make_fine_kernel)
            from jello_tpu.tpu.fine_v2 import fine_v2
            from jello_tpu.pipeline.flatten import expand_by_counts

            GRID = caps["tile_grid_cap"]
            MC = caps["cmds_per_tile"]
            LT = caps.get("legacy_tiles_cap", 2048)
            tile = cmds["tile"].astype(xp.int32)
            kind = cmds["kind"]
            in_grid = tile < GRID
            is_leg = ((kind == CMD_IMAGE) | (kind == CMD_BEGIN_CLIP)
                      | (kind == CMD_END_CLIP)) & in_grid
            legacy_flag = xp.zeros(GRID + 1, dtype=xp.int32)
            legacy_flag = legacy_flag.at[xp.where(in_grid, tile, GRID)].max(
                is_leg.astype(xp.int32), mode="drop")
            lt_flag = legacy_flag[:GRID]
            rec_legacy = _ops.gather_guarded(
                xp, legacy_flag, xp.clip(tile, 0, GRID)) > 0
            cmds = dict(cmds)
            cmds["flags"] = cmds["flags"] | (rec_legacy.astype(xp.uint32) << 1)

            caps_s = dict(caps)
            NR, W = ramps.shape[0], ramps.shape[1]
            caps_s["max_stops"] = (W - 1) // 5
            area_blk, area_row_rec, rows_overflow = compute_area_rows(
                xp, cmds, counted, caps_s)
            cmds["area_row"] = area_row_rec
            if stage == "area_rows":
                return area_blk.sum() + area_row_rec.sum()
            rec = build_records(xp, cmds, scene, info, caps_s)
            if stage == "records":
                return area_blk.sum() + rec.sum()
            (out_compact, tile2rank), flags = fine_v2(
                scene, cmds, segs, counted, info, ramps, images, layout,
                caps, precomputed=(area_blk, area_row_rec, rows_overflow, rec))
            if stage == "v2":
                return out_compact.sum() + tile2rank.sum()

            lrec, _, lvalid, _, n_legacy = expand_by_counts(xp, lt_flag, LT)
            legacy_ids = xp.where(lvalid, lrec, GRID).astype(xp.int32)
            lidx_of_tile = _ops.exclusive_cumsum(xp, lt_flag)
            PC = tile.shape[0]
            j = xp.arange(PC, dtype=xp.int32)
            start_of_tile = _ops.gather_guarded(xp, cmds["tile_start"], tile)
            within = j - start_of_tile
            lidx = _ops.gather_guarded(xp, lidx_of_tile, tile)
            ok = rec_legacy & in_grid & (within < MC) & (lidx < LT)
            slot = xp.where(ok, lidx * MC + within, LT * MC)
            slab = xp.zeros((LT * MC + 1, 16), dtype=xp.uint32)
            slab = slab.at[slot].set(rec, mode="drop")
            slab = slab[: LT * MC].reshape(LT, MC, 16)
            if stage == "slab":
                return out_compact.sum() + slab.sum()

            n_cmds_tile = cmds["tile_end"] - cmds["tile_start"]
            counts_tile = xp.clip(n_cmds_tile, 0, MC).astype(xp.int32)
            counts = xp.where(
                legacy_ids < GRID,
                _ops.gather_guarded(xp, counts_tile,
                                    xp.clip(legacy_ids, 0, GRID - 1)), 0)
            counts = xp.concatenate(
                [counts, xp.asarray(layout["width_in_tiles"],
                                    dtype=xp.int32).reshape(1)])
            scalars = xp.asarray(layout["base_color"], dtype=xp.float32)
            stops_pad = xp.zeros((NR, 128), dtype=xp.float32)
            stops_pad = stops_pad.at[:, :W].set(ramps)
            img_flat, img_shape = atlas_planar(images)
            call = make_fine_kernel(
                caps_s, img_shape, interpret=False, n_ramp_rows=NR,
                n_programs=LT)
            legacy_out, ovf = call(
                counts, legacy_ids, scalars, slab, area_blk, stops_pad,
                img_flat)
            ranks = _ops.gather_guarded(
                xp, tile2rank, xp.clip(legacy_ids, 0, GRID - 1))
            NTC = out_compact.shape[0]
            tgt = xp.where((legacy_ids < GRID) & (ranks >= 0), ranks, NTC)
            out_compact = out_compact.at[tgt].set(legacy_out, mode="drop")
            return out_compact.sum() + tile2rank.sum()
        return body

    stages = ["coarse", "area_rows", "records", "v2", "slab", "legacy"]
    prev = 0.0
    for st in stages:
        fn = jax.jit(upto(st))
        t0 = time.time()
        out = fn(scene_dev, fresh_layout(), ramps_dev, atlas_dev)
        _ = np.asarray(out)
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
