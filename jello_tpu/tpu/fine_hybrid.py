"""Hybrid fine pass: record-stream kernel + per-tile interpreter merge.

The record-stream kernel (fine_v2) turns src-over compositing into a
segmented affine scan — the fast path for solid/gradient paints AND
depth-1 pure clip groups (a pure clip group is itself an affine map of
the background; fine_v2 composes it with a first scan over group
extents). Only tapes beyond that formulation — image paints (texture
taps), NESTED clips, non-trivial blend groups — route their whole tile
through the per-tile interpreter kernel (fine_pallas):

  1. classify legacy tiles from the sorted command stream
     (pipeline/coarse.classify_legacy_tiles — shared with the host
     calibration's stats pass);
  2. flag their records so the record-stream kernel treats them as the
     identity map (flag bit 1), and pack the group-scan metadata
     (bits 4/5 + pass-1 segment ids) for everything else;
  3. run the record-stream kernel over the whole stream (it writes
     base-colored rows for legacy tiles);
  4. build a compact command slab for just the legacy tiles and run the
     interpreter kernel over them (grid = legacy capacity; tile ids ride
     scalar prefetch; coverage rows and packed records are shared with
     the record-stream pass);
  5. scatter the interpreter rows into the compact output by tile rank.

Cost scales with the number of legacy tiles, not the frame: a scene
with a few image draws pays interpreter cost only under those images
(the reference's fine dispatch covers the whole surface uniformly,
fine.wgsl:814).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..pipeline import ops
from ..pipeline.coarse import classify_legacy_tiles
from ..pipeline.coverage import compute_area_rows
from ..pipeline.flatten import expand_by_counts
from .fine_pallas import build_records, make_fine_kernel
from .fine_v2 import fine_v2


def fine_hybrid(scene, cmds, segs, counted, info, ramps, images, layout,
                caps, interpret=False):
    """Returns ((compact [PCpad,4,256] un-premultiplied, record-indexed;
    tile2rank maps tile -> its last record's row),
    flags)."""
    xp = jnp
    interpret = interpret or bool(caps.get("_expand_interpret", False))
    GRID = caps["tile_grid_cap"]
    MC = caps["cmds_per_tile"]
    LT = caps.get("legacy_tiles_cap", 2048)

    tile = cmds["tile"].astype(xp.int32)
    in_grid = tile < GRID

    lt_flag, d_excl, is_begin, is_end = classify_legacy_tiles(xp, cmds, caps)
    legacy_flag = xp.concatenate([lt_flag, xp.zeros(1, dtype=xp.int32)])

    # Record flag packing for the record-stream kernel (fine_v2):
    #   bit 1: record lives in a legacy tile (identity in both passes)
    #   bit 4: pass-2 identity (group member or BeginClip)
    #   bit 5: EndClip transform (group product -> clip-modulated map)
    #   bits 8..31: pass-1 segment id (new segment at every non-group
    #     record and at each BeginClip; ids are strictly monotone along
    #     the stream, so tile changes always change the id too)
    rec_legacy = ops.gather_guarded(xp, legacy_flag, xp.clip(tile, 0, GRID)) > 0
    non_leg = ~rec_legacy & in_grid
    in_group = non_leg & (is_begin | is_end | (d_excl >= 1))
    end_t = non_leg & is_end
    ident2 = in_group & ~is_end
    seg1_start = (~in_group) | is_begin
    seg1 = xp.cumsum(seg1_start.astype(xp.uint32))
    cmds = dict(cmds)
    cmds["flags"] = (
        cmds["flags"]
        | (rec_legacy.astype(xp.uint32) << 1)
        | (ident2.astype(xp.uint32) << 4)
        | (end_t.astype(xp.uint32) << 5)
        | (seg1 << 8)
    )

    # Shared between both kernels: coverage rows + packed records.
    caps_s = dict(caps)
    NR, W = ramps.shape[0], ramps.shape[1]
    caps_s["max_stops"] = (W - 1) // 5
    area_blk, area_row_rec, rows_overflow = compute_area_rows(
        xp, cmds, counted, caps_s
    )
    cmds["area_row"] = area_row_rec
    rec = build_records(xp, cmds, scene, info, caps_s)

    # Image-tap kernel: premultiplied fg rows per image record, so
    # image paints ride the record-stream affine scan and only
    # nested-clip/blend tiles stay legacy (tpu/image_tap.py).
    fg_tab = None
    tap_flags = {}
    if caps.get("_image_tap") and images is not None:
        from .image_tap import image_tap

        fg_tab, region_ovf, recs_ovf = image_tap(
            xp, rec, cmds, images, layout, caps_s, interpret=interpret
        )
        tap_flags["image_region_overflow"] = region_ovf
        tap_flags["img_recs_overflow"] = recs_ovf

    (out_compact, tile2rank), flags = fine_v2(
        scene, cmds, segs, counted, info, ramps, images, layout, caps,
        interpret=interpret,
        precomputed=(area_blk, area_row_rec, rows_overflow, rec),
        fg_tab=fg_tab,
    )

    # Compact legacy tile list.
    lrec, _, lvalid, _, n_legacy = expand_by_counts(xp, lt_flag, LT)
    legacy_ids = xp.where(lvalid, lrec, GRID).astype(xp.int32)
    flags = dict(flags)
    flags["legacy_overflow"] = n_legacy > LT

    # Per-legacy-slot command slab: records keep tile order; slot =
    # legacy-rank(tile) * MC + index-within-tile.
    lidx_of_tile = ops.exclusive_cumsum(xp, lt_flag)
    PC = tile.shape[0]
    j = xp.arange(PC, dtype=xp.int32)
    start_of_tile = ops.gather_guarded(xp, cmds["tile_start"], tile)
    within = j - start_of_tile
    lidx = ops.gather_guarded(xp, lidx_of_tile, tile)
    ok = rec_legacy & in_grid & (within < MC) & (lidx < LT)
    slot = xp.where(ok, lidx * MC + within, LT * MC)
    slab = xp.zeros((LT * MC + 1, 16), dtype=xp.uint32)
    slab = slab.at[slot].set(rec, mode="drop")
    slab = slab[: LT * MC].reshape(LT, MC, 16)
    # Slab capacity for legacy tiles, AND the group-scan window bound
    # for non-legacy tiles: fine_v2's coverage window reaches back
    # cmds_per_tile rows for EndClip references, so a clip-bearing tile
    # whose tape exceeds MC must grow the class (GROW_ON_FLAG doubles
    # cmds_per_tile, which widens the window).
    n_cmds_tile = cmds["tile_end"] - cmds["tile_start"]
    has_group = ops.scatter_max(
        xp,
        xp.zeros(GRID + 1, dtype=xp.int32),
        xp.where(in_grid, tile, GRID),
        in_group.astype(xp.int32),
    )[:GRID]
    flags["cmd_slab_overflow"] = xp.any(
        ((lt_flag > 0) | (has_group > 0)) & (n_cmds_tile > MC)
    )

    counts_tile = xp.clip(n_cmds_tile, 0, MC).astype(xp.int32)
    counts = xp.where(
        legacy_ids < GRID,
        ops.gather_guarded(xp, counts_tile, xp.clip(legacy_ids, 0, GRID - 1)),
        0,
    )
    counts = xp.concatenate(
        [counts, xp.asarray(layout["width_in_tiles"], dtype=xp.int32).reshape(1)]
    )
    scalars = xp.asarray(layout["base_color"], dtype=xp.float32)

    # Stop table / atlas packing mirrors fine_pallas.fine_pallas.
    from .fine_pallas import atlas_planar

    stops_pad = xp.zeros((NR, 128), dtype=xp.float32)
    stops_pad = stops_pad.at[:, :W].set(ramps)
    img_flat, img_shape = atlas_planar(images)

    if caps_s.get("_interp_batch", False):
        from .fine_pallas import make_fine_kernel_b8

        LT8 = -(-LT // 8) * 8
        padn = LT8 - LT
        if padn:
            slab = xp.concatenate(
                [slab, xp.zeros((padn, MC, 16), dtype=xp.uint32)], axis=0
            )
            legacy_ids = xp.concatenate(
                [legacy_ids, xp.full(padn, GRID, dtype=xp.int32)]
            )
            counts = xp.concatenate(
                [counts[:-1], xp.zeros(padn, dtype=xp.int32), counts[-1:]]
            )
        call = make_fine_kernel_b8(
            caps_s, img_shape, interpret=interpret, n_ramp_rows=NR,
            n_programs=LT8,
        )
        legacy_out, ovf = call(
            counts, legacy_ids, scalars, slab, area_blk, stops_pad,
            img_flat,
        )
        legacy_out = legacy_out[:LT]
        ovf = ovf[:LT]
        legacy_ids = legacy_ids[:LT]
    else:
        call = make_fine_kernel(
            caps_s, img_shape, interpret=interpret, n_ramp_rows=NR,
            n_programs=LT
        )
        legacy_out, ovf = call(
            counts, legacy_ids, scalars, slab, area_blk, stops_pad, img_flat
        )
    flags["blend_depth_overflow"] = xp.any((ovf & 1) > 0)
    flags["image_region_overflow"] = xp.any((ovf & 2) > 0)
    if tap_flags:
        flags["image_region_overflow"] = (
            flags["image_region_overflow"] | tap_flags["image_region_overflow"]
        )
        flags["img_recs_overflow"] = tap_flags["img_recs_overflow"]

    # Merge: overwrite legacy tiles' compact rows.
    ranks = ops.gather_guarded(xp, tile2rank, xp.clip(legacy_ids, 0, GRID - 1))
    NTC = out_compact.shape[0]
    tgt = xp.where((legacy_ids < GRID) & (ranks >= 0), ranks, NTC)
    out_compact = out_compact.at[tgt].set(legacy_out, mode="drop")

    return (out_compact, tile2rank), flags
