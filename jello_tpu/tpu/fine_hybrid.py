"""Hybrid fine pass: record-stream kernel + per-tile interpreter merge.

The record-stream kernel (fine_v2) turns src-over compositing into a
segmented affine scan — the fast path for solid/gradient paints. Clip
groups and image paints are not affine in that formulation (blend
stacks / texture taps), so tiles containing any clip or image record
("legacy tiles") render through the per-tile interpreter kernel
(fine_pallas) instead:

  1. mark legacy tiles from the sorted command stream (one scatter-max
     over records);
  2. flag their records so the record-stream kernel treats them as the
     identity map (flag bit 1);
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
from ..pipeline.coarse import CMD_BEGIN_CLIP, CMD_END_CLIP, CMD_IMAGE
from ..pipeline.coverage import compute_area_rows
from ..pipeline.flatten import expand_by_counts
from .fine_pallas import build_records, make_fine_kernel
from .fine_v2 import fine_v2


def fine_hybrid(scene, cmds, segs, counted, info, ramps, images, layout,
                caps, interpret=False):
    """Returns ((compact [GRID+C,4,256] un-premultiplied, tile2rank),
    flags)."""
    xp = jnp
    interpret = interpret or bool(caps.get("_expand_interpret", False))
    GRID = caps["tile_grid_cap"]
    MC = caps["cmds_per_tile"]
    LT = caps.get("legacy_tiles_cap", 2048)

    tile = cmds["tile"].astype(xp.int32)
    kind = cmds["kind"]
    in_grid = tile < GRID
    is_legacy_kind = (
        (kind == CMD_IMAGE) | (kind == CMD_BEGIN_CLIP) | (kind == CMD_END_CLIP)
    ) & in_grid

    legacy_flag = xp.zeros(GRID + 1, dtype=xp.int32)
    legacy_flag = legacy_flag.at[xp.where(in_grid, tile, GRID)].max(
        is_legacy_kind.astype(xp.int32), mode="drop"
    )
    lt_flag = legacy_flag[:GRID]

    # Flag records in legacy tiles (bit 1 = identity in the record-stream
    # kernel).
    rec_legacy = ops.gather_guarded(xp, legacy_flag, xp.clip(tile, 0, GRID)) > 0
    cmds = dict(cmds)
    cmds["flags"] = cmds["flags"] | (rec_legacy.astype(xp.uint32) << 1)

    # Shared between both kernels: coverage rows + packed records.
    caps_s = dict(caps)
    NR, W = ramps.shape[0], ramps.shape[1]
    caps_s["max_stops"] = (W - 1) // 5
    area_blk, area_row_rec, rows_overflow = compute_area_rows(
        xp, cmds, counted, caps_s
    )
    cmds["area_row"] = area_row_rec
    rec = build_records(xp, cmds, scene, info, caps_s)

    (out_compact, tile2rank), flags = fine_v2(
        scene, cmds, segs, counted, info, ramps, images, layout, caps,
        interpret=interpret,
        precomputed=(area_blk, area_row_rec, rows_overflow, rec),
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
    n_cmds_tile = cmds["tile_end"] - cmds["tile_start"]
    flags["cmd_slab_overflow"] = xp.any(
        (lt_flag > 0) & (n_cmds_tile > MC)
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

    call = make_fine_kernel(
        caps_s, img_shape, interpret=interpret, n_ramp_rows=NR, n_programs=LT
    )
    legacy_out, ovf = call(
        counts, legacy_ids, scalars, slab, area_blk, stops_pad, img_flat
    )
    flags["blend_depth_overflow"] = xp.any((ovf & 1) > 0)
    flags["image_region_overflow"] = xp.any((ovf & 2) > 0)

    # Merge: overwrite legacy tiles' compact rows.
    ranks = ops.gather_guarded(xp, tile2rank, xp.clip(legacy_ids, 0, GRID - 1))
    NTC = out_compact.shape[0]
    tgt = xp.where((legacy_ids < GRID) & (ranks >= 0), ranks, NTC)
    out_compact = out_compact.at[tgt].set(legacy_out, mode="drop")

    return (out_compact, tile2rank), flags
