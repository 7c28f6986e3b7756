"""Geometry-sharded multi-chip rendering (v2).

The round-2 sharded path replicated all geometry and sharded only the
fine rasterization — Amdahl-capped at ~1.2x. This pipeline shards the
row-proportional geometry too (SURVEY §2.3 taken further):

  - **flatten** shards by TAG ranges: the pathtag monoid becomes a
    two-level scan (local exclusive scan + one all_gather of per-shard
    delta totals for the cross-device bases); the decode window peeks 4
    slots past the shard boundary so next-slot geometry stays local.
    Per-path outputs combine with pmax (bbox accumulator) / psum
    (marker-slot scatters — each path's marker lives in exactly one
    shard).
  - **path_count** shards by the LINE ranges flatten produced: each
    device runs the DDA/clip parameter pass and the streaming Pallas
    expansions on its own lines, then routes crossing records to the
    device owning the crossing's tile-grid stripe with one
    fixed-capacity lax.all_to_all (the TPU-native replacement for the
    reference's atomic slice allocation, path_count.wgsl). Backdrop
    deltas never travel: each device scatter-adds its local deltas
    into the [tiles] array and one psum combines them (contributions
    are disjoint per slot only for seg counts; backdrop adds are
    commutative).
  - per-tile seg_count / seg_start / backdrop replicate via psum (a
    slot's tile lives in exactly one stripe, so count contributions
    are disjoint), which is all the replicated **coarse** needs.
  - **coverage + fine (hybrid)** run per stripe on the device-local
    slot-sorted segment stream and the stripe's contiguous slice of
    the tile-sorted command stream — the production single-chip
    kernels, unmodified, on smaller shapes.
  - the frame leaves as one all_gather of per-stripe tile rows.

Replicated remainder: draw/clip scans, tile_alloc, coarse (a few ms of
the single-chip frame). Collectives: all_gather / psum / pmax /
all_to_all — all XLA, riding ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..pipeline import clips as clips_mod
from ..pipeline import coarse as coarse_mod
from ..pipeline import drawobjs, ops, tiling
from ..pipeline import flatten as flatten_mod
from ..pipeline.render import _draw_tags

AXIS = "shard"


def _align(v, q):
    return -(-int(v) // q) * q


def shard_caps(caps: dict, n: int, beta: float = 2.0) -> dict:
    """Derive the per-device capacity class from the global one.

    Line/tag/work/segment capacities scale ~1/n with a `beta` imbalance
    margin (content is not uniformly distributed over tag ranges or
    tile stripes); tile/draw/path/pair capacities stay global (those
    stages run replicated). Alignment: tag slots to 1024 (word decode +
    chunked kernels), expansion output caps to 512 (EXPAND_CHUNK).
    """
    c = dict(caps)
    c["n_tag_slots"] = _align(caps["n_tag_slots"] // n, 1024)
    for k in ("work_a_cap", "work_b_cap"):
        c[k] = _align(caps[k] * beta / n, 256)
    for k in ("euler_line_cap", "simple_line_cap", "arc_line_cap"):
        c[k] = _align(caps[k] * beta / n, 512)
    c["line_cap"] = (
        c["euler_line_cap"] + c["simple_line_cap"] + c["arc_line_cap"]
    )
    for k in ("seg_cap", "row_cap", "area_rows_cap"):
        c[k] = _align(caps[k] * beta / n, 512)
    for k in ("cross_lines_cap", "row_lines_cap"):
        c[k] = _align(caps[k] * beta / n, 512)
    c["cmd_cap"] = _align(caps.get("cmd_cap", caps["pair_cap"]) * beta / n, 512)
    c["legacy_tiles_cap"] = _align(
        caps.get("legacy_tiles_cap", 2048) * beta / n, 256
    )
    c["img_recs_cap"] = _align(
        caps.get("img_recs_cap", 1024) * beta / n, 256
    )
    # Per-(src,dst) exchange slice capacity for the crossing all_to_all.
    c["seg_ex_cap"] = _align(caps["seg_cap"] * beta / (n * n), 512)
    return c


def make_sharded_render(mesh: Mesh, caps_global: dict, interpret: bool = False,
                        debug: bool = False):
    """Build the jitted geometry-sharded render step.

    Returns fn(scene, layout, ramps, images) -> (fine_out [4, GRID,
    256], flags). caps_global is the single-chip capacity class;
    per-device capacities derive via shard_caps.
    """
    n = mesh.shape[AXIS]
    caps = dict(caps_global)
    GRID = caps["tile_grid_cap"]
    assert GRID % n == 0, (GRID, n)
    local_tiles = GRID // n
    caps_l = shard_caps(caps, n)
    if interpret:
        caps_l["_expand_interpret"] = True
    caps_l["_expand_pallas"] = True
    caps_l["_coverage_pallas"] = True
    if caps.get("_image_tap"):
        caps_l["_image_tap"] = True
    T = caps["tiles_cap"]
    N_l = caps_l["n_tag_slots"]
    PEX = caps_l["seg_ex_cap"]
    CC_l = caps_l["cmd_cap"]
    f32 = jnp.float32

    def run_shard(scene, layout_packed, ramps, images):
        from ..pipeline.render import unpack_layout

        xp = jnp
        layout = unpack_layout(xp, layout_packed)
        d = jax.lax.axis_index(AXIS)

        # ---- flatten: two-level tag monoid scan ------------------------
        tag_lo = d * N_l
        tags_local = flatten_mod.decode_tag_stream(
            xp, scene, layout["path_tag_base"] + tag_lo // 4, N_l
        )
        totals = flatten_mod.monoid_delta_totals(xp, tags_local)
        base = {}
        for k, v in totals.items():
            g = jax.lax.all_gather(v, AXIS)  # (n,)
            base[k] = (jnp.cumsum(g) - g)[d]
        fl = flatten_mod.flatten_stage(
            xp, scene, layout, caps_l,
            shard={"tag_lo": tag_lo, "monoid_base": base},
        )
        bb = jax.lax.pmax(fl["bb_acc"], AXIS)
        fl = dict(fl)
        fl["path_bbox"] = flatten_mod.finalize_path_bbox(xp, bb)
        fl["path_draw_flags"] = jax.lax.psum(
            fl["path_draw_flags"].astype(xp.int32), AXIS
        ).astype(xp.uint32)
        fl["path_trans_idx"] = jax.lax.psum(
            fl["path_trans_idx"].astype(xp.int32), AXIS
        ).astype(xp.uint32)
        flatten_overflow = jax.lax.pmax(fl["overflow"].astype(xp.int32), AXIS)

        # ---- replicated small stages -----------------------------------
        D = caps["n_draws_cap"]
        dta = _draw_tags(xp, scene, layout, D)
        dm = drawobjs.draw_monoid_scan(xp, dta)
        info, cia, cpa, tag, dd, di = drawobjs.draw_leaf(
            xp, scene, layout, dm, fl["path_trans_idx"],
            fl["path_draw_flags"], caps, tag=dta,
        )
        cb, dmp, dms = clips_mod.clip_leaf_vectorized(
            xp, cia, cpa, fl["path_bbox"],
            dm["path_idx"].astype(xp.int32),
            dm["scene_offset"].astype(xp.int32), layout, caps,
        )
        dm = dict(dm)
        dm["path_idx"] = dmp
        dm["scene_offset"] = dms
        dd = (layout["draw_data_base"] + dms).astype(xp.int32)
        draw_bbox = coarse_mod.binning_bboxes(
            xp, dm, fl["path_bbox"], cb, layout
        )
        paths = tiling.tile_alloc(xp, draw_bbox, tag, layout, caps)

        # ---- path_count: local lines -> routed crossings ---------------
        P21, n_cross, n_rows_per_line, (ymin, tiles_base, bb1, stride,
                                        delta) = tiling.path_count_params(
            xp, fl, paths, caps_l
        )
        from .expand_pallas import path_count_expansions

        L = P21.shape[0]
        LCC = caps_l["cross_lines_cap"]
        RLC = caps_l["row_lines_cap"]

        def compact(counts, cap):
            nz = counts > 0
            pos = ops.exclusive_cumsum(xp, nz.astype(xp.int32))
            n_nz = pos[-1] + nz[-1].astype(xp.int32)
            idx = ops.scatter_set(
                xp, xp.full(cap, L, dtype=xp.int32),
                xp.where(nz, pos, cap), xp.arange(L, dtype=xp.int32))
            return idx, n_nz

        cidx, n_nz_c = compact(n_cross, LCC)
        ridx, n_nz_r = compact(n_rows_per_line, RLC)
        compact_overflow = (n_nz_c > LCC) | (n_nz_r > RLC)
        P22 = xp.concatenate([P21, n_cross.astype(f32)[:, None]], axis=1)
        Pc = ops.gather_guarded(xp, P22, cidx)
        ncc = xp.where(xp.arange(LCC, dtype=xp.int32) < n_nz_c,
                       Pc[:, 21].astype(xp.int32), 0)
        PRT6 = xp.stack(
            [ymin, tiles_base.astype(f32), bb1, stride.astype(f32),
             delta.astype(f32), n_rows_per_line.astype(f32)], axis=1)
        PRTc = ops.gather_guarded(xp, PRT6, ridx)
        nrr = xp.where(xp.arange(RLC, dtype=xp.int32) < n_nz_r,
                       PRTc[:, 5].astype(xp.int32), 0)

        tile_slot, seg_pre, bump_slot, bump_delta, r_slot, r_delta, \
            c_total, r_total = path_count_expansions(
                xp, Pc[:, :21], PRTc[:, :5], ncc, nrr, T, caps_l,
                assume_compact=True,
            )
        SC_l = caps_l["seg_cap"]

        # Backdrop: local scatter + one psum (adds are commutative).
        backdrop_local = xp.zeros(T + 1, dtype=xp.int32)
        backdrop_local = ops.scatter_add(xp, backdrop_local, r_slot, r_delta)
        backdrop_local = ops.scatter_add(
            xp, backdrop_local, bump_slot, bump_delta
        )
        bd = jax.lax.psum(backdrop_local[:T], AXIS)

        # Crossing destination stripe: the slot's grid tile.
        slot_ok = (tile_slot >= 0) & (tile_slot < T)
        s_clip = xp.clip(tile_slot, 0, T - 1)
        g_tx = ops.gather_guarded(xp, paths["tile_tx"], s_clip)
        g_ty = ops.gather_guarded(xp, paths["tile_ty"], s_clip)
        g_id = g_ty * layout["width_in_tiles"] + g_tx
        dest = xp.where(slot_ok, xp.clip(g_id // local_tiles, 0, n - 1), n)

        # Pack by destination: one small sort + fixed-slice scatter.
        ds, slot_s, x0s, y0s, x1s, y1s, yes_ = ops.sort_multi(
            xp, dest.astype(xp.int32),
            (tile_slot.astype(f32), seg_pre["seg_x0"], seg_pre["seg_y0"],
             seg_pre["seg_x1"], seg_pre["seg_y1"], seg_pre["seg_y_edge"]),
        )
        counts_dest = ops.scatter_add(
            xp, xp.zeros(n + 1, dtype=xp.int32),
            xp.clip(ds, 0, n), xp.ones(SC_l, dtype=xp.int32),
        )
        start_dest = ops.exclusive_cumsum(xp, counts_dest)
        within = xp.arange(SC_l, dtype=xp.int32) - ops.gather_guarded(
            xp, start_dest, xp.clip(ds, 0, n)
        )
        ok_send = (ds < n) & (within < PEX)
        exchange_overflow = xp.any((ds < n) & (within >= PEX))
        sendpos = xp.where(ok_send, ds * PEX + within, n * PEX)
        send = xp.zeros((n * PEX + 1, 8), dtype=f32)
        send = send.at[:, 0].set(f32(T))  # unwritten rows -> dead slot
        rows = xp.stack(
            [slot_s, x0s, y0s, x1s, y1s, yes_,
             xp.zeros(SC_l, f32), xp.zeros(SC_l, f32)], axis=1
        )
        send = send.at[sendpos].set(rows, mode="drop")
        send = send[: n * PEX].reshape(n, PEX, 8)
        recv = jax.lax.all_to_all(send, AXIS, split_axis=0, concat_axis=0,
                                  tiled=False)
        recv = recv.reshape(n * PEX, 8)

        # ---- local slot sort + per-tile counts -------------------------
        r_slot_i = recv[:, 0].astype(xp.int32)
        sorted_slot, sx0, sy0, sx1, sy1, sye = ops.sort_multi(
            xp, r_slot_i,
            (recv[:, 1], recv[:, 2], recv[:, 3], recv[:, 4], recv[:, 5]),
        )
        segs_local = {
            "seg_x0": sx0, "seg_y0": sy0, "seg_x1": sx1, "seg_y1": sy1,
            "seg_y_edge": sye,
        }
        binc = ops.scatter_add(
            xp, xp.zeros(T + 1, dtype=xp.int32),
            xp.where((sorted_slot >= 0) & (sorted_slot < T), sorted_slot, T),
            xp.ones(n * PEX, dtype=xp.int32),
        )
        count_local = binc[:T]
        start_local = ops.exclusive_cumsum(xp, count_local)
        seg_count = jax.lax.psum(count_local, AXIS)
        # Global seg_start: owner-local position + device base (for the
        # fine_ref fallback / API parity; the Pallas fine never reads it).
        owned = count_local > 0
        seg_start = jax.lax.psum(
            xp.where(owned, start_local + d * (n * PEX), 0), AXIS
        )

        # Backdrop prefix along rows (replicated).
        cume = ops.exclusive_cumsum(xp, bd)
        row_start = paths["tile_row_start"]
        bd_prefix = cume - ops.gather_guarded(xp, cume, row_start) + bd

        has = (seg_count > 0).astype(xp.int32)
        row_of_slot = ops.exclusive_cumsum(xp, has)
        n_rows = row_of_slot[-1] + has[-1]

        counted_global = {
            "seg_count": seg_count,
            "seg_start": seg_start,
            "backdrop": bd_prefix,
            "row_of_slot": row_of_slot,
            "n_rows": n_rows,
        }

        # ---- coarse (replicated) ---------------------------------------
        sc4 = ops.gather_guarded(
            xp, scene, xp.concatenate([dd + k for k in range(4)])
        ).reshape(4, D)
        dtab = xp.concatenate([xp.transpose(sc4), info[:, 1:10]], axis=1)
        cmds = coarse_mod.build_commands(
            xp, scene, layout, dm, tag, dtab, draw_bbox, paths,
            counted_global, fl["path_draw_flags"], caps,
        )
        cmds["dtab"] = dtab
        pairs_overflow = cmds["overflow"]

        # ---- stripe-local command slice --------------------------------
        st = cmds["tile"].astype(xp.int32)
        stripe_lo = d * local_tiles
        stripe_hi = stripe_lo + local_tiles
        lo_d = xp.sum((st < stripe_lo).astype(xp.int32))
        cnt_d = xp.sum(((st >= stripe_lo) & (st < stripe_hi)).astype(xp.int32))
        slice_overflow = cnt_d > CC_l

        def slc(a, fill):
            pad = xp.full((CC_l,) + a.shape[1:], fill, dtype=a.dtype)
            ext = xp.concatenate([a, pad], axis=0)
            out = jax.lax.dynamic_slice_in_dim(ext, lo_d, CC_l, axis=0)
            # Mask the tail (records of other stripes / padding).
            j = xp.arange(CC_l, dtype=xp.int32)
            live = j < cnt_d
            shape = (CC_l,) + (1,) * (a.ndim - 1)
            return xp.where(live.reshape(shape), out, fill)

        cmds_local = {
            "tile": slc(cmds["tile"].astype(xp.int32), GRID),
            "kind": slc(cmds["kind"], 0),
            "seg_start": slc(cmds["seg_start"], 0) - d * (n * PEX),
            "seg_count": slc(cmds["seg_count"], 0),
            "backdrop": slc(cmds["backdrop"], 0),
            "tile_slot": slc(cmds["tile_slot"], T),
            "flags": slc(cmds["flags"], 0),
            "draw": slc(cmds["draw"], 0),
            # Per-DRAW table ([D, 13]), not per-command: replicated.
            "dtab": cmds["dtab"],
        }
        # Local run boundaries (positions within the slice).
        stl = cmds_local["tile"]
        i_ids = xp.arange(CC_l, dtype=xp.int32)
        prev = xp.concatenate([xp.full(1, -1, stl.dtype), stl[:-1]])
        nxt_t = xp.concatenate([stl[1:], xp.full(1, GRID + 1, stl.dtype)])
        first = (stl != prev) & (stl < GRID)
        last = (stl != nxt_t) & (stl < GRID)
        tile_start = xp.zeros(GRID, dtype=xp.int32)
        tile_end = xp.zeros(GRID, dtype=xp.int32)
        tile_start = tile_start.at[xp.where(first, stl, GRID)].set(
            i_ids, mode="drop", unique_indices=True
        )
        tile_end = tile_end.at[xp.where(last, stl, GRID)].set(
            i_ids + 1, mode="drop", unique_indices=True
        )
        cmds_local["tile_start"] = tile_start
        cmds_local["tile_end"] = tile_end
        cmds_local["max_cmds"] = xp.max(tile_end - tile_start)

        counted_local = {
            "segs": segs_local,
            "sorted_slot": sorted_slot,
            "seg_count": xp.where(owned, seg_count, 0),
            "seg_start": start_local,
            "backdrop": bd_prefix,
            "n_rows": n_rows,
        }

        # ---- stripe-local hybrid fine ----------------------------------
        from .fine_hybrid import fine_hybrid
        from .fine_v2 import assemble_compact

        (compact, tile2rank), fflags = fine_hybrid(
            scene, cmds_local, segs_local, counted_local, info, ramps,
            images, layout, caps_l, interpret=interpret,
        )

        # ---- assemble: per-stripe tile rows + all_gather ---------------
        own_tiles = stripe_lo + xp.arange(local_tiles, dtype=xp.int32)
        ranks = ops.gather_guarded(xp, tile2rank, own_tiles)
        rows = ops.gather_guarded(
            xp, compact, xp.clip(ranks, 0, compact.shape[0] - 1)
        )
        base_c = xp.asarray(layout["base_color"], dtype=f32)
        ba = xp.maximum(base_c[3], 1e-6)
        base_un = xp.stack(
            [base_c[0] / ba, base_c[1] / ba, base_c[2] / ba, base_c[3]]
        )
        rows = xp.where(
            (ranks >= 0)[:, None, None], rows, base_un[None, :, None]
        )
        full = jax.lax.all_gather(rows, AXIS)  # (n, local, 4, 256)
        fine_out = xp.transpose(full.reshape(GRID, 4, 256), (1, 0, 2))

        def anyf(v):
            return jax.lax.pmax(v.astype(xp.int32), AXIS) > 0

        flags = {
            "flatten_overflow": flatten_overflow > 0,
            "tiles_overflow": anyf(paths["overflow"]),
            "segs_overflow": anyf(
                (c_total > SC_l) | (r_total > caps_l["row_cap"])
                | compact_overflow | exchange_overflow
            ),
            "pairs_overflow": anyf(pairs_overflow | slice_overflow),
        }
        for k, v in fflags.items():
            flags[k] = anyf(v)
        if caps_l.get("_image_tap") and "img_recs_overflow" not in flags:
            # Tap routing on but this frame carries no atlas: keep the
            # flag set static per caps class (out_specs shape).
            flags["img_recs_overflow"] = (
                jax.lax.pmax(jnp.int32(0), AXIS) > 0
            )
        if debug:
            dbg = {
                "seg_count": seg_count,
                "seg_start": seg_start,
                "backdrop": bd_prefix,
                "count_local": jax.lax.all_gather(count_local, AXIS),
                "segs_local": jax.lax.all_gather(
                    xp.stack([recv[:, 0], recv[:, 1], recv[:, 2],
                              recv[:, 3], recv[:, 4], recv[:, 5]], axis=1),
                    AXIS),
                "cmd_tile": cmds["tile"],
                "cmd_kind": cmds["kind"],
                "cmd_seg_count": cmds["seg_count"],
                "cmd_backdrop": cmds["backdrop"],
                "lo_d": jax.lax.all_gather(lo_d, AXIS),
                "cnt_d": jax.lax.all_gather(cnt_d, AXIS),
                "local_tile": jax.lax.all_gather(cmds_local["tile"], AXIS),
                "local_seg_start": jax.lax.all_gather(
                    cmds_local["seg_start"], AXIS),
                "local_seg_count": jax.lax.all_gather(
                    cmds_local["seg_count"], AXIS),
                "local_backdrop": jax.lax.all_gather(
                    cmds_local["backdrop"], AXIS),
                "ranks": jax.lax.all_gather(ranks, AXIS),
            }
            return fine_out, flags, dbg
        return fine_out, flags

    flag_keys = (
        "flatten_overflow", "tiles_overflow", "segs_overflow",
        "pairs_overflow", "area_rows_overflow", "legacy_overflow",
        "cmd_slab_overflow", "blend_depth_overflow",
        "image_region_overflow",
    )
    if caps.get("_image_tap"):
        flag_keys = flag_keys + ("img_recs_overflow",)
    out_specs = (P(), {k: P() for k in flag_keys})
    if debug:
        out_specs = out_specs + ({
            "seg_count": P(), "seg_start": P(), "backdrop": P(),
            "count_local": P(), "segs_local": P(), "cmd_tile": P(),
            "cmd_kind": P(), "cmd_seg_count": P(), "cmd_backdrop": P(),
            "lo_d": P(), "cnt_d": P(), "local_tile": P(),
            "local_seg_start": P(), "local_seg_count": P(),
            "local_backdrop": P(), "ranks": P(),
        },)
    fn = jax.shard_map(
        run_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)


def dryrun(n_devices: int, full_profile: bool = False,
           image_tap: bool = False, aa: str = "area"):
    """Compile + run one geometry-sharded frame on an n-device mesh and
    cross-check against the single-device numpy oracle.

    full_profile=True uses a larger scene with clips, gradients and an
    image crossing stripe boundaries (the driver's tiny scene plus
    feature coverage). image_tap=True routes image paints through the
    image-tap kernel + record-stream fine inside each shard
    (tpu/image_tap.py)."""
    import jello_tpu as jt
    from ..cpu.pipeline import build_image_atlas, build_layout_dict
    from ..pipeline.fine_ref import assemble_image
    from ..pipeline.gradient import stops_table_or_empty
    from ..renderer.estimate import estimate_caps
    from ..renderer.params import RenderParams
    from ..renderer.resolve import Resolver
    from ..pipeline import render as render_mod

    devices = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devices, (AXIS,))

    scene = jt.Scene()
    W = H = 256 if full_profile else 128
    path = (jt.BezPath().move_to(5, 5).cubic_to(30, 2, 50, 60, W - 30, H - 50)
            .line_to(60, 10).close())
    scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
               jt.SolidBrush(jt.Color.rgba(0, 0.7, 0.2, 1)), None, path)
    scene.stroke(
        jt.Stroke(width=3).with_caps(jt.Cap.ROUND), jt.Affine.identity(),
        jt.SolidBrush(jt.Color.rgba(0.8, 0.1, 0.1, 1)), None,
        jt.BezPath().move_to(10, H - 40).line_to(W - 10, H - 30),
    )
    if full_profile:
        # A pure clip group crossing every stripe boundary (tall rect).
        clipr = (jt.BezPath().move_to(30.5, 8.3).line_to(90.5, 8.3)
                 .line_to(90.5, H - 8.7).line_to(30.5, H - 8.7).close())
        scene.push_layer(jt.BlendMode(jt.Mix.CLIP, jt.Compose.SRC_OVER),
                         1.0, jt.Affine.identity(), clipr)
        scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
                   jt.SolidBrush(jt.Color.rgba(0.1, 0.2, 0.9, 0.6)), None,
                   (jt.BezPath().move_to(20, 20).line_to(110, 40)
                    .line_to(60, H - 20).close()))
        scene.pop_layer()
        # A gradient and an image spanning rows.
        stops = (jt.ColorStop(0.0, jt.Color.rgba(1, 0, 0, 1)),
                 jt.ColorStop(1.0, jt.Color.rgba(0, 0, 1, 1)))
        scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
                   jt.GradientBrush(
                       jt.LinearGradient((120, 10), (200, 200), stops)),
                   None,
                   (jt.BezPath().move_to(120, 10).line_to(220, 10)
                    .line_to(220, 210).line_to(120, 210).close()))
        pix = (np.arange(8 * 8 * 4, dtype=np.uint32).reshape(8, 8, 4)
               % 256).astype(np.uint8)
        pix[..., 3] = 255
        scene.fill(jt.Fill.NON_ZERO,
                   jt.Affine.translate(160, 60) @ jt.Affine.scale(6.0),
                   jt.ImageBrush(jt.Image(pixels=pix)), None,
                   (jt.BezPath().move_to(0, 0).line_to(8, 0).line_to(8, 8)
                    .line_to(0, 8).close()))
    params = RenderParams(width=W, height=H,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld_np = build_layout_dict(layout, params)
    caps = estimate_caps(layout, params.width, params.height)
    # The stripe math needs GRID % n == 0 (pow2 grid cap: already true
    # for n in {1,2,4,8}).
    assert caps["tile_grid_cap"] % n_devices == 0

    nsc = 1 << (len(scene_u32) - 1).bit_length()
    scene_padded = np.zeros(max(nsc, 1024), dtype=np.uint32)
    scene_padded[: len(scene_u32)] = scene_u32
    ramps_arr = stops_table_or_empty(ramps)
    atlas = build_image_atlas(images)

    if image_tap:
        caps = dict(caps)
        caps["_image_tap"] = True
    if aa != "area":
        # MSAA inside the shard: the coverage kernel emits resolved
        # per-sample-exact rows per stripe.
        caps = dict(caps)
        caps["aa_mode"] = aa
    run = make_sharded_render(mesh, caps, interpret=True)
    ld = {k: jnp.asarray(v) for k, v in ld_np.items()}
    from ..pipeline.render import pack_layout

    out, flags = run(
        jnp.asarray(scene_padded),
        jnp.asarray(pack_layout(ld_np)),
        jnp.asarray(ramps_arr),
        None if atlas is None else jnp.asarray(atlas),
    )
    out.block_until_ready()
    bad = {k: bool(np.asarray(v)) for k, v in flags.items()
           if bool(np.asarray(v))}
    assert not bad, f"sharded overflow flags raised: {bad}"

    from ..cpu.pipeline import render as render_numpy_fn

    ref, _, _ = render_numpy_fn(scene, params, caps=dict(caps))
    img = assemble_image(np, np.asarray(out), ld_np)
    err = np.abs(np.asarray(img) - ref).max()
    assert err < 8e-3, f"sharded render mismatch: {err}"
    return err
