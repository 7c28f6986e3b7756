"""Pallas TPU fine-rasterization kernel.

The reference's fine stage (fine.wgsl) is one workgroup per 16x16 tile
interpreting a per-tile command tape, including a per-segment coverage
loop. The TPU build splits that differently:

  - Fill *coverage* is computed ahead of the kernel by the batched
    XLA coverage pass (pipeline/coverage.py): one dense sweep over the
    tile-sorted segment stream producing a compact [AR, 256] table of
    raw winding "area rows". The kernel fetches rows by index — the
    irregular per-tile segment loop never enters the kernel.
  - Commands are re-packed by XLA into a dense slab [GRID, MC, 16] of
    u32 records with paint parameters baked in (build_cmd_slab does the
    scene/info gathers densely at build time), streamed through VMEM
    via BlockSpec double buffering, one program per tile.
  - Pixel state is channel-planar (4, 256) f32 VMEM scratch; the blend
    stack is (BD, 4, 256) scratch (fine.wgsl's register stack + spill
    buffer, unified).
  - Gradient ramps are sampled with a one-hot matmul on the MXU (the
    TPU-native replacement for the texture unit); small image brushes
    sample the same way against the resident atlas.

Record layout (u32 words):
  0 kind  1 area_row  2 seg_count(<0 => begin-clip zero)  3 backdrop
  4 flags(bit0 even-odd)
  color:  5..8 rgba f32 bits
  lin:    5 extend, 6..8 line_x/y/c, 15 ramp_row (ramp_idx*512)
  rad:    5 extend, 6..11 xform, 12 focal_x, 13 radius, 14 kind_flags,
          15 ramp_row
  sweep:  5 extend, 6..11 xform, 12 t0, 13 t1, 15 ramp_row
  image:  6..11 xform, 12 atlas placement (ay<<16|ax), 13 wh_packed
  end_clip: 5 blend_word, 6 alpha f32 bits
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import blend_math as bm
from ..pipeline.coarse import (
    CMD_BEGIN_CLIP,
    CMD_COLOR,
    CMD_END_CLIP,
    CMD_IMAGE,
    CMD_LIN_GRAD,
    CMD_RAD_GRAD,
    CMD_SWEEP_GRAD,
)
from ..pipeline.coverage import compute_area_rows
from ..pipeline.drawobjs import (
    RAD_GRAD_KIND_CIRCULAR,
    RAD_GRAD_KIND_FOCAL_ON_CIRCLE,
    RAD_GRAD_KIND_STRIP,
    RAD_GRAD_SWAPPED,
)


def build_records(xp, cmds, scene, info, caps):
    """Pack the sorted command stream into dense 16-word u32 records
    [PC, 16] (tile order preserved, no scatter). Layout in module doc;
    word 3 carries the tile id (the record-stream kernel derives pixel
    coords and segment boundaries from it)."""
    kind = cmds["kind"]
    PC = cmds["tile"].shape[0]

    # One row gather of the per-draw word table built in render_frame
    # (columns: scene[dd+0..3], info[di+1..9]) instead of ~14 element
    # gathers over the command stream.
    from ..pipeline import ops as _ops

    drow = _ops.gather_guarded(xp, cmds["dtab"], cmds["draw"])

    def sc_u(off):
        return drow[:, off]

    def info_u(off):
        return drow[:, 3 + off]

    z = xp.zeros(PC, dtype=xp.uint32)
    is_color = kind == CMD_COLOR
    is_lin = kind == CMD_LIN_GRAD
    is_rad = kind == CMD_RAD_GRAD
    is_sweep = kind == CMD_SWEEP_GRAD
    is_img = kind == CMD_IMAGE
    is_end = kind == CMD_END_CLIP
    is_grad = is_lin | is_rad | is_sweep
    is_xf = is_rad | is_sweep | is_img

    index_mode = sc_u(0)
    ramp_row = xp.where(is_grad, index_mode >> 2, z)  # stop-table row id
    extend = xp.where(is_grad, index_mode & 3, z)

    w = [None] * 16
    w[0] = kind.astype(xp.uint32)
    w[1] = cmds["area_row"].astype(xp.uint32)
    w[2] = cmds["seg_count"].astype(xp.uint32)
    w[3] = cmds["tile"].astype(xp.uint32)
    w[4] = cmds["flags"].astype(xp.uint32)
    w[5] = xp.where(is_color | is_end, sc_u(0), xp.where(is_grad, extend, z))
    x6 = xp.where(is_color, sc_u(1), z)
    x6 = xp.where(is_lin | is_xf, info_u(1), x6)
    x6 = xp.where(is_end, sc_u(1), x6)
    w[6] = x6
    # Word 7 for EndClips: the tile backdrop (i32 bits) — a row-less
    # EndClip resolves its clip coverage from it (0 = zero group,
    # nonzero = full coverage; fine_v2's group transform).
    w[7] = xp.where(
        is_end,
        cmds["backdrop"].astype(xp.uint32),
        xp.where(is_color, sc_u(2), xp.where(is_lin | is_xf, info_u(2), z)),
    )
    w[8] = xp.where(is_color, sc_u(3), xp.where(is_lin | is_xf, info_u(3), z))
    w[9] = xp.where(is_xf, info_u(4), z)
    w[10] = xp.where(is_xf, info_u(5), z)
    w[11] = xp.where(is_xf, info_u(6), z)
    # word 12 for images: the atlas placement (ay<<16|ax) patched by
    # the resolver (resolve.go:128-149's index scheme, offsets here).
    w[12] = xp.where(is_rad | is_sweep | is_img, info_u(7), z)
    w[13] = xp.where(is_rad | is_sweep | is_img, info_u(8), z)
    w[14] = xp.where(is_rad, info_u(9), z)
    if caps.get("_image_tap"):
        # Image-record rank (stream order): the fg-table row the
        # image-tap kernel wrote for this record (tpu/image_tap.py uses
        # the same predicate for its compaction, so ranks line up).
        tile32 = cmds["tile"].astype(xp.int32)
        P = is_img & (tile32 < caps["tile_grid_cap"]) & (tile32 >= 0)
        irank = (xp.cumsum(P.astype(xp.int32)) - 1).astype(xp.uint32)
        w[14] = xp.where(P, irank, w[14])
    w[15] = ramp_row

    return xp.stack(w, axis=1)  # [PC, 16] u32


def build_cmd_slab(xp, cmds, scene, info, caps, rec=None):
    """Scatter the dense records into the [GRID, MC, 16] u32 slab +
    per-tile counts (consumed by the per-tile interpreter kernel)."""
    GRID = caps["tile_grid_cap"]
    MC = caps["cmds_per_tile"]
    PC = cmds["tile"].shape[0]

    if rec is None:
        rec = build_records(xp, cmds, scene, info, caps)
    j = xp.arange(PC, dtype=xp.int32)
    tile = cmds["tile"]
    in_grid = tile < GRID
    start_of_tile = cmds["tile_start"][xp.clip(tile, 0, GRID - 1)]
    within = j - start_of_tile
    ok = in_grid & (within < MC)
    slot = xp.where(ok, xp.clip(tile, 0, GRID - 1) * MC + within, GRID * MC)

    slab = xp.zeros((GRID * MC + 1, 16), dtype=xp.uint32)
    slab = slab.at[slot].set(rec, mode="drop")
    slab = slab[: GRID * MC].reshape(GRID, MC, 16)

    counts = xp.clip(cmds["tile_end"] - cmds["tile_start"], 0, MC).astype(xp.int32)
    overflow = xp.any((cmds["tile_end"] - cmds["tile_start"]) > MC)
    return slab, counts, overflow


def _extend(t, mode):
    pad = jnp.clip(t, 0.0, 1.0)
    rep = t - jnp.floor(t)
    refl = jnp.abs(t - 2.0 * jnp.round(0.5 * t))
    return jnp.where(mode == 0, pad, jnp.where(mode == 1, rep, refl))


def make_fine_kernel(caps, img_shape=None, interpret=False, n_ramp_rows=1,
                     n_programs=None):
    """Per-tile interpreter kernel. Programs map to tiles through the
    prefetched tile_ids vector (identity for the full-grid path; a
    compacted legacy-tile list for the hybrid path, where the
    record-stream kernel handles every clip/image-free tile). A
    program whose tile id is >= GRID is a no-op pad."""
    GRID = caps["tile_grid_cap"]
    MC = caps["cmds_per_tile"]
    BD = caps["blend_depth"]
    MAX_STOPS = caps.get("max_stops", 2)
    # MSAA rows arrive fully resolved from the coverage kernel; area
    # rows are raw winding and take the per-record fill rule here.
    RESOLVED_COV = caps.get("aa_mode", "area") != "area"
    if n_programs is None:
        n_programs = GRID
    # Image region window: one 16x16 tile maps (under the inverse
    # transform) into at most REGH x (REGW-128) source texels for
    # scale factors down to ~0.25; stronger minification raises the
    # region-overflow flag and the frame falls back to the XLA fine.
    REGH, REGW = 64, 256

    def kernel(counts_smem, tile_ids_smem, scalars_smem, cmd_ref, rows_hbm,
               ramps_ref, img_ref,
               out_ref, ovf_ref, rgba, stack, area, area_dma, img_buf,
               img_ovf, sem):
        i = pl.program_id(0)
        t = tile_ids_smem[i]
        wit = counts_smem[counts_smem.shape[0] - 1]
        img_ovf[0] = 0
        base_r = scalars_smem[0]
        base_g = scalars_smem[1]
        base_b = scalars_smem[2]
        base_a = scalars_smem[3]

        p = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        lx = jnp.astype(p % 16, jnp.float32)
        ly = jnp.astype(p // 16, jnp.float32)
        tx = (t % wit) * 16
        ty = (t // wit) * 16
        gx = lx + jnp.astype(tx, jnp.float32)
        gy = ly + jnp.astype(ty, jnp.float32)

        rgba[0:1, :] = jnp.full((1, 256), base_r)
        rgba[1:2, :] = jnp.full((1, 256), base_g)
        rgba[2:3, :] = jnp.full((1, 256), base_b)
        rgba[3:4, :] = jnp.full((1, 256), base_a)

        n_cmds = counts_smem[i]

        def sample_ramp(ramp_id, tpos):
            """tpos (1,256) in [0,1] -> (4, 256) premultiplied color.

            Analytic stop evaluation (pipeline/gradient.py): the stop
            table row is read from the VMEM-resident table, the
            piecewise sRGB lerp and EOTF run as (1,256) vector ops —
            the TPU-native replacement for the reference's 512-texel
            ramp texture fetch (fine.wgsl:28)."""
            S = MAX_STOPS
            row = ramps_ref[pl.ds(jnp.clip(ramp_id, 0, n_ramp_rows - 1), 1), :]

            def stop_c(k, c):
                return row[0, 1 + S + 4 * k + c]

            acc = [jnp.full((1, 256), stop_c(0, c)) for c in range(4)]
            for k in range(S - 1):
                pk = row[0, 1 + k]
                dk = jnp.maximum(row[0, 1 + k + 1] - pk, 1e-9)
                u = jnp.clip((tpos - pk) / dk, 0.0, 1.0)
                for c in range(4):
                    acc[c] = acc[c] + (stop_c(k + 1, c) - stop_c(k, c)) * u

            def eotf(x):
                hi = jnp.exp(2.4 * jnp.log((x + 0.055) * (1.0 / 1.055)))
                return jnp.where(x <= 0.04045, x * (1.0 / 12.92), hi)

            a = acc[3]
            return jnp.concatenate(
                [eotf(acc[0]) * a, eotf(acc[1]) * a, eotf(acc[2]) * a, a],
                axis=0,
            )  # (4, 256)

        def blend_over_px(fg, a_cov):
            fa = fg[3:4, :] * a_cov
            rgba[...] = rgba[...] * (1.0 - fa) + fg * a_cov

        def body(ci, carry):
            clip_depth, blend_depth, zero_depth, ovf = carry
            rec_u = cmd_ref[0, pl.ds(ci, 1), :]  # (1, 16) u32
            rec_f = pltpu.bitcast(rec_u, jnp.float32)

            def ru(k):
                return rec_u[0, k]

            def rf(k):
                return rec_f[0, k]

            kind = ru(0).astype(jnp.int32)
            area_row = ru(1).astype(jnp.int32)
            seg_count_raw = ru(2).astype(jnp.int32)
            seg_count = jnp.maximum(seg_count_raw, 0)
            even_odd = (ru(4) & 1) != 0

            suppressed = zero_depth > 0
            is_fillish = (
                (kind == CMD_COLOR) | (kind == CMD_LIN_GRAD) | (kind == CMD_RAD_GRAD)
                | (kind == CMD_SWEEP_GRAD) | (kind == CMD_IMAGE) | (kind == CMD_END_CLIP)
            )

            @pl.when(~suppressed & is_fillish & (seg_count > 0))
            def _():
                # Rank rows live in a plain [AR+CH, 256] table; DMA the
                # aligned 8-row window containing the record's rank and
                # pick the row with a dynamic sublane slice.
                start8 = pl.multiple_of((area_row // 8) * 8, 8)
                dma = pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(start8, 8), :], area_dma, sem
                )
                dma.start()
                dma.wait()
                a = area_dma[pl.ds(area_row - start8, 1), :]  # (1, 256)
                if RESOLVED_COV:
                    area[...] = jnp.clip(a, 0.0, 1.0)
                else:
                    eo = jnp.abs(a - 2.0 * jnp.round(0.5 * a))
                    nz = jnp.minimum(jnp.abs(a), 1.0)
                    use_eo = even_odd & (kind != CMD_END_CLIP)
                    area[...] = jnp.where(use_eo, eo, nz)


            @pl.when(~suppressed & is_fillish & (seg_count == 0))
            def _():
                area[...] = jnp.ones((1, 256), jnp.float32)

            # ---- paints ----
            @pl.when(~suppressed & (kind == CMD_COLOR))
            def _():
                fg = jnp.concatenate([
                    jnp.full((1, 256), rf(5)), jnp.full((1, 256), rf(6)),
                    jnp.full((1, 256), rf(7)), jnp.full((1, 256), rf(8))], axis=0)
                blend_over_px(fg, area[...])

            @pl.when(~suppressed & (kind == CMD_LIN_GRAD))
            def _():
                ext = ru(5).astype(jnp.int32)
                dpos = rf(6) * gx + rf(7) * gy + rf(8)
                tpos = _extend(dpos, ext)
                fg = sample_ramp(ru(15).astype(jnp.int32), tpos)
                blend_over_px(fg, area[...])

            @pl.when(~suppressed & (kind == CMD_RAD_GRAD))
            def _():
                ext = ru(5).astype(jnp.int32)
                m0, m1, m2, m3 = rf(6), rf(7), rf(8), rf(9)
                xl, yl = rf(10), rf(11)
                focal_x = rf(12)
                radius = rf(13)
                kf = ru(14)
                rkind = (kf & 0x7).astype(jnp.int32)
                rflags = (kf >> 3).astype(jnp.int32)
                lxr = m0 * gx + m2 * gy + xl
                lyr = m1 * gx + m3 * gy + yl
                xx = lxr * lxr
                yy = lyr * lyr
                is_strip = rkind == RAD_GRAD_KIND_STRIP
                is_circ = rkind == RAD_GRAD_KIND_CIRCULAR
                is_foc = rkind == RAD_GRAD_KIND_FOCAL_ON_CIRCLE
                is_swapped = (rflags & RAD_GRAD_SWAPPED) != 0
                r1r = jnp.where(is_circ, 0.0, 1.0 / jnp.where(radius == 0, 1.0, radius))
                less_scale = jnp.where(is_swapped | ((1.0 - focal_x) < 0.0), -1.0, 1.0)
                t_sign = jnp.sign(1.0 - focal_x)
                a_s = radius - yy
                t_strip = jnp.sqrt(jnp.maximum(a_s, 0.0)) + lxr
                v_strip = a_s >= 0.0
                safe_x = jnp.where(lxr == 0.0, 1.0, lxr)
                t_foc = (xx + yy) / safe_x
                v_foc = (t_foc >= 0.0) & (lxr != 0.0)
                t_big = jnp.sqrt(xx + yy) - lxr * r1r
                a_c = xx - yy
                t_cone = less_scale * jnp.sqrt(jnp.maximum(a_c, 0.0)) - lxr * r1r
                v_cone = (a_c >= 0.0) & (t_cone >= 0.0)
                tr = jnp.where(is_strip, t_strip,
                               jnp.where(is_foc, t_foc,
                                         jnp.where(radius > 1.0, t_big, t_cone)))
                # boolean selects aren't legal on TPU vectors; use f32 masks
                vrf = jnp.where(
                    is_strip,
                    jnp.astype(v_strip, jnp.float32),
                    jnp.where(
                        is_foc,
                        jnp.astype(v_foc, jnp.float32),
                        jnp.where(radius > 1.0, 1.0, jnp.astype(v_cone, jnp.float32)),
                    ),
                )
                tr = _extend(focal_x + t_sign * tr, ext)
                tr = jnp.where(is_swapped, 1.0 - tr, tr)
                fg = sample_ramp(ru(15).astype(jnp.int32), tr)
                blend_over_px(fg * vrf, area[...] * vrf)

            @pl.when(~suppressed & (kind == CMD_SWEEP_GRAD))
            def _():
                ext = ru(5).astype(jnp.int32)
                m0, m1, m2, m3 = rf(6), rf(7), rf(8), rf(9)
                xl, yl = rf(10), rf(11)
                t0s, t1s = rf(12), rf(13)
                lxs = m0 * gx + m2 * gy + xl
                lys = m1 * gx + m3 * gy + yl
                xabs = jnp.abs(lxs)
                yabs = jnp.abs(lys)
                mx = jnp.maximum(xabs, yabs)
                slope = jnp.minimum(xabs, yabs) / jnp.where(mx == 0, 1.0, mx)
                s2 = slope * slope
                phi = slope * (
                    0.15912117063999176025390625
                    + s2 * (-5.185396969318389892578125e-2
                            + s2 * (2.476101927459239959716796875e-2
                                    + s2 * (-7.0547382347285747528076171875e-3))))
                phi = jnp.where(xabs < yabs, 0.25 - phi, phi)
                phi = jnp.where(lxs < 0.0, 0.5 - phi, phi)
                phi = jnp.where(lys < 0.0, 1.0 - phi, phi)
                phi = jnp.where(phi != phi, 0.0, phi)
                safe_dt = jnp.where(t1s == t0s, 1.0, t1s - t0s)
                phi = (phi - t0s) / safe_dt
                tpos = _extend(phi, ext)
                fg = sample_ramp(ru(15).astype(jnp.int32), tpos)
                blend_over_px(fg, area[...])

            if img_shape is not None:
                @pl.when(~suppressed & (kind == CMD_IMAGE))
                def _():
                    m0, m1, m2, m3 = rf(6), rf(7), rf(8), rf(9)
                    xl, yl = rf(10), rf(11)
                    axy = ru(12)
                    ax = (axy & 0xFFFF).astype(jnp.int32)
                    ay = (axy >> 16).astype(jnp.int32)
                    wh = ru(13)
                    # u32 -> f32 is not directly lowerable; go via i32.
                    iwi = (wh >> 16).astype(jnp.int32)
                    ihi = (wh & 0xFFFF).astype(jnp.int32)
                    iw = jnp.astype(iwi, jnp.float32)
                    ih = jnp.astype(ihi, jnp.float32)
                    AH, AW = img_shape
                    ux = m0 * gx + m2 * gy + xl
                    uy = m1 * gx + m3 * gy + yl
                    inb = (ux < iw) & (uy < ih) & (ux >= 0.0) & (uy >= 0.0)
                    x0f = jnp.floor(ux)
                    y0f = jnp.floor(uy)
                    fx = ux - x0f
                    fy = uy - y0f

                    def clampx(v):
                        return jnp.clip(v.astype(jnp.int32), 0, iwi - 1)

                    def clampy(v):
                        return jnp.clip(v.astype(jnp.int32), 0, ihi - 1)

                    # Atlas region touched by this tile (+bilinear
                    # margin), aligned for the DMA window.
                    rx0 = ax + jnp.min(clampx(x0f), axis=1, keepdims=True)[0, 0]
                    ry0 = ay + jnp.min(clampy(y0f), axis=1, keepdims=True)[0, 0]
                    rx1 = ax + jnp.max(clampx(jnp.ceil(ux)), axis=1,
                                       keepdims=True)[0, 0]
                    ry1 = ay + jnp.max(clampy(jnp.ceil(uy)), axis=1,
                                       keepdims=True)[0, 0]
                    x_lo = pl.multiple_of(
                        jnp.clip((rx0 // 128) * 128, 0, AW - REGW), 128)
                    y_lo = pl.multiple_of(
                        jnp.clip((ry0 // 8) * 8, 0, AH - REGH), 8)
                    region_bad = ((rx1 - x_lo) >= REGW) | ((ry1 - y_lo) >= REGH)

                    dma = pltpu.make_async_copy(
                        img_ref.at[:, pl.ds(y_lo, REGH), pl.ds(x_lo, REGW)],
                        img_buf, sem,
                    )
                    dma.start()
                    dma.wait()

                    iota_h = jax.lax.broadcasted_iota(jnp.int32, (REGH, 256), 0)
                    iota_w = jax.lax.broadcasted_iota(jnp.int32, (REGW, 256), 0)

                    # Atlas texels arrive premultiplied (atlas_planar:
                    # fine.wgsl applies premul_alpha to each
                    # textureLoad before bilinear mixing, so the mix is
                    # linear): fold the x weights into one column
                    # matmul per channel and the y weights into one
                    # row reduce.
                    lc0 = ax + clampx(x0f) - x_lo   # (1, 256)
                    lc1 = ax + clampx(jnp.ceil(ux)) - x_lo
                    lr0 = ay + clampy(y0f) - y_lo
                    lr1 = ay + clampy(jnp.ceil(uy)) - y_lo
                    ohc = (
                        jnp.astype(iota_w == lc0, jnp.float32) * (1 - fx)
                        + jnp.astype(iota_w == lc1, jnp.float32) * fx
                    )  # (REGW, 256)
                    wrow = (
                        jnp.astype(iota_h == lr0, jnp.float32) * (1 - fy)
                        + jnp.astype(iota_h == lr1, jnp.float32) * fy
                    )  # (REGH, 256)
                    ch4 = []
                    for chn in range(4):
                        m1c = jax.lax.dot_general(
                            img_buf[chn], ohc, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (REGH, 256)
                        ch4.append(jnp.sum(wrow * m1c, axis=0,
                                           keepdims=True))  # (1, 256)
                    fg = jnp.concatenate(ch4, axis=0)
                    okf = jnp.astype(inb & ~region_bad, jnp.float32)
                    blend_over_px(fg * okf, area[...] * okf)
                    img_ovf[0] = img_ovf[0] | region_bad.astype(jnp.int32)

            # ---- clips ----
            is_begin = kind == CMD_BEGIN_CLIP
            is_end = kind == CMD_END_CLIP
            begin_zero = is_begin & (seg_count_raw < 0)

            clip_depth_new = clip_depth + jnp.where(is_begin, 1, jnp.where(is_end, -1, 0))
            unsuppress = suppressed & is_end & (clip_depth == zero_depth)
            zero_depth = jnp.where(unsuppress, 0, zero_depth)
            start_sup = ~suppressed & begin_zero
            zero_depth = jnp.where(start_sup, clip_depth + 1, zero_depth)

            do_push = ~suppressed & is_begin & ~begin_zero
            ovf = ovf | (do_push & (blend_depth >= BD))
            bd_idx = jnp.clip(blend_depth, 0, BD - 1)

            @pl.when(do_push)
            def _():
                stack[pl.ds(bd_idx, 1), :, :] = rgba[...][None]
                rgba[...] = jnp.zeros((4, 256), jnp.float32)

            blend_depth = blend_depth + jnp.where(do_push, 1, 0)

            do_pop = ~suppressed & is_end
            blend_depth = blend_depth - jnp.where(do_pop, 1, 0)
            bd_idx2 = jnp.clip(blend_depth, 0, BD - 1)

            @pl.when(do_pop)
            def _():
                bg = stack[pl.ds(bd_idx2, 1), :, :][0]
                blend_word = ru(5).astype(jnp.int32)
                alpha = rf(6)
                a_cov = area[...] * alpha
                cur = rgba[...]
                fr, fgc, fb, fa = (cur[0:1] * a_cov, cur[1:2] * a_cov,
                                   cur[2:3] * a_cov, cur[3:4] * a_cov)
                rr, rg, rb, ra = bm.blend_mix_compose(
                    jnp,
                    (bg[0:1], bg[1:2], bg[2:3], bg[3:4]),
                    (fr, fgc, fb, fa),
                    blend_word,
                )
                rgba[...] = jnp.concatenate([rr, rg, rb, ra], axis=0)

            return (clip_depth_new, blend_depth, zero_depth, ovf)

        carry = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.bool_(False))
        carry = jax.lax.fori_loop(0, n_cmds, body, carry)
        # Bit 0: blend-stack depth overflow; bit 1: image region window
        # exceeded (host falls back to the XLA fine for the frame).
        ovf_ref[0] = jnp.full(
            (1, 128),
            jnp.astype(carry[3], jnp.int32) | (img_ovf[0] << 1),
        )

        cur = rgba[...]
        a_inv = 1.0 / jnp.maximum(cur[3:4, :], 1e-6)
        out_ref[0] = jnp.concatenate(
            [cur[0:1] * a_inv, cur[1:2] * a_inv, cur[2:3] * a_inv, cur[3:4]], axis=0
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # counts(+wit), tile_ids, base_color
        grid=(n_programs,),
        in_specs=[
            pl.BlockSpec((1, MC, 16), lambda t, c, i_, s: (t, 0, 0)),  # cmd slab
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # area rows
            # Whole stop table VMEM-resident (a few KB typical, ~2 MB max).
            pl.BlockSpec((n_ramp_rows, 128), lambda t, c, i_, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # images
        ],
        out_specs=(
            pl.BlockSpec((1, 4, 256), lambda t, c, i_, s: (t, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda t, c, i_, s: (t, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, 256), jnp.float32),      # rgba
            pltpu.VMEM((BD, 4, 256), jnp.float32),  # blend stack
            pltpu.VMEM((1, 256), jnp.float32),      # area
            pltpu.VMEM((8, 256), jnp.float32),      # area row DMA window
            pltpu.VMEM((4, REGH, REGW), jnp.float32),  # atlas region
            pltpu.SMEM((1,), jnp.int32),            # image region overflow
            pltpu.SemaphoreType.DMA,
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_programs, 4, 256), jnp.float32),
            jax.ShapeDtypeStruct((n_programs, 1, 128), jnp.int32),
        ),
        interpret=interpret,
    )


def make_fine_kernel_b8(caps, img_shape=None, interpret=False, n_ramp_rows=1,
                        n_programs=None):
    """Batched per-tile interpreter: EIGHT tiles per program in
    lockstep (VERDICT r4 item #2). The 1-tile kernel computes on
    (1, 256) / (4, 256) pixel planes — 1-2 of 8 VPU sublanes; here
    every plane is (8, 256) (tile-major) so the VPU runs full.

    The tape loop runs to the max count of the batch; per-record
    scalars become (8, 1) column slices of the batched record block,
    per-tile control state ((8, 1) vectors in the fori carry) replaces
    the scalar clip/suppression state, and the blend stack push/pop is
    a BD-unrolled masked select. Every branch (and every area-row
    DMA) is gated per ITERATION by scalar reads of the 8 record kinds,
    so a step only pays for the kinds it actually holds. Images keep
    the serial region-DMA path (per-tile pl.when) but apply their fg
    vectorized.

    Same call signature/returns as make_fine_kernel with n_programs a
    multiple of 8. Reference shape: fine.wgsl:814-883 (one 64-thread
    workgroup per tile; here one grid step per 8 tiles).
    """
    GRID = caps["tile_grid_cap"]
    MC = caps["cmds_per_tile"]
    BD = caps["blend_depth"]
    MAX_STOPS = caps.get("max_stops", 2)
    RESOLVED_COV = caps.get("aa_mode", "area") != "area"
    if n_programs is None:
        n_programs = GRID
    assert n_programs % 8 == 0, n_programs
    n_super = n_programs // 8
    REGH, REGW = 64, 256
    NT = 8

    def kernel(counts_smem, tile_ids_smem, scalars_smem,
               cmd_ref, rows_hbm, ramps_ref, img_ref,
               out_ref, ovf_ref, rgba, stack, area, area_dma, rrows,
               fgimg, okimg, ovfimg, img_buf, sems, sem_img):
        g = pl.program_id(0)
        wit = counts_smem[counts_smem.shape[0] - 1]

        # Per-tile pixel coordinates, tile-major (NT, 256).
        lx1 = jnp.astype(
            jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1) % 16,
            jnp.float32)
        ly1 = jnp.astype(
            jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1) // 16,
            jnp.float32)
        gxs, gys = [], []
        n_max = jnp.int32(0)
        for k in range(NT):
            t_k = tile_ids_smem[g * NT + k]
            gxs.append(lx1 + jnp.astype((t_k % wit) * 16, jnp.float32))
            gys.append(ly1 + jnp.astype((t_k // wit) * 16, jnp.float32))
            n_max = jnp.maximum(n_max, counts_smem[g * NT + k])
        gx = jnp.concatenate(gxs, axis=0)  # (NT, 256)
        gy = jnp.concatenate(gys, axis=0)

        for c in range(4):
            rgba[c] = jnp.full((NT, 256), scalars_smem[c])
        ovfimg[...] = jnp.zeros((NT, 128), jnp.int32)
        # Scratch starts as garbage; masked-out lanes must still read
        # FINITE values (mask * NaN = NaN), so zero the coverage plane.
        area[...] = jnp.zeros((NT, 256), jnp.float32)

        # Per-tile tape lengths as an (NT, 1) vector for the lockstep
        # masks (a tile whose tape ended idles masked).
        ncs = jnp.concatenate(
            [jnp.full((1, 1), counts_smem[g * NT + k], jnp.int32)
             for k in range(NT)], axis=0)  # (NT, 1)

        def sample_ramp_b8(tpos):
            """rrows: (NT, 128) stop-table rows; tpos (NT, 256) in
            [0,1] -> 4 x (NT, 256) premultiplied channels."""
            S = MAX_STOPS

            def stop_c(k, c):
                return rrows[:, 1 + S + 4 * k + c : 2 + S + 4 * k + c]

            acc = [jnp.broadcast_to(stop_c(0, c), (NT, 256))
                   for c in range(4)]
            for k in range(S - 1):
                pk = rrows[:, 1 + k : 2 + k]
                dk = jnp.maximum(rrows[:, 2 + k : 3 + k] - pk, 1e-9)
                u = jnp.clip((tpos - pk) / dk, 0.0, 1.0)
                for c in range(4):
                    acc[c] = acc[c] + (stop_c(k + 1, c) - stop_c(k, c)) * u

            def eotf(x):
                hi = jnp.exp(2.4 * jnp.log((x + 0.055) * (1.0 / 1.055)))
                return jnp.where(x <= 0.04045, x * (1.0 / 12.92), hi)

            a = acc[3]
            return [eotf(acc[0]) * a, eotf(acc[1]) * a, eotf(acc[2]) * a, a]

        def blend_over(fgs, a_cov, m):
            """src-over of fgs (4 x (NT,256)) with coverage a_cov where
            the (NT,1) bool mask m holds. where-based masking: rows of
            the batch whose record is a DIFFERENT kind carry garbage
            params (bitcast u32 can be NaN/Inf) and multiplicative
            masking would poison the whole row (NaN * 0 = NaN)."""
            cov = jnp.where(m, a_cov, 0.0)
            fa = jnp.where(m, fgs[3], 0.0) * cov
            for c in range(4):
                fgc = jnp.where(m, fgs[c], 0.0)
                rgba[c] = rgba[c] * (1.0 - fa) + fgc * cov

        def body(ci, carry):
            clip_depth, blend_depth, zero_depth, ovf = carry  # (NT,1) i32
            rec_u = cmd_ref[:, pl.ds(ci, 1), :][:, 0, :]   # (NT, 16) u32
            rec_f = pltpu.bitcast(rec_u, jnp.float32)
            AR_rows = rows_hbm.shape[0]

            def cu(k):
                return rec_u[:, k : k + 1]  # (NT, 1) u32

            def cf(k):
                return rec_f[:, k : k + 1]  # (NT, 1) f32

            live = ci < ncs
            kind = jnp.where(live, cu(0).astype(jnp.int32), -1)
            seg_raw = cu(2).astype(jnp.int32)
            seg_pos = jnp.maximum(seg_raw, 0)
            even_odd = (cu(4) & 1) != 0

            sup = zero_depth > 0
            fillish = (
                (kind == CMD_COLOR) | (kind == CMD_LIN_GRAD)
                | (kind == CMD_RAD_GRAD) | (kind == CMD_SWEEP_GRAD)
                | (kind == CMD_IMAGE) | (kind == CMD_END_CLIP)
            )

            # Per-ITERATION scalar kind reads: gate every branch (and
            # every area DMA) by what this lockstep step actually
            # holds — a clip-heavy tape must not pay gradient code,
            # and clip records must not pay row DMAs (the first b8
            # build DMA'd 8 windows unconditionally per step and
            # measured SLOWER than the 1-tile kernel on config4).
            kscal = [cmd_ref[k, ci, 0].astype(jnp.int32) for k in range(NT)]
            segscal = [cmd_ref[k, ci, 2].astype(jnp.int32) for k in range(NT)]

            def anyk(*kcs):
                p = None
                for kk in kscal:
                    for kc in kcs:
                        q = kk == kc
                        p = q if p is None else (p | q)
                return p

            def is_fill_scal(kk):
                return (
                    (kk == CMD_COLOR) | (kk == CMD_LIN_GRAD)
                    | (kk == CMD_RAD_GRAD) | (kk == CMD_SWEEP_GRAD)
                    | (kk == CMD_IMAGE) | (kk == CMD_END_CLIP)
                )

            # Area rows: per-tile 8-row window DMAs, issued only for
            # records that consume coverage, all in flight together.
            starts8 = []
            for k in range(NT):
                ar_k = jnp.clip(
                    cmd_ref[k, ci, 1].astype(jnp.int32), 0, AR_rows - 1
                )
                s8 = pl.multiple_of(
                    jnp.minimum((ar_k // 8) * 8, AR_rows - 8), 8
                )
                need = is_fill_scal(kscal[k]) & (segscal[k] > 0)
                starts8.append((ar_k, s8, need))

                @pl.when(need)
                def _(k=k, s8=s8):
                    pltpu.make_async_copy(
                        rows_hbm.at[pl.ds(s8, 8), :], area_dma.at[k],
                        sems.at[k],
                    ).start()
            rows_now = []
            for k in range(NT):
                ar_k, s8, need = starts8[k]

                @pl.when(need)
                def _(k=k, s8=s8):
                    pltpu.make_async_copy(
                        rows_hbm.at[pl.ds(s8, 8), :], area_dma.at[k],
                        sems.at[k],
                    ).wait()
                # Stale rows for un-DMA'd tiles are harmless: the area
                # update below selects them away with where().
                rows_now.append(area_dma[k, pl.ds(ar_k - s8, 1), :])
            a_raw = jnp.concatenate(rows_now, axis=0)  # (NT, 256)

            if RESOLVED_COV:
                cov = jnp.clip(a_raw, 0.0, 1.0)
            else:
                eo = jnp.abs(a_raw - 2.0 * jnp.round(0.5 * a_raw))
                nz = jnp.minimum(jnp.abs(a_raw), 1.0)
                use_eo = even_odd & (kind != CMD_END_CLIP)
                cov = jnp.where(use_eo, eo, nz)
            set_cov = ~sup & fillish & (seg_pos > 0)
            set_one = ~sup & fillish & (seg_raw == 0)
            area[...] = jnp.where(
                set_cov, cov, jnp.where(set_one, 1.0, area[...])
            )

            # ---- paints (per-iteration scalar kind guards) ----
            @pl.when(anyk(CMD_COLOR))
            def _():
                m = ~sup & (kind == CMD_COLOR)
                fgs = [jnp.broadcast_to(cf(5 + c), (NT, 256))
                       for c in range(4)]
                blend_over(fgs, area[...], m)

            def load_ramp_rows():
                for k in range(NT):
                    rid = jnp.clip(
                        cmd_ref[k, ci, 15].astype(jnp.int32), 0,
                        n_ramp_rows - 1)
                    rrows[pl.ds(k, 1), :] = ramps_ref[pl.ds(rid, 1), :]

            @pl.when(anyk(CMD_LIN_GRAD))
            def _():
                load_ramp_rows()
                m = ~sup & (kind == CMD_LIN_GRAD)
                ext = cu(5).astype(jnp.int32)
                dpos = cf(6) * gx + cf(7) * gy + cf(8)
                fgs = sample_ramp_b8(_extend(dpos, ext))
                blend_over(fgs, area[...], m)

            @pl.when(anyk(CMD_RAD_GRAD))
            def _():
                load_ramp_rows()
                m0, m1, m2, m3 = cf(6), cf(7), cf(8), cf(9)
                xl, yl = cf(10), cf(11)
                focal_x = cf(12)
                radius = cf(13)
                kf = cu(14)
                rkind = (kf & 0x7).astype(jnp.int32)
                rflags = (kf >> 3).astype(jnp.int32)
                ext = cu(5).astype(jnp.int32)
                lxr = m0 * gx + m2 * gy + xl
                lyr = m1 * gx + m3 * gy + yl
                xx = lxr * lxr
                yy = lyr * lyr
                is_strip = rkind == RAD_GRAD_KIND_STRIP
                is_circ = rkind == RAD_GRAD_KIND_CIRCULAR
                is_foc = rkind == RAD_GRAD_KIND_FOCAL_ON_CIRCLE
                is_swapped = (rflags & RAD_GRAD_SWAPPED) != 0
                r1r = jnp.where(
                    is_circ, 0.0,
                    1.0 / jnp.where(radius == 0, 1.0, radius))
                less_scale = jnp.where(
                    is_swapped | ((1.0 - focal_x) < 0.0), -1.0, 1.0)
                t_sign = jnp.sign(1.0 - focal_x)
                a_s = radius - yy
                t_strip = jnp.sqrt(jnp.maximum(a_s, 0.0)) + lxr
                v_strip = a_s >= 0.0
                safe_x = jnp.where(lxr == 0.0, 1.0, lxr)
                t_foc = (xx + yy) / safe_x
                v_foc = (t_foc >= 0.0) & (lxr != 0.0)
                t_big = jnp.sqrt(xx + yy) - lxr * r1r
                a_c = xx - yy
                t_cone = less_scale * jnp.sqrt(jnp.maximum(a_c, 0.0)) - lxr * r1r
                v_cone = (a_c >= 0.0) & (t_cone >= 0.0)
                tr = jnp.where(is_strip, t_strip,
                               jnp.where(is_foc, t_foc,
                                         jnp.where(radius > 1.0, t_big,
                                                   t_cone)))
                vrf = jnp.where(
                    is_strip,
                    jnp.astype(v_strip, jnp.float32),
                    jnp.where(
                        is_foc,
                        jnp.astype(v_foc, jnp.float32),
                        jnp.where(radius > 1.0, 1.0,
                                  jnp.astype(v_cone, jnp.float32)),
                    ),
                )
                tr = _extend(focal_x + t_sign * tr, ext)
                tr = jnp.where(is_swapped, 1.0 - tr, tr)
                fgs = sample_ramp_b8(tr)
                m = ~sup & (kind == CMD_RAD_GRAD)
                blend_over([f * vrf for f in fgs], area[...] * vrf, m)

            @pl.when(anyk(CMD_SWEEP_GRAD))
            def _():
                load_ramp_rows()
                m0, m1, m2, m3 = cf(6), cf(7), cf(8), cf(9)
                xl, yl = cf(10), cf(11)
                t0s, t1s = cf(12), cf(13)
                ext = cu(5).astype(jnp.int32)
                lxs = m0 * gx + m2 * gy + xl
                lys = m1 * gx + m3 * gy + yl
                xabs = jnp.abs(lxs)
                yabs = jnp.abs(lys)
                mx = jnp.maximum(xabs, yabs)
                slope = jnp.minimum(xabs, yabs) / jnp.where(mx == 0, 1.0, mx)
                s2 = slope * slope
                phi = slope * (
                    0.15912117063999176025390625
                    + s2 * (-5.185396969318389892578125e-2
                            + s2 * (2.476101927459239959716796875e-2
                                    + s2 * (-7.0547382347285747528076171875e-3))))
                phi = jnp.where(xabs < yabs, 0.25 - phi, phi)
                phi = jnp.where(lxs < 0.0, 0.5 - phi, phi)
                phi = jnp.where(lys < 0.0, 1.0 - phi, phi)
                phi = jnp.where(phi != phi, 0.0, phi)
                safe_dt = jnp.where(t1s == t0s, 1.0, t1s - t0s)
                phi = (phi - t0s) / safe_dt
                fgs = sample_ramp_b8(_extend(phi, ext))
                m = ~sup & (kind == CMD_SWEEP_GRAD)
                blend_over(fgs, area[...], m)

            if img_shape is not None:
                @pl.when(anyk(CMD_IMAGE))
                def _():
                    for c in range(4):
                        fgimg[c] = jnp.zeros((NT, 256), jnp.float32)
                    okimg[...] = jnp.zeros((NT, 256), jnp.float32)
                    for k in range(NT):
                        @pl.when(cmd_ref[k, ci, 0].astype(jnp.int32)
                                 == CMD_IMAGE)
                        def _(k=k):
                            gx1 = gx[k:k + 1, :]
                            gy1 = gy[k:k + 1, :]
                            rec1 = cmd_ref[k, pl.ds(ci, 1), :]  # (1,16)
                            rec1f = pltpu.bitcast(rec1, jnp.float32)
                            m0, m1 = rec1f[0, 6], rec1f[0, 7]
                            m2, m3 = rec1f[0, 8], rec1f[0, 9]
                            xl, yl = rec1f[0, 10], rec1f[0, 11]
                            axy = rec1[0, 12]
                            ax = (axy & 0xFFFF).astype(jnp.int32)
                            ay = (axy >> 16).astype(jnp.int32)
                            wh = rec1[0, 13]
                            iwi = (wh >> 16).astype(jnp.int32)
                            ihi = (wh & 0xFFFF).astype(jnp.int32)
                            iw = jnp.astype(iwi, jnp.float32)
                            ih = jnp.astype(ihi, jnp.float32)
                            AH, AW = img_shape
                            ux = m0 * gx1 + m2 * gy1 + xl
                            uy = m1 * gx1 + m3 * gy1 + yl
                            inb = (ux < iw) & (uy < ih) & (ux >= 0.0) & (uy >= 0.0)
                            x0f = jnp.floor(ux)
                            y0f = jnp.floor(uy)
                            fx = ux - x0f
                            fy = uy - y0f

                            def clampx(v):
                                return jnp.clip(v.astype(jnp.int32), 0, iwi - 1)

                            def clampy(v):
                                return jnp.clip(v.astype(jnp.int32), 0, ihi - 1)

                            rx0 = ax + jnp.min(clampx(x0f), axis=1,
                                               keepdims=True)[0, 0]
                            ry0 = ay + jnp.min(clampy(y0f), axis=1,
                                               keepdims=True)[0, 0]
                            rx1 = ax + jnp.max(clampx(jnp.ceil(ux)), axis=1,
                                               keepdims=True)[0, 0]
                            ry1 = ay + jnp.max(clampy(jnp.ceil(uy)), axis=1,
                                               keepdims=True)[0, 0]
                            x_lo = pl.multiple_of(
                                jnp.clip((rx0 // 128) * 128, 0, AW - REGW), 128)
                            y_lo = pl.multiple_of(
                                jnp.clip((ry0 // 8) * 8, 0, AH - REGH), 8)
                            region_bad = ((rx1 - x_lo) >= REGW) | ((ry1 - y_lo) >= REGH)

                            dma = pltpu.make_async_copy(
                                img_ref.at[:, pl.ds(y_lo, REGH),
                                           pl.ds(x_lo, REGW)],
                                img_buf, sem_img,
                            )
                            dma.start()
                            dma.wait()

                            iota_h = jax.lax.broadcasted_iota(
                                jnp.int32, (REGH, 256), 0)
                            iota_w = jax.lax.broadcasted_iota(
                                jnp.int32, (REGW, 256), 0)
                            lc0 = ax + clampx(x0f) - x_lo
                            lc1 = ax + clampx(jnp.ceil(ux)) - x_lo
                            lr0 = ay + clampy(y0f) - y_lo
                            lr1 = ay + clampy(jnp.ceil(uy)) - y_lo
                            ohc = (
                                jnp.astype(iota_w == lc0, jnp.float32) * (1 - fx)
                                + jnp.astype(iota_w == lc1, jnp.float32) * fx
                            )
                            wrow = (
                                jnp.astype(iota_h == lr0, jnp.float32) * (1 - fy)
                                + jnp.astype(iota_h == lr1, jnp.float32) * fy
                            )
                            okf = jnp.astype(inb & ~region_bad, jnp.float32)
                            for chn in range(4):
                                m1c = jax.lax.dot_general(
                                    img_buf[chn], ohc, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                )
                                fgimg[chn, pl.ds(k, 1), :] = jnp.sum(
                                    wrow * m1c, axis=0, keepdims=True)
                            okimg[pl.ds(k, 1), :] = okf
                            ovfimg[pl.ds(k, 1), :] = jnp.full(
                                (1, 128), region_bad.astype(jnp.int32)
                            ) | ovfimg[pl.ds(k, 1), :]
                    m = ~sup & (kind == CMD_IMAGE)
                    ok = okimg[...]
                    blend_over([fgimg[c] * ok for c in range(4)],
                               area[...] * ok, m)

            # ---- clips (vectorized stack ops) ----
            is_begin = kind == CMD_BEGIN_CLIP
            is_end = kind == CMD_END_CLIP
            begin_zero = is_begin & (seg_raw < 0)

            clip_depth_new = clip_depth + jnp.where(
                is_begin, 1, jnp.where(is_end, -1, 0))
            unsuppress = sup & is_end & (clip_depth == zero_depth)
            zero_depth = jnp.where(unsuppress, 0, zero_depth)
            start_sup = ~sup & begin_zero
            zero_depth = jnp.where(start_sup, clip_depth + 1, zero_depth)

            do_push = ~sup & is_begin & ~begin_zero
            ovf = ovf | (do_push & (blend_depth >= BD)).astype(jnp.int32)
            bd_idx = jnp.clip(blend_depth, 0, BD - 1)
            do_pop = ~sup & is_end
            blend_depth_pop = blend_depth - jnp.where(do_pop, 1, 0)
            bd_idx2 = jnp.clip(blend_depth_pop, 0, BD - 1)

            @pl.when(anyk(CMD_BEGIN_CLIP, CMD_END_CLIP))
            def _():
                # where-based stack ops: unpushed stack rows are
                # garbage scratch; select, never multiply.
                for dd in range(BD):
                    at_d = do_push & (bd_idx == dd)
                    for c in range(4):
                        stack[dd, c] = jnp.where(at_d, rgba[c], stack[dd, c])
                for c in range(4):
                    rgba[c] = jnp.where(do_push, 0.0, rgba[c])

                # Pop: gather the per-tile stack rows at bd_idx2, blend.
                bg = [jnp.zeros((NT, 256), jnp.float32) for _ in range(4)]
                for dd in range(BD):
                    at_d = do_pop & (bd_idx2 == dd)
                    for c in range(4):
                        bg[c] = jnp.where(at_d, stack[dd, c], bg[c])
                blend_word = cu(5).astype(jnp.int32)
                alpha = cf(6)
                a_cov = area[...] * alpha
                fr = rgba[0] * a_cov
                fgc = rgba[1] * a_cov
                fb = rgba[2] * a_cov
                fa = rgba[3] * a_cov
                rr, rg, rb, ra = bm.blend_mix_compose(
                    jnp, (bg[0], bg[1], bg[2], bg[3]), (fr, fgc, fb, fa),
                    blend_word,
                )
                for c, v in enumerate((rr, rg, rb, ra)):
                    rgba[c] = jnp.where(do_pop, v, rgba[c])

            blend_depth = jnp.where(
                do_push, blend_depth + 1, blend_depth_pop)
            return (clip_depth_new, blend_depth, zero_depth, ovf)

        zero8 = jnp.zeros((NT, 1), jnp.int32)
        carry = (zero8, zero8, zero8, zero8)
        carry = jax.lax.fori_loop(0, n_max, body, carry)

        ovf_ref[...] = jnp.broadcast_to(
            carry[3].astype(jnp.int32), (NT, 128)
        ) | (ovfimg[...] << 1)

        a_inv = 1.0 / jnp.maximum(rgba[3], 1e-6)
        for c in range(3):
            out_ref[:, c, :] = rgba[c] * a_inv
        out_ref[:, 3, :] = rgba[3]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # counts(+wit), tile_ids, base_color
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec((NT, MC, 16),
                         lambda t, c, i_, s: (t, 0, 0)),  # cmd slab
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # area rows
            pl.BlockSpec((n_ramp_rows, 128), lambda t, c, i_, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # images
        ],
        out_specs=(
            pl.BlockSpec((NT, 4, 256), lambda t, c, i_, s: (t, 0, 0)),
            pl.BlockSpec((NT, 128), lambda t, c, i_, s: (t, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, NT, 256), jnp.float32),       # rgba (ch-major)
            pltpu.VMEM((BD, 4, NT, 256), jnp.float32),   # blend stack
            pltpu.VMEM((NT, 256), jnp.float32),          # area
            pltpu.VMEM((NT, 8, 256), jnp.float32),       # area row windows
            pltpu.VMEM((NT, 128), jnp.float32),          # ramp rows
            pltpu.VMEM((4, NT, 256), jnp.float32),       # image fg
            pltpu.VMEM((NT, 256), jnp.float32),          # image ok
            pltpu.VMEM((NT, 128), jnp.int32),            # image region ovf
            pltpu.VMEM((4, REGH, REGW), jnp.float32),    # atlas region
            pltpu.SemaphoreType.DMA((NT,)),
            pltpu.SemaphoreType.DMA,
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_programs, 4, 256), jnp.float32),
            jax.ShapeDtypeStruct((n_programs, 128), jnp.int32),
        ),
        interpret=interpret,
    )

    def run(counts, tile_ids, scalars, slab, rows, stops, img):
        out, ovf = call(counts, tile_ids, scalars, slab, rows, stops, img)
        return out, ovf.reshape(n_programs, 1, 128)

    return run


def atlas_planar(images):
    """[AH, AW, 4] atlas plane -> channel-planar [4, AHp, AWp] padded to
    at least one region window (fine kernel DMA source).

    Stored PREMULTIPLIED: fine.wgsl premultiplies each textureLoad
    before bilinear mixing, so with premultiplied texels the whole
    bilinear tap is linear — one x-weighted column matmul + one
    y-weighted row reduce per channel instead of four taps.

    Padded by one extra region window in each axis so the image-tap
    kernel's multi-window sweep (minified images, tpu/image_tap.py) can
    step unclipped REGH x REGW windows from any aligned origin without
    reading out of bounds."""
    if images is None:
        return jnp.zeros((4, 64, 256), dtype=jnp.float32), None
    AH, AW = int(images.shape[0]), int(images.shape[1])
    AHp = -(-max(AH, 64) // 8) * 8 + 64
    AWp = -(-max(AW, 256) // 128) * 128 + 256
    pm = jnp.concatenate(
        [images[..., :3] * images[..., 3:4], images[..., 3:4]], axis=-1
    )
    planar = jnp.zeros((4, AHp, AWp), dtype=jnp.float32)
    planar = planar.at[:, :AH, :AW].set(jnp.transpose(pm, (2, 0, 1)))
    return planar, (AHp, AWp)


def fine_pallas(scene, cmds, segs, counted, info, ramps, images, layout, caps, interpret=False):
    """Drop-in replacement for fine_ref.fine (jnp), Pallas-accelerated.

    Returns (fine_out [4, GRID, 256], flags dict)."""
    caps = dict(caps)
    caps.setdefault("cmds_per_tile", 64)
    caps.setdefault("area_rows_cap", 1 << 14)

    area_blk, area_row_rec, rows_overflow = compute_area_rows(
        jnp, cmds, counted, caps
    )
    cmds = dict(cmds)
    cmds["area_row"] = area_row_rec
    slab, counts, slab_overflow = build_cmd_slab(jnp, cmds, scene, info, caps)

    # Stop table rows (pipeline/gradient.py layout), lane-padded.
    NR, W = ramps.shape[0], ramps.shape[1]
    caps["max_stops"] = (W - 1) // 5
    stops_pad = jnp.zeros((NR, 128), dtype=jnp.float32)
    stops_pad = stops_pad.at[:, :W].set(ramps)
    img_flat, img_shape = atlas_planar(images)

    counts = jnp.concatenate(
        [counts, jnp.asarray(layout["width_in_tiles"], dtype=jnp.int32).reshape(1)]
    )
    scalars = jnp.asarray(layout["base_color"], dtype=jnp.float32)
    tile_ids = jnp.arange(caps["tile_grid_cap"], dtype=jnp.int32)

    if caps.get("_interp_batch", False) and caps["tile_grid_cap"] % 8 == 0:
        call = make_fine_kernel_b8(caps, img_shape, interpret=interpret,
                                   n_ramp_rows=NR)
        out, ovf = call(counts, tile_ids, scalars, slab, area_blk,
                        stops_pad, img_flat)
    else:
        call = make_fine_kernel(caps, img_shape, interpret=interpret,
                                n_ramp_rows=NR)
        out, ovf = call(counts, tile_ids, scalars, slab, area_blk,
                        stops_pad, img_flat)
    fine_out = jnp.transpose(out, (1, 0, 2))  # [4, GRID, 256]
    flags = {
        "cmd_slab_overflow": slab_overflow,
        "area_rows_overflow": rows_overflow,
        "blend_depth_overflow": jnp.any((ovf & 1) > 0),
        "image_region_overflow": jnp.any((ovf & 2) > 0),
    }
    return fine_out, flags
