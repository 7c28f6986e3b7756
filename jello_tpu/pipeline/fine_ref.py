"""Fine rasterization, reference implementation (reference: fine.wgsl).

Analytic-area antialiasing, full brush set, clip/blend stack. This is
the xp-generic implementation: under numpy it is the oracle for the
Pallas fine kernel (the reference ships *no* CPU port of fine —
engine/wgpu_engine/lib.go:73-78 — so this implementation is derived
directly from fine.wgsl:824-878 fill math and the command interpreter
at fine.wgsl:883-1102); under jax.numpy it doubles as a debug path.

Layout: pixel state is [4, GRID, 256] (channel, tile, pixel) where
pixel p = local_y * 16 + local_x. The per-tile command tape is the
sorted command SoA from coarse.py. The clip-zero suppression state
machine of coarse.wgsl runs here per tile, vectorized across tiles.
"""

from __future__ import annotations

import numpy as _np

from .. import blend_math as bm
from . import ops
from .coarse import (
    CMD_BEGIN_CLIP,
    CMD_COLOR,
    CMD_END_CLIP,
    CMD_IMAGE,
    CMD_LIN_GRAD,
    CMD_RAD_GRAD,
    CMD_SWEEP_GRAD,
)
from .drawobjs import (
    RAD_GRAD_KIND_CIRCULAR,
    RAD_GRAD_KIND_FOCAL_ON_CIRCLE,
    RAD_GRAD_KIND_STRIP,
    RAD_GRAD_SWAPPED,
)

GRADIENT_WIDTH = 512
EXTEND_PAD = 0
EXTEND_REPEAT = 1
EXTEND_REFLECT = 2


def _extend_mode(xp, t, mode):
    pad = xp.clip(t, 0.0, 1.0)
    rep = t - xp.floor(t)
    refl = xp.abs(t - 2.0 * xp.round(0.5 * t))
    return xp.where(mode == EXTEND_PAD, pad, xp.where(mode == EXTEND_REPEAT, rep, refl))


def sample_offsets(aa: str):
    """Subpixel sample positions for MSAA modes (the sample patterns of
    renderer/mask.go: rotated-grid 8x and the D3D11 16x pattern)."""
    from ..renderer.mask import _MASK16_PATTERN, _MASK8_PATTERN

    if aa == "msaa8":
        pat, n = _MASK8_PATTERN, 8
    elif aa == "msaa16":
        pat, n = _MASK16_PATTERN, 16
    else:
        return None
    offs = [((pat[i] + 0.5) / n, (i + 0.5) / n) for i in range(n)]
    return offs


def _seg_winding(xp, sx0, sy0, sx1, sy1, sye, xs, ys):
    """Exact winding contribution of one segment at a sample point
    (the zero-width limit of the analytic area math: crossings counted
    to the right, plus the tile-left-edge y_edge term)."""
    dy = sy1 - sy0
    covered = (sy0 <= ys) != (sy1 <= ys)
    safe_dy = xp.where(dy == 0.0, xp.float32(1.0), dy)
    t = (ys - sy0) / safe_dy
    xi = sx0 + t * (sx1 - sx0)
    # The analytic area formula accumulates crossings to the LEFT of the
    # sample (segments left of the pixel contribute their full height).
    w = xp.where(covered & (xi < xs), -xp.sign(dy), 0.0)
    w = w + xp.sign(sx1 - sx0) * (ys >= sye)
    return w


def _fill_area(xp, seg_start, seg_count, backdrop, even_odd, segs, px, py, caps):
    """Coverage per pixel for one fill command across all tiles.

    seg_start/seg_count/backdrop: [G] per-tile command fields.
    px, py: [256] local pixel coordinates.
    Returns area [G, 256]. AA mode from caps["aa_mode"] ("area" default,
    "msaa8"/"msaa16" for exact per-sample multisampling).
    """
    G = seg_start.shape[0]
    f32 = xp.float32
    aa = caps.get("aa_mode", "area")
    offsets = sample_offsets(aa)
    S = 1 if offsets is None else len(offsets)
    area = xp.broadcast_to(
        backdrop.astype(f32)[:, None, None], (G, S, 256)
    ).astype(f32)
    max_segs = xp.max(seg_count)

    CH = caps.get("fine_seg_chunk", 8)

    def chunk_body(c, area):
        base = seg_start + c * CH
        k = xp.arange(CH, dtype=xp.int32)[None, :]
        idx = base[:, None] + k
        valid = k < (seg_count[:, None] - c * CH)
        gi = xp.clip(idx, 0, segs["seg_x0"].shape[0] - 1)
        sx0 = segs["seg_x0"][gi]
        sy0 = segs["seg_y0"][gi]
        sx1 = segs["seg_x1"][gi]
        sy1 = segs["seg_y1"][gi]
        sye = segs["seg_y_edge"][gi]
        if offsets is None:
            # Analytic area (fine.wgsl:824-864). [G, CH, 1] vs [1, 1, 256].
            dx = (sx1 - sx0)[:, :, None]
            dy = (sy1 - sy0)[:, :, None]
            y = sy0[:, :, None] - py[None, None, :]
            y0c = xp.clip(y, 0.0, 1.0)
            y1c = xp.clip(y + dy, 0.0, 1.0)
            dyc = y0c - y1c
            safe_dy = xp.where(dy == 0.0, f32(1.0), dy)
            vy_recip = 1.0 / safe_dy
            t0 = (y0c - y) * vy_recip
            t1 = (y1c - y) * vy_recip
            startx = sx0[:, :, None] - px[None, None, :]
            x0 = startx + t0 * dx
            x1 = startx + t1 * dx
            xmin0 = xp.minimum(x0, x1)
            xmax0 = xp.maximum(x0, x1)
            xmin = xp.minimum(xmin0, 1.0) - 1.0e-6
            b = xp.minimum(xmax0, 1.0)
            c_ = xp.maximum(b, 0.0)
            d = xp.maximum(xmin, 0.0)
            denom = xmax0 - xmin
            a = (b + 0.5 * (d * d - c_ * c_) - xmin) / denom
            contrib = xp.where(dyc != 0.0, a * dyc, 0.0)
            y_edge = xp.sign(dx) * xp.clip(
                py[None, None, :] - sye[:, :, None] + 1.0, 0.0, 1.0
            )
            contrib = contrib + y_edge
            contrib = xp.where(valid[:, :, None], contrib, 0.0)
            return area + xp.sum(contrib, axis=1)[:, None, :]
        # Per-sample winding.
        new = area
        for si, (ox, oy) in enumerate(offsets):
            xs = (px + ox)[None, None, :]
            ys = (py + oy)[None, None, :]
            w = _seg_winding(
                xp,
                sx0[:, :, None], sy0[:, :, None], sx1[:, :, None],
                sy1[:, :, None], sye[:, :, None], xs, ys,
            )
            w = xp.where(valid[:, :, None], w, 0.0)
            new = new.at[:, si, :].add(xp.sum(w, axis=1)) if ops.is_jax(xp) else _np_add_slice(new, si, xp.sum(w, axis=1))
        return new

    n_chunks = (max_segs + CH - 1) // CH
    area = ops.fori(xp, n_chunks, chunk_body, area)

    if offsets is not None:
        # Per-sample integer winding -> fill rule -> coverage fraction.
        wi = xp.round(area).astype(xp.int32)
        inside = xp.where(even_odd[:, None, None], (wi & 1) != 0, wi != 0)
        return xp.mean(inside.astype(f32), axis=1)
    a = area[:, 0, :]
    eo = xp.abs(a - 2.0 * xp.round(0.5 * a))
    nz = xp.minimum(xp.abs(a), 1.0)
    return xp.where(even_odd[:, None], eo, nz)


def _np_add_slice(arr, si, v):
    arr = arr.copy()
    arr[:, si, :] += v
    return arr


def _blend_over(xp, rgba, fg, area):
    """rgba = rgba * (1 - fg.a * area) + fg * area, channelwise.

    rgba: [4, G, 256]; fg: [4, G, 256] or broadcastable; area [G, 256]."""
    fa = fg[3] * area
    return xp.stack([rgba[i] * (1.0 - fa) + fg[i] * area for i in range(4)])


def _sample_ramp(xp, ramps, ramp_idx, t):
    """ramps: stop-table rows [NR, W] (pipeline/gradient.py layout);
    ramp_idx: [G]; t: [G, 256] in [0,1]. Returns [4, G, 256] premul."""
    from .gradient import sample_stops

    rows = ramps[xp.clip(ramp_idx, 0, ramps.shape[0] - 1)]  # [G, W]
    return sample_stops(xp, rows, t)


def fine(xp, scene, cmds, segs, info, ramps, images, layout, caps, tile_base=0):
    """Interpret per-tile command tapes into the final image.

    `tile_base` offsets the global tile ids — nonzero when the tile grid
    is sharded across devices and this call renders one stripe (the
    cmds["tile_start"]/["tile_end"] arrays are then the local shard).

    Returns (rgba image [H, W, 4] float32 non-premultiplied, overflow).
    """
    BD = caps["blend_depth"]
    f32 = xp.float32
    wit = layout["width_in_tiles"]
    base = layout["base_color"]  # [4] premultiplied linear f32
    GRID = cmds["tile_start"].shape[0]

    p = xp.arange(256, dtype=xp.int32)
    lx = (p % 16).astype(f32)
    ly = (p // 16).astype(f32)
    t_ids = xp.arange(GRID, dtype=xp.int32) + tile_base
    tile_x0 = ((t_ids % wit) * 16).astype(f32)
    tile_y0 = ((t_ids // wit) * 16).astype(f32)
    gx = tile_x0[:, None] + lx[None, :]  # [G, 256] global pixel x
    gy = tile_y0[:, None] + ly[None, :]

    rgba = xp.broadcast_to(
        xp.asarray(base, dtype=f32)[:, None, None], (4, GRID, 256)
    ) * xp.ones((4, GRID, 256), dtype=f32)
    stack = xp.zeros((BD, 4, GRID, 256), dtype=f32)
    area = xp.zeros((GRID, 256), dtype=f32)
    clip_depth = xp.zeros(GRID, dtype=xp.int32)
    blend_depth = xp.zeros(GRID, dtype=xp.int32)
    zero_depth = xp.zeros(GRID, dtype=xp.int32)
    depth_overflow = xp.zeros((), dtype=bool)

    start = cmds["tile_start"][:GRID]
    end = cmds["tile_end"][:GRID]
    n_slots = xp.max(end - start)

    def slot_body(s, state):
        rgba, stack, clip_depth, blend_depth, zero_depth, depth_overflow = state
        ci = xp.clip(start + s, 0, cmds["kind"].shape[0] - 1)
        active = (start + s) < end
        kind = xp.where(active, cmds["kind"][ci], 0)
        seg_count = cmds["seg_count"][ci]
        seg_start_ = cmds["seg_start"][ci]
        backdrop = cmds["backdrop"][ci]
        flags = cmds["flags"][ci]
        # One per-draw word-table row gather (scene[dd+0..3] + info
        # words 1..9, built in render_frame) replaces the ~15 dd/di
        # element gathers of the per-word formulation.
        drow = ops.gather_guarded(xp, cmds["dtab"], cmds["draw"][ci])

        suppressed = zero_depth > 0
        run = active & ~suppressed

        # ---- coverage ---------------------------------------------------
        is_fillish = (
            (kind == CMD_COLOR)
            | (kind == CMD_LIN_GRAD)
            | (kind == CMD_RAD_GRAD)
            | (kind == CMD_SWEEP_GRAD)
            | (kind == CMD_IMAGE)
            | (kind == CMD_END_CLIP)
        ) & run
        even_odd = xp.where(kind == CMD_END_CLIP, False, (flags & 1) != 0)
        fill_count = xp.where(is_fillish & (seg_count > 0), seg_count, 0)
        cov = _fill_area(
            xp,
            xp.where(fill_count > 0, seg_start_, 0),
            fill_count,
            xp.where(is_fillish, backdrop, 0),
            even_odd & is_fillish,
            segs,
            lx,
            ly,
            caps,
        )
        area = xp.where(
            (is_fillish & (seg_count > 0))[:, None],
            cov,
            xp.where(is_fillish[:, None], xp.ones_like(cov), cov),
        )

        def sc_u(off):
            return drow[:, off]

        def sc_f(off):
            return ops.bitcast_u32_f32(xp, drow[:, off])

        def info_f(off):
            return ops.bitcast_u32_f32(xp, drow[:, 3 + off])

        def info_u(off):
            return drow[:, 3 + off]

        # ---- paints -----------------------------------------------------
        # COLOR
        m = run & (kind == CMD_COLOR)
        fg = xp.stack(
            [xp.broadcast_to(sc_f(i)[:, None], (GRID, 256)) for i in range(4)]
        )
        new = _blend_over(xp, rgba, fg, area)
        rgba = xp.where(m[None, :, None], new, rgba)

        # LIN_GRAD
        m = run & (kind == CMD_LIN_GRAD)
        index_mode = sc_u(0)
        ramp_idx = (index_mode >> 2).astype(xp.int32)
        ext = (index_mode & 3).astype(xp.int32)
        line_x = info_f(1)[:, None]
        line_y = info_f(2)[:, None]
        line_c = info_f(3)[:, None]
        d_lin = line_x * gx + line_y * gy + line_c
        t_lin = _extend_mode(xp, d_lin, ext[:, None])
        fg = _sample_ramp(xp, ramps, ramp_idx, t_lin)
        new = _blend_over(xp, rgba, fg, area)
        rgba = xp.where(m[None, :, None], new, rgba)

        # RAD_GRAD
        m = run & (kind == CMD_RAD_GRAD)
        m0 = info_f(1)[:, None]
        m1 = info_f(2)[:, None]
        m2 = info_f(3)[:, None]
        m3 = info_f(4)[:, None]
        xlat_x = info_f(5)[:, None]
        xlat_y = info_f(6)[:, None]
        focal_x = info_f(7)[:, None]
        radius = info_f(8)[:, None]
        flags_kind = info_u(9)
        rkind = (flags_kind & 0x7).astype(xp.int32)[:, None]
        rflags = (flags_kind >> 3).astype(xp.int32)[:, None]
        lxr = m0 * gx + m2 * gy + xlat_x
        lyr = m1 * gx + m3 * gy + xlat_y
        xx = lxr * lxr
        yy = lyr * lyr
        is_strip = rkind == RAD_GRAD_KIND_STRIP
        is_circular = rkind == RAD_GRAD_KIND_CIRCULAR
        is_foc = rkind == RAD_GRAD_KIND_FOCAL_ON_CIRCLE
        is_swapped = (rflags & RAD_GRAD_SWAPPED) != 0
        r1_recip = xp.where(is_circular, 0.0, 1.0 / xp.where(radius == 0, 1.0, radius))
        less_scale = xp.where(is_swapped | ((1.0 - focal_x) < 0.0), -1.0, 1.0)
        t_sign = xp.sign(1.0 - focal_x)
        a_s = radius - yy
        t_strip = xp.sqrt(xp.maximum(a_s, 0.0)) + lxr
        v_strip = a_s >= 0.0
        safe_x = xp.where(lxr == 0.0, 1.0, lxr)
        t_foc = (xx + yy) / safe_x
        v_foc = (t_foc >= 0.0) & (lxr != 0.0)
        t_big = xp.sqrt(xx + yy) - lxr * r1_recip
        a_c = xx - yy
        t_cone = less_scale * xp.sqrt(xp.maximum(a_c, 0.0)) - lxr * r1_recip
        v_cone = (a_c >= 0.0) & (t_cone >= 0.0)
        t_r = xp.where(
            is_strip,
            t_strip,
            xp.where(is_foc, t_foc, xp.where(radius > 1.0, t_big, t_cone)),
        )
        valid_r = xp.where(
            is_strip,
            v_strip,
            xp.where(is_foc, v_foc, xp.where(radius > 1.0, True, v_cone)),
        )
        ext_r = (sc_u(0) & 3).astype(xp.int32)[:, None]
        ridx = (sc_u(0) >> 2).astype(xp.int32)
        t_r = _extend_mode(xp, focal_x + t_sign * t_r, ext_r)
        t_r = xp.where(is_swapped, 1.0 - t_r, t_r)
        fg = _sample_ramp(xp, ramps, ridx, t_r)
        fg = fg * valid_r[None, :, :]
        new = _blend_over(xp, rgba, fg, xp.where(valid_r, area, 0.0))
        rgba = xp.where(m[None, :, None], new, rgba)

        # SWEEP_GRAD
        m = run & (kind == CMD_SWEEP_GRAD)
        t0s = info_f(7)[:, None]
        t1s = info_f(8)[:, None]
        lxs = m0 * gx + m2 * gy + xlat_x
        lys = m1 * gx + m3 * gy + xlat_y
        xabs = xp.abs(lxs)
        yabs = xp.abs(lys)
        slope = xp.minimum(xabs, yabs) / xp.where(
            xp.maximum(xabs, yabs) == 0, 1.0, xp.maximum(xabs, yabs)
        )
        s2 = slope * slope
        phi = slope * (
            0.15912117063999176025390625
            + s2
            * (
                -5.185396969318389892578125e-2
                + s2
                * (
                    2.476101927459239959716796875e-2
                    + s2 * (-7.0547382347285747528076171875e-3)
                )
            )
        )
        phi = xp.where(xabs < yabs, 0.25 - phi, phi)
        phi = xp.where(lxs < 0.0, 0.5 - phi, phi)
        phi = xp.where(lys < 0.0, 1.0 - phi, phi)
        phi = xp.where(xp.isnan(phi), 0.0, phi)
        safe_dt = xp.where(t1s == t0s, 1.0, t1s - t0s)
        phi = (phi - t0s) / safe_dt
        ext_s = (sc_u(0) & 3).astype(xp.int32)[:, None]
        sidx = (sc_u(0) >> 2).astype(xp.int32)
        t_s = _extend_mode(xp, phi, ext_s)
        fg = _sample_ramp(xp, ramps, sidx, t_s)
        new = _blend_over(xp, rgba, fg, area)
        rgba = xp.where(m[None, :, None], new, rgba)

        # IMAGE
        if images is not None and images.shape[0] > 0:
            m = run & (kind == CMD_IMAGE)
            axy = info_u(7)
            ax = (axy & 0xFFFF).astype(xp.int32)[:, None]
            ay = (axy >> 16).astype(xp.int32)[:, None]
            wh = info_u(8)
            iw = (wh >> 16).astype(f32)[:, None]
            ih = (wh & 0xFFFF).astype(f32)[:, None]
            ux = m0 * gx + m2 * gy + xlat_x
            uy = m1 * gx + m3 * gy + xlat_y
            in_b = (ux < iw) & (uy < ih) & (ux >= 0.0) & (uy >= 0.0)
            x0i = xp.floor(ux).astype(xp.int32)
            y0i = xp.floor(uy).astype(xp.int32)
            x1i = xp.ceil(ux).astype(xp.int32)
            y1i = xp.ceil(uy).astype(xp.int32)
            fx = ux - xp.floor(ux)
            fy = uy - xp.floor(uy)
            # images: [AH, AW, 4] shelf-packed atlas plane.
            AH, AW = images.shape[0], images.shape[1]
            atlas_flat = images.reshape(AH * AW, 4)
            iwm1 = (iw - 1.0).astype(xp.int32)
            ihm1 = (ih - 1.0).astype(xp.int32)

            def ld(yi, xi):
                yi = ay + xp.clip(yi, 0, ihm1)
                xi = ax + xp.clip(xi, 0, iwm1)
                flat = yi * AW + xi
                px4 = ops.gather_guarded(xp, atlas_flat, flat)
                # premultiply
                return xp.stack(
                    [
                        px4[..., 0] * px4[..., 3],
                        px4[..., 1] * px4[..., 3],
                        px4[..., 2] * px4[..., 3],
                        px4[..., 3],
                    ]
                )

            aq = ld(y0i, x0i)
            bq = ld(y1i, x0i)
            cq = ld(y0i, x1i)
            dq = ld(y1i, x1i)
            fg = (aq + (bq - aq) * fy[None]) * (1 - fx[None]) + (
                cq + (dq - cq) * fy[None]
            ) * fx[None]
            fg = fg * in_b[None]
            new = _blend_over(xp, rgba, fg, xp.where(in_b, area, 0.0))
            rgba = xp.where(m[None, :, None], new, rgba)

        # ---- clips ------------------------------------------------------
        is_begin = kind == CMD_BEGIN_CLIP
        is_end = kind == CMD_END_CLIP
        begin_zero = is_begin & (seg_count < 0)

        # Suppressed bookkeeping.
        clip_depth_new = clip_depth + xp.where(
            active & is_begin, 1, xp.where(active & is_end, -1, 0)
        )
        unsuppress = active & suppressed & is_end & (clip_depth == zero_depth)
        zero_depth = xp.where(unsuppress, 0, zero_depth)
        start_suppress = run & begin_zero
        zero_depth = xp.where(start_suppress, clip_depth + 1, zero_depth)

        # Real begin: push blend stack.
        do_push = run & is_begin & ~begin_zero
        bd_idx = xp.clip(blend_depth, 0, BD - 1)
        push_val = rgba  # [4, G, 256]
        if ops.is_jax(xp):
            # sel: [BD, 1, G, 1] against stack [BD, 4, G, 256].
            sel = do_push[None, None, :, None] & (
                xp.arange(BD)[:, None, None, None]
                == bd_idx[None, None, :, None]
            )
            stack = xp.where(sel, push_val[None], stack)
        else:
            gi = _np.nonzero(do_push)[0]
            stack[bd_idx[gi], :, gi, :] = _np.transpose(push_val[:, gi, :], (1, 0, 2))
        rgba = xp.where(do_push[None, :, None], xp.zeros_like(rgba), rgba)
        depth_overflow = depth_overflow | xp.any(do_push & (blend_depth >= BD))
        blend_depth = blend_depth + do_push.astype(xp.int32)

        # Real end: pop + mix/compose.
        do_pop = run & is_end
        blend_depth = blend_depth - do_pop.astype(xp.int32)
        bd_idx = xp.clip(blend_depth, 0, BD - 1)
        if ops.is_jax(xp):
            bg = xp.take_along_axis(
                stack, bd_idx[None, None, :, None], axis=0
            )[0]
        else:
            bg = stack[bd_idx, :, _np.arange(GRID), :].transpose(1, 0, 2)
        blend_word = sc_u(0)
        alpha = sc_f(1)
        fg_r = rgba[0] * area * alpha[:, None]
        fg_g = rgba[1] * area * alpha[:, None]
        fg_b = rgba[2] * area * alpha[:, None]
        fg_a = rgba[3] * area * alpha[:, None]
        br_, bg_, bb_, ba_ = bm.blend_mix_compose(
            xp,
            (bg[0], bg[1], bg[2], bg[3]),
            (fg_r, fg_g, fg_b, fg_a),
            blend_word[:, None],
        )
        popped = xp.stack([br_, bg_, bb_, ba_])
        rgba = xp.where(do_pop[None, :, None], popped, rgba)
        clip_depth = clip_depth_new

        return rgba, stack, clip_depth, blend_depth, zero_depth, depth_overflow

    state = (rgba, stack, clip_depth, blend_depth, zero_depth, depth_overflow)
    state = ops.fori(xp, n_slots, slot_body, state)
    rgba, _, _, _, _, depth_overflow = state

    # Un-premultiply (fine.wgsl:1092-1102).
    a_inv = 1.0 / xp.maximum(rgba[3], 1e-6)
    out = xp.stack([rgba[0] * a_inv, rgba[1] * a_inv, rgba[2] * a_inv, rgba[3]])
    return out, depth_overflow


def assemble_image(xp, fine_out, layout):
    """[4, GRID, 256] -> [H, W, 4] cropped to the target size."""
    wit = int(layout["width_in_tiles"])
    hit = int(layout["height_in_tiles"])
    tw = int(layout["target_width"])
    th = int(layout["target_height"])
    g = fine_out[:, : wit * hit, :].reshape(4, hit, wit, 16, 16)
    img = xp.transpose(g, (1, 3, 2, 4, 0)).reshape(hit * 16, wit * 16, 4)
    return img[:th, :tw, :]
