"""Record-stream fine rasterization (fine_v2): compositing as a
segmented affine scan.

The reference's fine stage interprets each 16x16 tile's command tape
sequentially, one workgroup per tile (fine.wgsl:814-883). A TPU pays a
fixed cost per scalar-dispatched command, so per-tile interpretation is
issue-bound. This kernel restructures the whole stage around one
observation: painter's-order src-over compositing

    rgba' = rgba * (1 - fg_a * cov) + fg * cov

is an *affine* map of the running pixel color, and affine maps compose
associatively. The tile-sorted command stream therefore admits a
segmented scan (segments = tiles): chunks of C consecutive records are
processed entirely with dense [C, 256] vector/MXU ops —

  - coverage rows arrive pre-gathered into record order (one [PC]-row
    gather in the wrapper; see pipeline/coverage) and stream in as
    plain pipelined (C, 256) blocks — no alignment matmul;
  - paints (solid colors and all three gradient kinds) evaluate
    vectorized across the chunk, with per-record parameters broadcast
    from record columns and gradient stops fetched by a one-hot matmul
    against the VMEM-resident stop table;
  - the per-tile composite is a log2(C)-step segmented scan of
    (A = 1 - fa, B = fg*cov) affine pairs;
  - every record's inclusive composite leaves with one contiguous
    C-row window write per chunk into a RECORD-indexed output; a
    tile's finished value is its last record's row (tile2rank maps
    tile -> last-record index for assembly).

There is no per-record scalar dispatch, branch, or DMA anywhere.

Tiles containing clip/blend groups or image paints are excluded here
(their records are masked to the identity map) and rendered by the
per-tile interpreter kernel (fine_pallas) into the same compact buffer.

Output: (compact [PCpad, 4, 256] un-premultiplied, tile2rank [GRID]
mapping tile -> its last record's row, -1 when empty); assemble with
`assemble_compact`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pipeline import ops
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

# Records per chunk.
V2_CHUNK = 128


def _shift_down(arr, k, fill):
    """arr[i] <- arr[i-k] along axis 0; first k rows get `fill`.

    Uses a rotate + iota mask: Mosaic lowers tpu.rotate for any sublane
    count, whereas pad+concat of offset slices is not legalizable."""
    rolled = pltpu.roll(arr, k, 0)
    idx = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
    return jnp.where(idx < k, jnp.full_like(arr, fill), rolled)


def _extend_v(t, mode):
    """Extend-mode application with per-record mode (C,1)."""
    pad = jnp.clip(t, 0.0, 1.0)
    rep = t - jnp.floor(t)
    refl = jnp.abs(t - 2.0 * jnp.round(0.5 * t))
    return jnp.where(mode == 0, pad, jnp.where(mode == 1, rep, refl))


def make_fine_v2_kernel(caps, n_ramp_rows, n_chunks, interpret=False,
                        with_images=False):
    GRID = caps["tile_grid_cap"]
    C = caps.get("v2_chunk", V2_CHUNK)
    # Image-fg window: image ranks are strictly increasing, so a chunk
    # spans at most C fg rows (+8 alignment slack).
    CWI = C + 8
    MAX_STOPS = caps.get("max_stops", 2)
    S = MAX_STOPS

    def kernel(*args):
        if with_images:
            (run1_s, run2_s,
             irank_lo_s, misc_s,
             base_s, rec_ref, cov_ref, stops_ref, fg_hbm, out_hbm,
             fg_win2, stag2, carry, carry_tile, carry1,
             carry1_seg, sem_fg, sem_out) = args
        else:
            (run1_s, run2_s,
             misc_s, base_s,
             rec_ref, cov_ref, stops_ref, out_hbm,
             stag2, carry, carry_tile, carry1, carry1_seg,
             sem_out) = args
        c = pl.program_id(0)
        wit = misc_s[0]

        # Two-buffer DMA pipeline (fg window, out staging): chunk c+1's
        # fg window streams in while chunk c computes, and chunk c's
        # output flush overlaps chunk c+1's compute (grid steps are
        # sequential on TPU, so the alternation is race-free). The
        # coverage rows arrive per-record through a plain pipelined
        # BlockSpec (the wrapper gathers the rank-indexed table into
        # record order), so no manual cov DMA or rank-window math
        # exists here.
        parity = jax.lax.rem(c, 2)

        @pl.when(c == 0)
        def _():
            carry_tile[0] = -1
            carry1_seg[0] = -1
            # Scratch starts uninitialized; 0-masked NaNs still poison
            # the v0 select, so zero it.
            carry[...] = jnp.zeros((4, 256), jnp.float32)
            carry1[...] = jnp.zeros((5, 256), jnp.float32)

        ru = rec_ref[...]  # (C, 16) u32
        rf = pltpu.bitcast(ru, jnp.float32)

        def iu(k):  # (C, 1) i32 column
            return ru[:, k : k + 1].astype(jnp.int32)

        def fu(k):  # (C, 1) f32 column
            return rf[:, k : k + 1]

        kind = iu(0)
        rank = iu(1)
        segc = iu(2)
        tile = iu(3)
        flags = iu(4)

        valid = (tile < GRID) & (tile >= 0)
        is_color = kind == CMD_COLOR
        is_lin = kind == CMD_LIN_GRAD
        is_rad = kind == CMD_RAD_GRAD
        is_sweep = kind == CMD_SWEEP_GRAD
        is_grad = is_lin | is_rad | is_sweep
        is_img = (kind == CMD_IMAGE) if with_images else None
        # Records this kernel paints; everything else (padding, clip
        # markers, image paints, whole tiles routed to the interpreter
        # via flag bit 1) is the identity map. Depth-1 pure-clip groups
        # are composed here via a two-level scan (bits 4/5 + segment id
        # in bits 8.. packed by fine_hybrid).
        legacy_tile = (flags & 2) != 0
        ident2 = (flags & 16) != 0
        end_t = (flags & 32) != 0
        seg1 = flags >> 8  # (C, 1) i32, strictly monotone
        paintable = is_color | is_grad
        if with_images:
            paintable = paintable | is_img
        live = valid & paintable & ~legacy_tile
        live_f = live.astype(jnp.float32)

        # ---- coverage -------------------------------------------------
        # Rows arrive already in record order (one [PC]-row gather in
        # the wrapper): row i of the chunk block IS record i's coverage
        # row (EndClips carry a duplicate of their Begin's row; rowless
        # records carry a masked don't-care row). This replaces the
        # (C, CW) one-hot alignment matmul + manual rank-window DMA of
        # the previous design (~4 ms/frame of HIGHEST-precision MXU
        # passthrough on the config5 trace).
        has_row = rank >= 0
        a = cov_ref[...]  # (C, 256) raw winding (area) / resolved (MSAA)
        if caps.get("aa_mode", "area") != "area":
            cov = jnp.clip(a, 0.0, 1.0)
        else:
            eo = jnp.abs(a - 2.0 * jnp.round(0.5 * a))
            nz = jnp.minimum(jnp.abs(a), 1.0)
            even_odd = (flags & 1) != 0
            cov = jnp.where(even_odd, eo, nz)
        cov = jnp.where(has_row, cov, 1.0)  # seg-less fills cover fully
        cov = cov * live_f

        # Clip coverage for EndClip-transform records: the group's clip
        # path row (shared with its BeginClip), NONZERO rule — the
        # production clip resolve rule (fine_pallas applies nz for
        # END_CLIP too); MSAA rows arrive already resolved. A row-less
        # EndClip resolves from its tile backdrop (record word 7):
        # 0 = zero-coverage group (coarse's begin_zero marker — the
        # group collapses to the identity), nonzero = the clip path
        # fully covers the tile (reachable for alpha != 1 groups, which
        # coarse includes even without edge segments). The group alpha
        # scales covc — a src-over group with alpha is affine in the
        # background at covc' = covc * alpha (the interpreter's
        # a_cov = area * alpha; blend_math's fast path).
        if caps.get("aa_mode", "area") != "area":
            covc_row = jnp.clip(a, 0.0, 1.0)
        else:
            covc_row = jnp.minimum(jnp.abs(a), 1.0)
        end_f = end_t.astype(jnp.float32)
        covc_rowless = jnp.minimum(
            jnp.abs(iu(7).astype(jnp.float32)), 1.0
        )
        covc_base = jnp.where(has_row, covc_row, covc_rowless)
        alpha_end = fu(6)
        covc = covc_base * end_f * alpha_end

        # ---- paints ---------------------------------------------------
        # Solid color: rgba f32 in words 5..8, already premultiplied.
        fg = [jnp.where(is_color, fu(5 + ch), 0.0) * jnp.ones((C, 256), jnp.float32)
              for ch in range(4)]

        any_grad = jnp.any(live & is_grad)

        def grad_fg(_):
            lx = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
            lxf = jnp.astype(lx % 16, jnp.float32)
            lyf = jnp.astype(lx // 16, jnp.float32)
            txf = jnp.astype((tile % wit) * 16, jnp.float32)
            tyf = jnp.astype((tile // wit) * 16, jnp.float32)
            gx = txf + lxf  # (C, 256)
            gy = tyf + lyf
            ext = iu(5)

            # linear: t = line_x*gx + line_y*gy + line_c
            t_lin = fu(6) * gx + fu(7) * gy + fu(8)

            # radial (Skia focal form, draw_leaf's classification)
            m0, m1, m2, m3 = fu(6), fu(7), fu(8), fu(9)
            xl, yl = fu(10), fu(11)
            focal_x = fu(12)
            radius = fu(13)
            kf = iu(14)
            rkind = kf & 0x7
            rflags = kf >> 3
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
            v_strip = (a_s >= 0.0).astype(jnp.float32)
            safe_x = jnp.where(lxr == 0.0, 1.0, lxr)
            t_foc = (xx + yy) / safe_x
            v_foc = ((t_foc >= 0.0) & (lxr != 0.0)).astype(jnp.float32)
            t_big = jnp.sqrt(xx + yy) - lxr * r1r
            a_c = xx - yy
            t_cone = less_scale * jnp.sqrt(jnp.maximum(a_c, 0.0)) - lxr * r1r
            v_cone = ((a_c >= 0.0) & (t_cone >= 0.0)).astype(jnp.float32)
            t_rad = jnp.where(is_strip, t_strip,
                              jnp.where(is_foc, t_foc,
                                        jnp.where(radius > 1.0, t_big, t_cone)))
            v_rad = jnp.where(is_strip, v_strip,
                              jnp.where(is_foc, v_foc,
                                        jnp.where(radius > 1.0, 1.0, v_cone)))
            t_rad = focal_x + t_sign * t_rad
            t_rad_post = jnp.where(is_swapped, 1.0, 0.0)  # applied after extend

            # sweep: atan polynomial (fine.wgsl:1035-1067)
            t0s, t1s = fu(12), fu(13)
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
            t_sweep = (phi - t0s) / safe_dt

            t = jnp.where(is_lin, t_lin, jnp.where(is_rad, t_rad, t_sweep))
            t = _extend_v(t, ext)
            t = jnp.where(is_rad & is_swapped, 1.0 - t, t)
            vmask = jnp.where(is_rad, v_rad, 1.0)

            # stop rows via one-hot over the stop table
            ramp_id = iu(15)
            iota_n = jax.lax.broadcasted_iota(jnp.int32, (C, n_ramp_rows), 1)
            ohr = ((iota_n == ramp_id) & is_grad).astype(jnp.float32)
            # (Precision stays HIGHEST: Mosaic rejects HIGH, and at
            # ~1.4 ms/frame the 3-pass bf16-split alternative is not
            # worth the exactness risk — probed round 5.)
            rows = jax.lax.dot_general(
                ohr, stops_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (C, 128) stop-table rows

            def stop_p(k):
                return rows[:, 1 + k : 2 + k]

            def stop_c(k, ch):
                return rows[:, 1 + S + 4 * k + ch : 2 + S + 4 * k + ch]

            acc = [stop_c(0, ch) * jnp.ones((C, 256), jnp.float32) for ch in range(4)]
            for k in range(S - 1):
                dk = jnp.maximum(stop_p(k + 1) - stop_p(k), 1e-9)
                u = jnp.clip((t - stop_p(k)) / dk, 0.0, 1.0)
                for ch in range(4):
                    acc[ch] = acc[ch] + (stop_c(k + 1, ch) - stop_c(k, ch)) * u

            def eotf(x):
                hi = jnp.exp(2.4 * jnp.log(jnp.maximum(x + 0.055, 1e-6) * (1.0 / 1.055)))
                return jnp.where(x <= 0.04045, x * (1.0 / 12.92), hi)

            ga = acc[3] * vmask
            return [eotf(acc[0]) * ga, eotf(acc[1]) * ga, eotf(acc[2]) * ga, ga]

        def no_grad(_):
            zz = jnp.zeros((C, 256), jnp.float32)
            return [zz, zz, zz, zz]

        gfg = jax.lax.cond(any_grad, grad_fg, no_grad, 0)
        gmask = is_grad.astype(jnp.float32)
        fg = [fg[ch] * (1.0 - gmask) + gfg[ch] * gmask for ch in range(4)]

        if with_images:
            # Image paints: premultiplied fg rows from the image-tap
            # kernel (tpu/image_tap.py), stored in image-record order.
            # Align rows to records exactly like coverage: one aligned
            # window DMA per chunk + a one-hot matmul. The in-bounds
            # mask is already folded into all four stored channels.
            # Image-free chunks skip the DMA and the matmul entirely.
            # The DMA is double-buffered like the coverage window; the
            # host-computed has_img scalar (irank_lo_s[2k+1]) gates both
            # the start and the wait so the semaphore never misbalances.
            def fg_copy(j, slot):
                jc = jnp.minimum(j, n_chunks - 1)
                ist8 = pl.multiple_of((irank_lo_s[2 * jc] // 8) * 8, 8)
                return pltpu.make_async_copy(
                    fg_hbm.at[pl.ds(ist8, CWI), :],
                    fg_win2.at[slot], sem_fg.at[slot],
                )

            has_img = irank_lo_s[2 * c + 1] > 0
            i_lo = irank_lo_s[2 * c]
            istart8 = pl.multiple_of((i_lo // 8) * 8, 8)

            @pl.when((c == 0) & has_img)
            def _():
                fg_copy(0, 0).start()

            @pl.when(
                (c + 1 < n_chunks)
                & (irank_lo_s[jnp.minimum(2 * c + 3, 2 * n_chunks - 1)] > 0)
            )
            def _():
                fg_copy(c + 1, 1 - parity).start()

            @pl.when(has_img)
            def _():
                fg_copy(c, parity).wait()

            irank = iu(14)
            ilocal = irank - istart8
            iota_i = jax.lax.broadcasted_iota(jnp.int32, (C, CWI), 1)
            ohi = ((iota_i == ilocal) & is_img & valid).astype(jnp.float32)

            def img_fg(_):
                return jax.lax.dot_general(
                    ohi, fg_win2.at[parity][...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (C, 1024): 4 channel-planar 256-pixel blocks

            def no_img(_):
                return jnp.zeros((C, 1024), jnp.float32)

            fgt = jax.lax.cond(has_img, img_fg, no_img, 0)
            imask = is_img.astype(jnp.float32)
            fg = [
                fg[ch] * (1.0 - imask)
                + fgt[:, 256 * ch : 256 * (ch + 1)] * imask
                for ch in range(4)
            ]

        # ---- pass 1: group-product scan ---------------------------------
        # Segments = pass-1 ids (singletons for plain records; one
        # segment per clip group). The inclusive product at an EndClip
        # is the group's composite (A_g, B_g) over transparent black;
        # plain records' inclusive product is their own map.
        fa = fg[3] * cov
        A = 1.0 - fa
        B = [fg[ch] * cov for ch in range(4)]
        # Scan steps gate on the chunk's longest same-id run (scalar
        # prefetch): when no run exceeds k the step is an exact no-op
        # (same1 would be all-false), so skipping it changes nothing.
        # Group-free chunks (runs of 1) skip the whole pass-1 scan.
        r1 = run1_s[c]
        k = 1
        while k < C:
            def _p1_step(ab, k=k):
                A1, b0, b1, b2, b3 = ab
                Bl = [b0, b1, b2, b3]
                s1_sh = _shift_down(seg1, k, -3)
                same1 = (seg1 == s1_sh).astype(jnp.float32)
                A_sh = _shift_down(A1, k, 1.0)
                B_sh = [_shift_down(b, k, 0.0) for b in Bl]
                Bn = [Bl[ch] + same1 * (A1 * B_sh[ch]) for ch in range(4)]
                return (A1 * (1.0 + same1 * (A_sh - 1.0)),
                        Bn[0], Bn[1], Bn[2], Bn[3])

            A, b0_, b1_, b2_, b3_ = jax.lax.cond(
                r1 > k, _p1_step, lambda ab: ab,
                (A, B[0], B[1], B[2], B[3]),
            )
            B = [b0_, b1_, b2_, b3_]
            k *= 2
        # Merge the pass-1 carry into the head segment (a group spanning
        # the chunk boundary): (A,B) <- (A*A_c, B + A*B_c).
        use1 = (seg1 == carry1_seg[0]).astype(jnp.float32)
        A_pre = A
        A = A * (1.0 + use1 * (carry1[0:1, :] - 1.0))
        B = [
            B[ch] + use1 * (A_pre * carry1[1 + ch : 2 + ch, :])
            for ch in range(4)
        ]
        # Pass-1 carry for the next chunk: the last record's inclusive
        # segment product (post-merge) and its segment id.
        for ch in range(4):
            carry1[1 + ch : 2 + ch, :] = B[ch][C - 1 : C, :]
        carry1[0:1, :] = A[C - 1 : C, :]
        carry1_seg[0] = seg1[C - 1, 0]

        # ---- EndClip transform / pass-2 identity ------------------------
        # A pure clip group composes over the background as the affine
        # map (1 - cov_c*(1 - A_g), cov_c*B_g) — exact, including the
        # fractional-coverage clip edge. Members and BeginClips already
        # contributed to the group product and become the identity.
        id_f = ident2.astype(jnp.float32)
        A = jnp.where(end_f > 0.0, 1.0 - covc * (1.0 - A), A)
        A = A * (1.0 - id_f) + id_f
        B = [
            jnp.where(end_f > 0.0, covc * B[ch], B[ch]) * (1.0 - id_f)
            for ch in range(4)
        ]

        # ---- pass 2: per-tile compositing scan --------------------------
        # Gated like pass 1, on the chunk's longest same-tile run.
        r2 = run2_s[c]
        k = 1
        while k < C:
            def _p2_step(ab, k=k):
                A1, b0, b1, b2, b3 = ab
                Bl = [b0, b1, b2, b3]
                tile_sh = _shift_down(tile, k, -1)
                same = (tile == tile_sh).astype(jnp.float32)
                A_sh = _shift_down(A1, k, 1.0)
                B_sh = [_shift_down(b, k, 0.0) for b in Bl]
                Bn = [Bl[ch] + same * (A1 * B_sh[ch]) for ch in range(4)]
                return (A1 * (1.0 + same * (A_sh - 1.0)),
                        Bn[0], Bn[1], Bn[2], Bn[3])

            A, b0_, b1_, b2_, b3_ = jax.lax.cond(
                r2 > k, _p2_step, lambda ab: ab,
                (A, B[0], B[1], B[2], B[3]),
            )
            B = [b0_, b1_, b2_, b3_]
            k *= 2

        # ---- compose with carry / base ---------------------------------
        ct = carry_tile[0]
        use_carry = (tile == ct).astype(jnp.float32)  # (C,1)
        v = []
        for ch in range(4):
            base_ch = base_s[ch]
            v0 = use_carry * carry[ch : ch + 1, :] + (1.0 - use_carry) * base_ch
            v.append(B[ch] + A * v0)

        # ---- write every record's composite ----------------------------
        # Each record's inclusive composite lands at its own record
        # index (the SAME C rows of DMA per chunk as the old
        # rank-compacted flush — only the output buffer grows to PCpad
        # rows); assembly gathers each tile's LAST record row via
        # tile2rank. This deletes the (C, C) one-hot flush matmuls and
        # the in-chunk tile-rank prefix sum. Un-premultiply matches the
        # interpreter kernel and assembly (fine.wgsl:1092-1102).
        inv_a = 1.0 / jnp.maximum(v[3], 1e-6)
        vout = [v[0] * inv_a, v[1] * inv_a, v[2] * inv_a, v[3]]
        stag = stag2.at[parity]
        for ch in range(4):
            stag[:, ch, :] = vout[ch]

        # Output windows are disjoint (chunk c owns rows [cC, cC+C)),
        # but keep the single-in-flight discipline: chunk c's flush
        # overlaps chunk c+1's compute.
        def out_copy(j, slot):
            return pltpu.make_async_copy(
                stag2.at[slot], out_hbm.at[pl.ds(j * C, C)], sem_out.at[slot]
            )

        @pl.when(c >= 1)
        def _():
            out_copy(c - 1, 1 - parity).wait()

        out_copy(c, parity).start()

        @pl.when(c == n_chunks - 1)
        def _():
            out_copy(c, parity).wait()

        # ---- carry ------------------------------------------------------
        for ch in range(4):
            carry[ch : ch + 1, :] = v[ch][C - 1 : C, :]
        carry_tile[0] = tile[C - 1, 0]

    in_specs = [
        # Records ride as the 2-D packed table with a (C, 16) block per
        # chunk: the 16-column stack then fuses into one XLA kernel
        # (the [n_chunks, C, 16] reshape forced 16 per-column relayout
        # copies + a multi-ms concatenate on the device trace).
        pl.BlockSpec((C, 16), lambda c, *s: (c, 0)),  # records
        # Per-record coverage rows: plain pipelined blocks (Pallas
        # double-buffers these automatically).
        pl.BlockSpec((C, 256), lambda c, *s: (c, 0)),  # cov rows
        pl.BlockSpec((n_ramp_rows, 128), lambda c, *s: (0, 0)),  # stops
    ]
    scratch = [
        pltpu.VMEM((2, C, 4, 256), jnp.float32),        # staging (2-buf)
        pltpu.VMEM((4, 256), jnp.float32),              # carry value
        pltpu.SMEM((1,), jnp.int32),                    # carry tile
        pltpu.VMEM((5, 256), jnp.float32),              # pass-1 carry (A,B)
        pltpu.SMEM((1,), jnp.int32),                    # pass-1 carry seg
        pltpu.SemaphoreType.DMA((2,)),                  # out sems
    ]
    n_prefetch = 4  # run1, run2, misc, base
    if with_images:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))
        scratch.insert(0, pltpu.VMEM((2, CWI, 1024), jnp.float32))  # fg 2-buf
        scratch.insert(-1, pltpu.SemaphoreType.DMA((2,)))           # sem_fg
        n_prefetch = 5  # + irank_lo (interleaved [start, has_img] pairs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=scratch,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks * C, 4, 256), jnp.float32),
        interpret=interpret,
    )


def fine_v2(scene, cmds, segs, counted, info, ramps, images, layout, caps,
            interpret=False, precomputed=None, fg_tab=None):
    """Record-stream fine pass. Tiles containing nested-clip/blend (and,
    without an fg table, image) records must be pre-flagged (flag bit 1)
    and merged by the interpreter (fine_hybrid); with no such tiles this
    is the whole fine stage.

    precomputed: optional (area_blk, area_row_rec, rec) shared with the
    interpreter merge pass so the coverage sweep and record packing run
    once per frame.

    fg_tab: optional [IRC+pad, 1024] premultiplied image-paint rows from
    the image-tap kernel (tpu/image_tap.py), in image-record order;
    when given, image records paint here instead of forcing the tile
    onto the interpreter.

    Returns ((compact [PCpad,4,256] un-premultiplied, record-indexed;
    tile2rank [GRID] maps tile -> its last record's row), flags)."""
    from .fine_pallas import build_records

    caps = dict(caps)
    interpret = interpret or bool(caps.get("_expand_interpret", False))
    C = caps.get("v2_chunk", V2_CHUNK)
    GRID = caps["tile_grid_cap"]
    xp = jnp

    if precomputed is None:
        # Standalone (clip-free) call: the caller hasn't packed the
        # group-scan metadata into the record flags (fine_hybrid does
        # for the hybrid path), so make every record its own pass-1
        # segment (bits 8+). Without this the ids are all zero and the
        # pass-1 scan composes the whole chunk as one group.
        cmds = dict(cmds)
        # Ids start at 1 so padding records (flags = 0 -> id 0) never
        # share a segment with a real record.
        cmds["flags"] = cmds["flags"] | (
            (xp.arange(cmds["flags"].shape[0], dtype=xp.uint32) + 1) << 8
        )
        area_blk, area_row_rec, rows_overflow = compute_area_rows(
            xp, cmds, counted, caps
        )
        cmds["area_row"] = area_row_rec
    else:
        area_blk, area_row_rec, rows_overflow = precomputed[:3]
        cmds = dict(cmds)
        cmds["area_row"] = area_row_rec

    # Stop table, lane-padded; row count static per size class.
    NR, W = ramps.shape[0], ramps.shape[1]
    caps["max_stops"] = (W - 1) // 5
    stops_pad = xp.concatenate(
        [ramps, xp.zeros((NR, 128 - W), dtype=xp.float32)], axis=1
    )

    rec = precomputed[3] if precomputed is not None else build_records(
        xp, cmds, scene, info, caps
    )
    # Standalone with images (clip-free frame, tap routing): run the
    # image-tap kernel here — no classification or interpreter merge
    # is needed when there are no clip groups at all.
    tap_flags = {}
    if fg_tab is None and caps.get("_image_tap") and images is not None:
        from .image_tap import image_tap

        fg_tab, region_ovf, recs_ovf = image_tap(
            xp, rec, cmds, images, layout, caps, interpret=interpret
        )
        tap_flags["image_region_overflow"] = region_ovf
        tap_flags["img_recs_overflow"] = recs_ovf
    PC = rec.shape[0]
    n_chunks = (PC + C - 1) // C
    PCpad = n_chunks * C
    if PCpad != PC:
        # Padding records: tile = GRID (invalid), all else zero. Built
        # as a broadcast row so the pad rides the concatenate (an
        # .at[slice].set on the packed table launches a separate
        # dynamic-update-slice).
        pad_row = xp.zeros((1, 16), dtype=xp.uint32).at[0, 3].set(
            xp.uint32(GRID)
        )
        rec = xp.concatenate(
            [rec, xp.broadcast_to(pad_row, (PCpad - PC, 16))]
        )

    tile = cmds["tile"].astype(xp.int32)
    tile_p = xp.concatenate(
        [tile, xp.full((PCpad - PC,), GRID, dtype=xp.int32)]
    ) if PCpad != PC else tile

    # Coverage rows arrive from compute_area_rows in RECORD order
    # (EndClips carry a duplicate of their Begin's row at their own
    # index; rowless records are zeroed — never NaN). The kernel reads
    # them through a statically-aligned (C, 256) BlockSpec: no
    # rank-window DMA, no per-chunk window-start math, and no (C, CW)
    # one-hot alignment matmul.
    area_rec = area_blk
    if area_rec.shape[0] < PCpad:
        area_rec = xp.concatenate(
            [area_rec,
             xp.zeros((PCpad - area_rec.shape[0],) + area_rec.shape[1:],
                      area_rec.dtype)]
        )

    # Tile -> output-row map: the output is indexed by RECORD (each
    # record's inclusive composite lands at its own index), so a tile's
    # finished value lives at its LAST record's row.
    nxt_t = xp.concatenate([tile_p[1:], xp.full(1, GRID, xp.int32)])
    last = (tile_p != nxt_t) & (tile_p < GRID)
    tile2rank = xp.full((GRID,), -1, dtype=xp.int32)
    tile2rank = ops.scatter_set(
        xp, tile2rank, xp.where(last, tile_p, GRID),
        xp.arange(PCpad, dtype=xp.int32),
    )
    if fg_tab is not None:
        P_img = (cmds["kind"] == CMD_IMAGE) & (tile < GRID) & (tile >= 0)
        P_img_p = (
            xp.concatenate([P_img, xp.zeros(PCpad - PC, dtype=P_img.dtype)])
            if PCpad != PC else P_img
        )
        icum = xp.cumsum(P_img_p.astype(xp.int32))

    misc = xp.asarray(layout["width_in_tiles"], dtype=xp.int32).reshape(1)
    base = xp.asarray(layout["base_color"], dtype=xp.float32)

    # Per-chunk longest same-id runs (gate the kernel's scan steps; a
    # step at distance k is an exact no-op when no run exceeds k).
    import jax as _jax

    def _max_runs(vals_list):
        # All run computations ride ONE cummax over stacked chunk rows.
        x = xp.concatenate(
            [v.reshape(n_chunks, C) for v in vals_list], axis=0
        )
        idxc = xp.arange(C, dtype=xp.int32)[None, :]
        change = xp.concatenate(
            [xp.ones((x.shape[0], 1), dtype=bool), x[:, 1:] != x[:, :-1]],
            axis=1,
        )
        start = _jax.lax.cummax(xp.where(change, idxc, 0), axis=1)
        runs = xp.max(idxc - start + 1, axis=1).astype(xp.int32)
        return [runs[k * n_chunks : (k + 1) * n_chunks]
                for k in range(len(vals_list))]

    # Pass-1 segment ids live in cmds["flags"] bits 8+ (identical to
    # rec[:, 4]: build_records copies the flags word verbatim, and
    # fine_hybrid packs cmds["flags"] before building rec). Reading the
    # pre-stack 1-D column avoids a strided [PC] slice of the packed
    # [PC, 16] table (a multi-ms T(1,128) relayout copy on the trace).
    flags_p = cmds["flags"]
    if PCpad != PC:
        flags_p = xp.concatenate(
            [flags_p, xp.zeros(PCpad - PC, dtype=flags_p.dtype)]
        )
    run1, run2 = _max_runs([(flags_p >> 8).astype(xp.int32),
                            tile_p.astype(xp.int32)])

    call = make_fine_v2_kernel(caps, NR, n_chunks, interpret=interpret,
                               with_images=fg_tab is not None)
    if fg_tab is not None:
        # Per-chunk fg-window starts: the count of image records before
        # the chunk (image ranks are strictly increasing, so a chunk
        # spans at most C rows from there).
        IRC = caps.get("img_recs_cap", 1024)
        # icum / P_img_p computed above (riding the tile-rank cumsum).
        irank_lo = xp.concatenate(
            [xp.zeros(1, xp.int32), icum[C - 1 :: C][:-1]]
        )
        irank_lo = xp.clip(irank_lo, 0, max(IRC - 1, 0))
        # Interleave [window start, has_img] per chunk: the kernel gates
        # its double-buffered fg DMA (start AND wait) on has_img, so the
        # flag must ride scalar prefetch alongside the start.
        has_img_c = xp.any(
            P_img_p.reshape(n_chunks, C), axis=1
        ).astype(xp.int32)
        irank_lo = xp.stack([irank_lo, has_img_c], axis=1).reshape(-1)
        out = call(
            run1,
            run2,
            irank_lo.astype(xp.int32),
            misc,
            base,
            rec,
            area_rec,
            stops_pad,
            fg_tab,
        )
    else:
        out = call(
            run1,
            run2,
            misc,
            base,
            rec,
            area_rec,
            stops_pad,
        )
    flags = {"area_rows_overflow": rows_overflow}
    flags.update(tap_flags)
    return (out, tile2rank), flags


def assemble_compact(np_mod, compact, tile2rank, ld):
    """Expand the compact per-tile output into an [H, W, 4] image
    (host-side; the gather is a numpy fancy-index)."""
    wit = int(ld["width_in_tiles"])
    hit = int(ld["height_in_tiles"])
    W = int(ld["target_width"])
    H = int(ld["target_height"])
    # un-premultiplied base (compact rows are un-premultiplied) — host
    # math on the concrete base color, so this traces as a constant
    # under jit (device-side present path, tpu/render.py).
    base = np.asarray(ld["base_color"], dtype=np.float32)
    ba = max(float(base[3]), 1e-6)
    base_un = np.array([base[0] / ba, base[1] / ba, base[2] / ba, base[3]],
                       dtype=np.float32)
    rank = np_mod.asarray(tile2rank)[: wit * hit]
    compact = np_mod.asarray(compact)
    rows = compact[np_mod.clip(rank, 0, compact.shape[0] - 1)]  # [T,4,256]
    rows = np_mod.where(
        (rank >= 0)[:, None, None], rows,
        base_un[None, :, None],
    )
    img = rows.reshape(hit, wit, 4, 16, 16)
    img = np_mod.transpose(img, (0, 3, 1, 4, 2)).reshape(hit * 16, wit * 16, 4)
    return img[:H, :W]
