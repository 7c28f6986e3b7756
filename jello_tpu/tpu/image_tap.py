"""Image-tap kernel: bilinear atlas taps for image paint records.

The per-tile interpreter kernel (fine_pallas) was the only consumer of
image paints, so any tile covered by an image draw routed its WHOLE
command tape through the scalar interpreter — on scenes profiled in
BASELINE.md ~31% of tiles were "legacy" solely for this reason. An
image paint is a perfectly ordinary src-over record once its foreground
color exists per pixel: the record-stream kernel (fine_v2) composes
A = 1 - fg_a*cov, B = fg*cov like any solid fill.

This kernel produces exactly that foreground. One program per image
record (grid = img_recs_cap): DMA the atlas region the record's tile
maps into (region offsets precomputed by the wrapper and prefetched, so
record i+1's window streams in while record i computes — a two-buffer
pipeline), evaluate the bilinear tap as one x-weighted one-hot column
matmul + one y-weighted row reduce per channel (the atlas is stored
premultiplied — fine.wgsl premultiplies each textureLoad *before*
bilinear mixing, so the mix is linear), fold the in-bounds mask into
all four channels (equivalent to the interpreter's `fg*okf, cov*okf`
since the composite only consumes fg*cov and fg_a*cov), and write one
[1, 1024] row (4 channel-planar 256-pixel blocks) in image-record
order. fine_v2 aligns rows to records by rank with a windowed DMA +
one-hot matmul — the same mechanism it uses for coverage rows.

Reference: fine.wgsl:1068-1087 (bilinear image sampling inside the fine
interpreter); here it is hoisted out of the tape walk entirely so the
walk itself disappears for image-only tiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pipeline.coarse import CMD_IMAGE

# Atlas region window per record (matches fine_pallas's interpreter
# image branch): a 16x16 tile maps (under the inverse transform) into
# at most REGH x (REGW-128) source texels for scale factors down to
# ~0.25. Stronger minification sweeps up to MAX_WIN sub-windows per
# record instead of falling out of the Pallas fine entirely (VERDICT
# r4 item #10): each corner tap matches the window-relative one-hot of
# exactly one sub-window, so the accumulated sum is EXACTLY the single
# bilinear tap (fine.wgsl:1068-1087 semantics) — only records needing
# more than MAX_WIN windows (scale beyond ~16-24x) raise the
# region-overflow flag and reroute the frame.
REGH, REGW = 64, 256
MAX_WIN = 12


def make_image_tap_kernel(caps, img_shape, n_recs, interpret=False):
    GRID = caps["tile_grid_cap"]
    AH, AW = img_shape

    def kernel(misc_s, ylo_s, xlo_s, nyx_s, rec_ref, img_ref, out_ref,
               ovf_ref, buf_a, buf_b, buf_c, facc, sem_a, sem_b, sem_c):
        i = pl.program_id(0)
        wit = misc_s[0]
        rec_u = rec_ref[...][0]  # (1, 16) u32 (block carries a unit mid dim)
        rec_f = pltpu.bitcast(rec_u, jnp.float32)

        def ru(k):
            return rec_u[0, k]

        def rf(k):
            return rec_f[0, k]

        def copy(j, buf, sem):
            jc = jnp.minimum(j, n_recs - 1)
            ylo = pl.multiple_of(ylo_s[jc], 8)
            xlo = pl.multiple_of(xlo_s[jc], 128)
            return pltpu.make_async_copy(
                img_ref.at[:, pl.ds(ylo, REGH), pl.ds(xlo, REGW)], buf, sem
            )

        # Two-buffer pipeline: program i kicks off record i+1's region
        # window before computing its own (grid steps are sequential,
        # so buf reuse is race-free).
        even = jax.lax.rem(i, 2) == 0

        @pl.when(i == 0)
        def _():
            copy(0, buf_a, sem_a).start()

        @pl.when(even & (i + 1 < n_recs))
        def _():
            copy(i + 1, buf_b, sem_b).start()

        @pl.when(~even & (i + 1 < n_recs))
        def _():
            copy(i + 1, buf_a, sem_a).start()

        kind = ru(0).astype(jnp.int32)
        t = ru(3).astype(jnp.int32)
        valid = (kind == CMD_IMAGE) & (t >= 0) & (t < GRID)
        tc = jnp.clip(t, 0, GRID - 1)

        p = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        lx = jnp.astype(p % 16, jnp.float32)
        ly = jnp.astype(p // 16, jnp.float32)
        gx = lx + jnp.astype((tc % wit) * 16, jnp.float32)
        gy = ly + jnp.astype((tc // wit) * 16, jnp.float32)

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
        ux = m0 * gx + m2 * gy + xl
        uy = m1 * gx + m3 * gy + yl
        inb = (ux < iw) & (uy < ih) & (ux >= 0.0) & (uy >= 0.0)
        x0f = jnp.floor(ux)
        y0f = jnp.floor(uy)
        fx = ux - x0f
        fy = uy - y0f

        def clampx(v):
            return jnp.clip(v.astype(jnp.int32), 0, jnp.maximum(iwi - 1, 0))

        def clampy(v):
            return jnp.clip(v.astype(jnp.int32), 0, jnp.maximum(ihi - 1, 0))

        # Prefetched (wrapper-computed, identical math) region window.
        x_lo = pl.multiple_of(xlo_s[i], 128)
        y_lo = pl.multiple_of(ylo_s[i], 8)
        nyx = nyx_s[i]  # (ny << 8) | nx sub-window grid of this record
        ny = nyx >> 8
        nx = nyx & 0xFF
        nw = ny * nx
        region_bad = nw > MAX_WIN

        iota_h = jax.lax.broadcasted_iota(jnp.int32, (REGH, 256), 0)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (REGW, 256), 0)

        # Atlas-absolute corner coordinates; per window they become
        # window-relative, and the one-hot EQUALITY is the membership
        # mask — a corner outside the window matches nothing, so the
        # multi-window accumulation is exactly the single bilinear tap.
        lc0a = ax + clampx(x0f)          # (1, 256)
        lc1a = ax + clampx(jnp.ceil(ux))
        lr0a = ay + clampy(y0f)
        lr1a = ay + clampy(jnp.ceil(uy))
        okf = (
            jnp.astype(inb, jnp.float32)
            * jnp.astype(~region_bad, jnp.float32)
            * jnp.astype(valid, jnp.float32)
        )

        def tap_terms(buf, xw, yw):
            """Accumulate this window's share of the tap into facc."""
            ohc = (
                jnp.astype(iota_w == lc0a - xw, jnp.float32) * (1.0 - fx)
                + jnp.astype(iota_w == lc1a - xw, jnp.float32) * fx
            )  # (REGW, 256)
            wrow = (
                jnp.astype(iota_h == lr0a - yw, jnp.float32) * (1.0 - fy)
                + jnp.astype(iota_h == lr1a - yw, jnp.float32) * fy
            )  # (REGH, 256)
            for chn in range(4):
                m1c = jax.lax.dot_general(
                    buf[chn], ohc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (REGH, 256)
                facc[chn : chn + 1, :] = facc[chn : chn + 1, :] + jnp.sum(
                    wrow * m1c, axis=0, keepdims=True
                )

        facc[...] = jnp.zeros((4, 256), jnp.float32)

        @pl.when(even)
        def _():
            copy(i, buf_a, sem_a).wait()
            tap_terms(buf_a, x_lo, y_lo)

        @pl.when(~even)
        def _():
            copy(i, buf_b, sem_b).wait()
            tap_terms(buf_b, x_lo, y_lo)

        # Minified records: sweep the remaining sub-windows serially
        # (rare; the common nw == 1 case never enters the loop and keeps
        # the cross-record two-buffer pipeline untouched). The atlas is
        # padded by one window per axis (atlas_planar), so unclipped
        # window origins stay in bounds.
        # buf_c/sem_c are dedicated to the sweep: buf_a/buf_b may carry
        # record i+1's in-flight prefetch at this point.
        @pl.when((nw > 1) & ~region_bad & valid)
        def _():
            def wbody(w, _):
                wy = w // nx
                wx = w - wy * nx
                yw = pl.multiple_of(y_lo + wy * REGH, 8)
                xw = pl.multiple_of(x_lo + wx * REGW, 128)
                dma = pltpu.make_async_copy(
                    img_ref.at[:, pl.ds(yw, REGH), pl.ds(xw, REGW)],
                    buf_c, sem_c,
                )
                dma.start()
                dma.wait()
                tap_terms(buf_c, xw, yw)
                return 0

            jax.lax.fori_loop(1, jnp.minimum(nw, MAX_WIN), wbody, 0)

        for chn in range(4):
            out_ref[0, :, 256 * chn : 256 * (chn + 1)] = (
                facc[chn : chn + 1, :] * okf
            )

        ovf_ref[0] = jnp.full(
            (1, 128), (region_bad & valid).astype(jnp.int32)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # misc (wit), y_lo, x_lo, nyx
        grid=(n_recs,),
        in_specs=[
            # Unit middle dim: a (1, 1, 16) block on [N, 1, 16] matches
            # the array's last-two dims exactly (Mosaic requires blocks
            # divisible by (8, 128) OR equal to the array dims; the 2-D
            # (1, 16) form is not lowerable on real TPUs).
            pl.BlockSpec((1, 1, 16), lambda i, *s: (i, 0, 0)),    # record
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),     # atlas
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1024), lambda i, *s: (i, 0, 0)),  # fg row
            pl.BlockSpec((1, 1, 128), lambda i, *s: (i, 0, 0)),   # region ovf
        ),
        scratch_shapes=[
            pltpu.VMEM((4, REGH, REGW), jnp.float32),  # region buffer A
            pltpu.VMEM((4, REGH, REGW), jnp.float32),  # region buffer B
            pltpu.VMEM((4, REGH, REGW), jnp.float32),  # sweep buffer C
            pltpu.VMEM((4, 256), jnp.float32),         # tap accumulator
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_recs, 1, 1024), jnp.float32),
            jax.ShapeDtypeStruct((n_recs, 1, 128), jnp.int32),
        ),
        interpret=interpret,
    )


def _region_offsets(xp, tap_rec, wit, GRID, AH, AW):
    """Per-record aligned atlas-window offsets (the kernel's region
    math, hoisted so the offsets can ride scalar prefetch and the DMA
    for record i+1 can start during record i's compute). f32/i32 ops
    only — bit-identical to the in-kernel derivation it replaces."""
    from ..pipeline import ops

    ru = tap_rec
    t = ru[:, 3].astype(xp.int32)
    tc = xp.clip(t, 0, GRID - 1)
    p = xp.arange(256, dtype=xp.int32)[None, :]
    lx = (p % 16).astype(xp.float32)
    ly = (p // 16).astype(xp.float32)
    gx = lx + ((tc % wit) * 16).astype(xp.float32)[:, None]
    gy = ly + ((tc // wit) * 16).astype(xp.float32)[:, None]
    rfl = ops.bitcast_u32_f32(xp, ru)
    m0, m1 = rfl[:, 6:7], rfl[:, 7:8]
    m2, m3 = rfl[:, 8:9], rfl[:, 9:10]
    xl, yl = rfl[:, 10:11], rfl[:, 11:12]
    axy = ru[:, 12]
    ax = (axy & xp.uint32(0xFFFF)).astype(xp.int32)[:, None]
    ay = (axy >> 16).astype(xp.int32)[:, None]
    wh = ru[:, 13]
    iwi = (wh >> 16).astype(xp.int32)[:, None]
    ihi = (wh & xp.uint32(0xFFFF)).astype(xp.int32)[:, None]
    ux = m0 * gx + m2 * gy + xl
    uy = m1 * gx + m3 * gy + yl
    cxv = xp.clip(xp.floor(ux).astype(xp.int32), 0, xp.maximum(iwi - 1, 0))
    cyv = xp.clip(xp.floor(uy).astype(xp.int32), 0, xp.maximum(ihi - 1, 0))
    cxv1 = xp.clip(xp.ceil(ux).astype(xp.int32), 0, xp.maximum(iwi - 1, 0))
    cyv1 = xp.clip(xp.ceil(uy).astype(xp.int32), 0, xp.maximum(ihi - 1, 0))
    rx0 = ax[:, 0] + xp.min(cxv, axis=1)
    ry0 = ay[:, 0] + xp.min(cyv, axis=1)
    rx1 = ax[:, 0] + xp.max(cxv1, axis=1)
    ry1 = ay[:, 0] + xp.max(cyv1, axis=1)
    x_lo = xp.clip((rx0 // 128) * 128, 0, AW - REGW)
    y_lo = xp.clip((ry0 // 8) * 8, 0, AH - REGH)
    # Sub-window grid for minified records (atlas padded by one window
    # per axis, so unclipped steps from the aligned origin stay in
    # bounds): ny/nx packed as (ny << 8) | nx.
    nx = xp.maximum(rx1 - x_lo, 0) // REGW + 1
    ny = xp.maximum(ry1 - y_lo, 0) // REGH + 1
    # nx packs into 8 bits; an (unrealistic) >255-window x-span must
    # trip the overflow flag, not alias into the ny field.
    nx = xp.minimum(nx, 255)
    ny = xp.minimum(ny, 255)
    nyx = (ny.astype(xp.int32) << 8) | nx.astype(xp.int32)
    return y_lo.astype(xp.int32), x_lo.astype(xp.int32), nyx


def image_tap(xp, rec, cmds, images, layout, caps, interpret=False):
    """Run the tap over the command stream's image records.

    rec: the packed [PC, 16] record table (build_records, with image
    ranks in word 14). Compacts the image records in stream order (the
    rank order fine_v2 consumes), runs one tap program per record, and
    returns (fg_tab [IRC + CWI pad, 1024], region_overflow flag,
    img_recs_overflow flag).
    """
    from ..pipeline import ops
    from ..pipeline.flatten import expand_by_counts
    from .fine_pallas import atlas_planar

    GRID = caps["tile_grid_cap"]
    IRC = caps.get("img_recs_cap", 1024)
    C = caps.get("v2_chunk", 128)
    CWI = C + 8

    tile = cmds["tile"].astype(xp.int32)
    P = (cmds["kind"] == CMD_IMAGE) & (tile < GRID) & (tile >= 0)
    irec, _, ivalid, _, n_img = expand_by_counts(xp, P.astype(xp.int32), IRC)
    tap_rec = ops.gather_guarded(xp, rec, irec)
    tap_rec = xp.where(ivalid[:, None], tap_rec, xp.uint32(0))

    img_flat, img_shape = atlas_planar(images)
    wit = layout["width_in_tiles"]
    y_lo, x_lo, nyx = _region_offsets(
        xp, tap_rec, wit, GRID, img_shape[0], img_shape[1]
    )
    misc = xp.asarray(wit, dtype=xp.int32).reshape(1)
    call = make_image_tap_kernel(caps, img_shape, IRC, interpret=interpret)
    fg_tab, ovf = call(misc, y_lo, x_lo, nyx, tap_rec[:, None, :], img_flat)
    fg_tab = fg_tab.reshape(IRC, 1024)
    # Window pad so fine_v2's aligned CWI-row DMA never reads past the
    # table (and pad rows are zero, keeping the one-hot matmul NaN-free).
    fg_tab = xp.concatenate(
        [fg_tab, xp.zeros((CWI + 8, 1024), dtype=xp.float32)]
    )
    return fg_tab, xp.any((ovf & 1) > 0), n_img > IRC
