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
maps into (same region-window scheme as the interpreter's image branch,
fine_pallas.py), evaluate the four separable one-hot bilinear taps on
the MXU, premultiply per tap (fine.wgsl applies premul_alpha to each
textureLoad *before* bilinear mixing), fold the in-bounds mask into all
four channels (equivalent to the interpreter's `fg*okf, cov*okf` since
the composite only consumes fg*cov and fg_a*cov), and write one
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
# ~0.25; stronger minification raises the region-overflow flag and the
# frame falls back to the XLA fine.
REGH, REGW = 64, 256


def make_image_tap_kernel(caps, img_shape, n_recs, interpret=False):
    GRID = caps["tile_grid_cap"]
    AH, AW = img_shape

    def kernel(misc_s, rec_ref, img_ref, out_ref, ovf_ref, img_buf, sem):
        wit = misc_s[0]
        rec_u = rec_ref[...]  # (1, 16) u32
        rec_f = pltpu.bitcast(rec_u, jnp.float32)

        def ru(k):
            return rec_u[0, k]

        def rf(k):
            return rec_f[0, k]

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

        # Atlas region touched by this tile (+bilinear margin), aligned
        # for the DMA window.
        rx0 = ax + jnp.min(clampx(x0f), axis=1, keepdims=True)[0, 0]
        ry0 = ay + jnp.min(clampy(y0f), axis=1, keepdims=True)[0, 0]
        rx1 = ax + jnp.max(clampx(jnp.ceil(ux)), axis=1, keepdims=True)[0, 0]
        ry1 = ay + jnp.max(clampy(jnp.ceil(uy)), axis=1, keepdims=True)[0, 0]
        x_lo = pl.multiple_of(jnp.clip((rx0 // 128) * 128, 0, AW - REGW), 128)
        y_lo = pl.multiple_of(jnp.clip((ry0 // 8) * 8, 0, AH - REGH), 8)
        region_bad = ((rx1 - x_lo) >= REGW) | ((ry1 - y_lo) >= REGH)

        dma = pltpu.make_async_copy(
            img_ref.at[:, pl.ds(y_lo, REGH), pl.ds(x_lo, REGW)], img_buf, sem
        )
        dma.start()
        dma.wait()

        iota_h = jax.lax.broadcasted_iota(jnp.int32, (REGH, 256), 0)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (REGW, 256), 0)

        # Atlas texels are premultiplied (atlas_planar), so the whole
        # bilinear tap is linear: fold the x weights into ONE column
        # matmul per channel and the y weights into one row reduce —
        # 4 MXU contractions per record instead of 16.
        lc0 = ax + clampx(x0f) - x_lo  # (1, 256)
        lc1 = ax + clampx(jnp.ceil(ux)) - x_lo
        lr0 = ay + clampy(y0f) - y_lo
        lr1 = ay + clampy(jnp.ceil(uy)) - y_lo
        ohc = (
            jnp.astype(iota_w == lc0, jnp.float32) * (1.0 - fx)
            + jnp.astype(iota_w == lc1, jnp.float32) * fx
        )  # (REGW, 256)
        wrow = (
            jnp.astype(iota_h == lr0, jnp.float32) * (1.0 - fy)
            + jnp.astype(iota_h == lr1, jnp.float32) * fy
        )  # (REGH, 256)
        okf = (
            jnp.astype(inb, jnp.float32)
            * jnp.astype(~region_bad, jnp.float32)
            * jnp.astype(valid, jnp.float32)
        )
        fg = []
        for chn in range(4):
            m1c = jax.lax.dot_general(
                img_buf[chn], ohc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (REGH, 256)
            fg.append(jnp.sum(wrow * m1c, axis=0, keepdims=True) * okf)
        # Four static lane-slice stores (offsets = 0 mod 128) rather
        # than a lane-axis concat.
        for ch in range(4):
            out_ref[:, 256 * ch : 256 * (ch + 1)] = fg[ch]
        ovf_ref[0] = jnp.full(
            (1, 128), (region_bad & valid).astype(jnp.int32)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # misc (wit)
        grid=(n_recs,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i, m: (i, 0)),          # record
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),    # atlas
        ],
        out_specs=(
            pl.BlockSpec((1, 1024), lambda i, m: (i, 0)),        # fg row
            pl.BlockSpec((1, 1, 128), lambda i, m: (i, 0, 0)),   # region ovf
        ),
        scratch_shapes=[
            pltpu.VMEM((4, REGH, REGW), jnp.float32),  # atlas region
            pltpu.SemaphoreType.DMA,
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_recs, 1024), jnp.float32),
            jax.ShapeDtypeStruct((n_recs, 1, 128), jnp.int32),
        ),
        interpret=interpret,
    )


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
    misc = xp.asarray(layout["width_in_tiles"], dtype=xp.int32).reshape(1)
    call = make_image_tap_kernel(caps, img_shape, IRC, interpret=interpret)
    fg_tab, ovf = call(misc, tap_rec, img_flat)
    # Window pad so fine_v2's aligned CWI-row DMA never reads past the
    # table (and pad rows are zero, keeping the one-hot matmul NaN-free).
    fg_tab = xp.concatenate(
        [fg_tab, xp.zeros((CWI + 8, 1024), dtype=xp.float32)]
    )
    return fg_tab, xp.any((ovf & 1) > 0), n_img > IRC
