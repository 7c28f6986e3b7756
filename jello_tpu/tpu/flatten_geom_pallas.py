"""Flatten geometry megakernel: slot geometry + both lockstep Euler
walks in one streaming Pallas kernel.

The reference runs flatten as ONE dispatch per path-tag workgroup
(engine/wgpu_engine/shaders/original/flatten.wgsl: decode, ESPC
subdivision and emission in a single shader). Our XLA formulation
splits it into the per-slot geometry graph (pipeline/flatten.py::
slot_geometry), two worklist compactions, two row gathers and the
lockstep walk kernel (tpu/lockstep_pallas.py) — each a top-level op
over megarow arrays that pays the per-op floor and HBM round trips.

This kernel fuses the whole per-slot portion: each grid step DMAs a
(C+8)-row window of the decoded slot table (the +8 rows give every
slot its successor for tangent/join decisions without a second pass),
transposes it onto lanes with the exact one-hot MXU contraction, runs
`slot_geometry` (xp-generic; kmath transcendentals) and BOTH lockstep
walks (`lockstep_pallas.lockstep_walk`) on (1, C) lane vectors, and
writes three outputs per slot row:

  outA / outB: the 128-column expansion tables of the two Euler
      passes in exactly `lockstep_pallas` layout (params 0..20,
      3*IT records, count, not-done flag) — ready for
      `make_expand_call` after XLA compacts rows to the active
      worklists (one row gather each; see flatten_stage).
  outS: the per-slot simple-line / arc-record / activity columns
      (layout in S_* constants below).

Divergence from the XLA path (documented): the *next* slot of the
last table row is the zero pad row, where pipeline/flatten.py wraps
to slot 0 in the unsharded layout. The last slot of a real stream is
a subpath-end marker (never `regular`), so join/cap decisions never
consume it; the sharded layout (tpu/sharded2.py) already uses the
linear successor this kernel implements.

Input column layout (f32; all values exactly representable):
   0..7   decoded raw control points (flatten.py::_read_points)
   8      path tag byte (0..255)
   9      style join/cap bits: style_flags & 0x3F00_0000 (< 2^30)
  10      is_stroke (0/1)
  11      linewidth
  12      miter limit (f16 decoded host-side)
  13..18  transform
  19      path index
  20      active (0/1)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kmath import kernel_xp
from .expand_pallas import EXPAND_SUB
from .lockstep_pallas import _transpose_mxu, lockstep_walk

# Slots per grid step (matches LOCKSTEP_CHUNK's VMEM footprint).
GEOM_CHUNK = 256
# Sub-chunks per grid step: the walks and slot_geometry run on
# (SUB, C) = full-VPU shapes instead of (1, C) lane rows — the 1/8
# sublane utilization measured as this kernel's regression vs the
# split XLA path (BASELINE.md round-3 A/B). Same batching as the
# expand/lockstep kernels; shares their JELLO_EXPAND_SUB knob.
GEOM_SUB = EXPAND_SUB
# 21 used; padded to one full lane tile: Mosaic requires HBM<->VMEM DMA
# slices to be 128-aligned along the lane dim (a (W, 32) window buffer
# fails real-TPU lowering even though interpret mode accepts it).
IN_COLS = 128

# outS column layout.
S_ACT_A = 0
S_ACT_B = 1
S_SL = 2          # 3 simple-line slots x (valid, x0, y0, x1, y1)
S_ARC_N = 17
S_ARC_THETA = 18
S_ARC_GEOM = 19   # bx, by, ex, ey, cx, cy
# Decode-mode extras (so XLA's style/transform gathers DCE entirely):
S_FILL = 25       # style fill-rule bit (drives path_draw_flags)
S_T6 = 26         # the slot's transform (drives the arc table)
S_COLS = 32       # logical columns returned to the caller
S_PAD = 128       # stored lane width (same 128-alignment DMA rule)


def _scrub(v):
    """NaN/Inf -> 0 so the one-hot MXU output transpose stays exact
    (NaN*0 = NaN would smear one bad slot across the whole row).
    Inactive/degenerate slots can legitimately compute non-finite
    geometry; every consumer masks on the validity columns."""
    return jnp.where(jnp.abs(v) <= 3e38, v, 0.0)


# --- In-kernel scene decode (the `_geom_decode` mode) ------------------
#
# Path-data / style / transform word offsets are MONOTONE in tag index
# with bounded per-slot advance (<= 6 words), so each chunk's reads live
# in one small aligned window of the scene buffer (the property
# BASELINE.md records as enabling this fusion). Words are fetched from
# the window with ONE one-hot MXU contraction per window: u32 words
# split into two exact-f32 u16 halves, lanes selected by a (128, K*C)
# one-hot, rows by a mask + sublane reduction. This replaces XLA's
# shifted-scene row table + three megarow gathers
# (pipeline/flatten.py::_read_points/_transform_read and the style rows).

# Scene window heights (rows of 128 words). Span bound per chunk:
# <= 1023 (alignment) + 6*(C+1) + 8 words = 2573 @ C=256 -> 21 rows.
PTS_WROWS = 32
STY_WROWS = 16  # style advances <= 2 words/slot -> 1543 words max
TR_WROWS = 32


def _fetch_words(win_u32, local, K):
    """win_u32: (Wr, 128) scene window; local: (1, C) i32 word offsets
    relative to the window start. Returns K i32 (1, C) vectors =
    window[local + k], 0 where local+k is outside the window."""
    Wr = win_u32.shape[0]
    C = local.shape[1]
    f32 = jnp.float32
    i32 = jnp.int32
    wi = win_u32.astype(i32)
    lo = (wi & 0xFFFF).astype(f32)
    hi = ((wi >> 16) & 0xFFFF).astype(f32)
    pos = jnp.concatenate([local + k for k in range(K)], axis=1)  # (1, K*C)
    inb = (pos >= 0) & (pos < Wr * 128)
    pc = jnp.clip(pos, 0, Wr * 128 - 1)
    lane = pc & 127
    row = pc >> 7
    ohL = (
        jax.lax.broadcasted_iota(i32, (128, K * C), 0) == lane
    ).astype(f32)
    contract = (((1,), (0,)), ((), ()))
    sel_lo = jax.lax.dot_general(
        lo, ohL, contract, preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (Wr, K*C)
    sel_hi = jax.lax.dot_general(
        hi, ohL, contract, preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )
    rmask = (
        jax.lax.broadcasted_iota(i32, (Wr, K * C), 0) == row
    ).astype(f32)
    v_lo = jnp.sum(sel_lo * rmask, axis=0, keepdims=True)  # (1, K*C)
    v_hi = jnp.sum(sel_hi * rmask, axis=0, keepdims=True)
    w = v_lo.astype(i32) | (v_hi.astype(i32) << 16)
    w = jnp.where(inb, w, 0)
    return [w[:, k * C : (k + 1) * C] for k in range(K)]


def _f16_bits_to_f32(b):
    """IEEE binary16 bits (i32 in [0, 65535]) -> f32, exactly
    (flatten.py::f16_to_f32 without the u16/f16 dtypes Mosaic lacks)."""
    sign = (b >> 15) & 1
    exp = (b >> 10) & 0x1F
    man = (b & 0x3FF).astype(jnp.float32)
    v = jnp.where(
        exp == 0,
        man * jnp.float32(2.0 ** -24),
        jnp.exp2((exp - 15).astype(jnp.float32))
        * (1.0 + man * jnp.float32(2.0 ** -10)),
    )
    v = jnp.where(exp == 31, jnp.float32(3e38), v)
    return jnp.where(sign == 1, -v, v)


def _decode_points(words, tag_i32):
    """flatten.py::_read_points' f32/i16 decode on fetched words."""
    is_f32 = (tag_i32 & 8) != 0

    def rdf(k):
        return pltpu.bitcast(words[k], jnp.float32)

    def rdi16(k):
        w = words[k]
        x = ((w << 16) >> 16).astype(jnp.float32)
        y = (w >> 16).astype(jnp.float32)
        return x, y

    i0x, i0y = rdi16(0)
    i1x, i1y = rdi16(1)
    i2x, i2y = rdi16(2)
    i3x, i3y = rdi16(3)
    return [
        jnp.where(is_f32, rdf(0), i0x),
        jnp.where(is_f32, rdf(1), i0y),
        jnp.where(is_f32, rdf(2), i1x),
        jnp.where(is_f32, rdf(3), i1y),
        jnp.where(is_f32, rdf(4), i2x),
        jnp.where(is_f32, rdf(5), i2y),
        jnp.where(is_f32, rdf(6), i3x),
        jnp.where(is_f32, rdf(7), i3y),
    ]


def _geometry_walks_emit(kxp, args, IT, n_paths_cap, sA, sB, sS,
                         outA, outB, outS, C, extras=()):
    """Shared kernel tail: slot_geometry + both walks + output writes.

    The args arrays and scratches are sublane-batched: every argument
    is (SUB, C), the scratches are (128/S_PAD, SUB, C), and the outputs
    are (SUB*C, lane) blocks written with one exact MXU transpose per
    sub-chunk."""
    from ..pipeline.flatten import slot_geometry

    f32 = jnp.float32
    col_cnt = 22 + 3 * IT
    col_ovf = 23 + 3 * IT
    SUB = sA.shape[1]

    g = slot_geometry(kxp, *args, n_paths_cap)

    for scratch, tab, act, out in (
        (sA, g["tabA"], g["act_a"], outA),
        (sB, g["tabB"], g["act_b"], outB),
    ):
        rec_t0, rec_t1, rec_n, cnt, not_done = lockstep_walk(
            tuple(tab[:8]), tab[8], tab[9], act, IT
        )
        scratch[:, :, :] = jnp.zeros(scratch.shape, f32)
        for k in range(21):
            scratch[k, :, :] = _scrub(tab[k])
        for it in range(IT):
            scratch[21 + it, :, :] = rec_t0[it]
            scratch[21 + IT + it, :, :] = rec_t1[it]
            scratch[21 + 2 * IT + it, :, :] = rec_n[it]
        scratch[col_cnt, :, :] = cnt
        scratch[col_ovf, :, :] = not_done.astype(f32)
        for j in range(SUB):
            out[j * C : (j + 1) * C, :] = _transpose_mxu(
                scratch[:, j, :], C
            )

    sS[:, :, :] = jnp.zeros(sS.shape, f32)
    sS[S_ACT_A, :, :] = g["act_a"].astype(f32)
    sS[S_ACT_B, :, :] = g["act_b"].astype(f32)
    for k, (sv, x0, y0, x1, y1) in enumerate(g["s_lines"]):
        base = S_SL + 5 * k
        sS[base, :, :] = sv.astype(f32)
        for j, v in enumerate((x0, y0, x1, y1)):
            sS[base + 1 + j, :, :] = _scrub(v)
    sS[S_ARC_N, :, :] = _scrub(g["arc_n"])
    sS[S_ARC_THETA, :, :] = _scrub(g["arc_theta"])
    for j, key in enumerate(
        ("arc_bx", "arc_by", "arc_ex", "arc_ey", "arc_cx", "arc_cy")
    ):
        sS[S_ARC_GEOM + j, :, :] = _scrub(g[key])
    for col, v in extras:
        sS[col, :, :] = v
    for j in range(SUB):
        outS[j * C : (j + 1) * C, :] = _transpose_mxu(sS[:, j, :], C)


def make_geom_call(IT, n_chunks, n_paths_cap, chunk=GEOM_CHUNK,
                   interpret=False, sub=None):
    assert 23 + 3 * IT < 128, "IT too large for the 128-lane table"
    C = chunk
    SUB = GEOM_SUB if sub is None else sub
    n_super = -(-n_chunks // SUB)
    W = SUB * C + 8
    i32 = jnp.int32

    def kernel(tab_hbm, outA, outB, outS, win, tws, twsn, sA, sB, sS, sem):
        c = pl.program_id(0)
        ws = pl.multiple_of(c * SUB * C, 8)
        dma = pltpu.make_async_copy(
            tab_hbm.at[pl.ds(ws, W), :], win, sem
        )
        dma.start()
        dma.wait()

        w = win[...]
        w = jnp.where(w == w, w, 0.0)  # NaN-scrub for the MXU transposes
        wn = pltpu.roll(w, W - 1, 0)   # row i -> row i+1 of the table
        for j in range(SUB):
            tws[:, j, :] = _transpose_mxu(w[j * C : (j + 1) * C], IN_COLS)
            twsn[:, j, :] = _transpose_mxu(wn[j * C : (j + 1) * C], IN_COLS)

        def r(k):
            return tws[k, :, :]  # (SUB, C)

        def rn(k):
            return twsn[k, :, :]

        kxp = kernel_xp()
        tag = r(8).astype(i32)
        tagn = rn(8).astype(i32)
        args = (
            tag, tagn,
            [r(k) for k in range(8)], [rn(k) for k in range(8)],
            tag & 3, tagn & 3, r(10) > 0.5, rn(10) > 0.5,
            r(9).astype(i32), r(11), r(12),
            [r(13 + i) for i in range(6)], r(19), r(20) > 0.5,
        )
        _geometry_walks_emit(kxp, args, IT, n_paths_cap, sA, sB, sS,
                             outA, outB, outS, C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_super,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=[
            pl.BlockSpec((SUB * C, 128), lambda c: (c, 0)),
            pl.BlockSpec((SUB * C, 128), lambda c: (c, 0)),
            pl.BlockSpec((SUB * C, S_PAD), lambda c: (c, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, IN_COLS), jnp.float32),
            pltpu.VMEM((128, SUB, C), jnp.float32),
            pltpu.VMEM((128, SUB, C), jnp.float32),
            pltpu.VMEM((128, SUB, C), jnp.float32),
            pltpu.VMEM((128, SUB, C), jnp.float32),
            pltpu.VMEM((S_PAD, SUB, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_super * SUB * C, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_super * SUB * C, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_super * SUB * C, S_PAD), jnp.float32),
        ],
        interpret=interpret,
    )


# Decode-mode slot-table columns (8 wide; all exactly f32).
D_TAG = 0
D_PTS_WORD = 1     # path_data_base + path_seg_offset
D_STY_WORD = 2     # style_base + style_idx (wrapped pre-style -> base)
D_TR_WORD = 3      # transform_base + 6 * trans_idx (wrapped -> base)
D_PATH = 4
D_ACTIVE = 5
DEC_COLS = 128  # 6 used; full lane tile (DMA alignment)


def make_geom_decode_call(IT, n_chunks, n_paths_cap, chunk=GEOM_CHUNK,
                          interpret=False, sub=None):
    """The megakernel with the scene decode fused in: fetches segment
    points, style words and transforms from per-chunk scene windows
    (see module banner) instead of XLA-decoded input columns."""
    assert 23 + 3 * IT < 128, "IT too large for the 128-lane table"
    C = chunk
    SUB = GEOM_SUB if sub is None else sub
    n_super = -(-n_chunks // SUB)
    W = SUB * C + 8
    i32 = jnp.int32

    def kernel(ws_pts_s, ws_sty_s, ws_tr_s, scene_hbm, tab_hbm,
               outA, outB, outS,
               win, pw, sw, tw, tws, twsn, sA, sB, sS, sem):
        c = pl.program_id(0)
        ws = pl.multiple_of(c * SUB * C, 8)
        dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(ws, W), :], win, sem)
        dma.start()
        dma.wait()

        w = win[...]
        w = jnp.where(w == w, w, 0.0)
        wn = pltpu.roll(w, W - 1, 0)
        for j in range(SUB):
            tws[:, j, :] = _transpose_mxu(w[j * C : (j + 1) * C], DEC_COLS)
            twsn[:, j, :] = _transpose_mxu(wn[j * C : (j + 1) * C], DEC_COLS)

        def r(k):
            return tws[k, :, :]  # (SUB, C)

        def rn(k):
            return twsn[k, :, :]

        kxp = kernel_xp()
        tag = r(D_TAG).astype(i32)
        tagn = rn(D_TAG).astype(i32)

        # Per-sub scene windows: the word fetches are MXU one-hot
        # contractions (shape-indifferent), so only the window DMAs and
        # fetches run per sub-chunk; the decoded values stack to
        # (SUB, C) for the full-VPU geometry/walk tail.
        pts_js, ptsn_js, sty_js, styn_js, tr_js = [], [], [], [], []
        for j in range(SUB):
            cj = c * SUB + j
            for src, dst in (
                (scene_hbm.at[pl.ds(pl.multiple_of(ws_pts_s[cj], 8),
                                    PTS_WROWS), :], pw),
                (scene_hbm.at[pl.ds(pl.multiple_of(ws_sty_s[cj], 8),
                                    STY_WROWS), :], sw),
                (scene_hbm.at[pl.ds(pl.multiple_of(ws_tr_s[cj], 8),
                                    TR_WROWS), :], tw),
            ):
                dma = pltpu.make_async_copy(src, dst, sem)
                dma.start()
                dma.wait()
            pts_base = ws_pts_s[cj] * 128
            sty_base = ws_sty_s[cj] * 128
            tr_base = ws_tr_s[cj] * 128
            pts_loc = tws[D_PTS_WORD, j : j + 1, :].astype(i32) - pts_base
            ptsn_loc = twsn[D_PTS_WORD, j : j + 1, :].astype(i32) - pts_base
            sty_loc = tws[D_STY_WORD, j : j + 1, :].astype(i32) - sty_base
            styn_loc = twsn[D_STY_WORD, j : j + 1, :].astype(i32) - sty_base
            tr_loc = tws[D_TR_WORD, j : j + 1, :].astype(i32) - tr_base
            pts_js.append(_fetch_words(pw[...], pts_loc, 8))
            ptsn_js.append(_fetch_words(pw[...], ptsn_loc, 8))
            sty_js.append(_fetch_words(sw[...], sty_loc, 2))
            styn_js.append(_fetch_words(sw[...], styn_loc, 1))
            tr_js.append(_fetch_words(tw[...], tr_loc, 6))

        def stack(js, k):
            return jnp.concatenate([js[j][k] for j in range(SUB)], axis=0)

        pts_w = [stack(pts_js, k) for k in range(8)]
        ptsn_w = [stack(ptsn_js, k) for k in range(8)]
        sty_w = [stack(sty_js, k) for k in range(2)]
        styn_w = [stack(styn_js, 0)]
        tr_w = [stack(tr_js, k) for k in range(6)]

        pts_raw = _decode_points(pts_w, tag)
        pts_next = _decode_points(ptsn_w, tagn)
        flags = sty_w[0]
        flagsn = styn_w[0]
        is_stroke = (flags >> 31) != 0
        is_stroken = (flagsn >> 31) != 0
        linewidth = pltpu.bitcast(sty_w[1], jnp.float32)
        miter = _f16_bits_to_f32(flags & 0xFFFF)
        T6 = [pltpu.bitcast(tr_w[i], jnp.float32) for i in range(6)]

        args = (
            tag, tagn, pts_raw, pts_next,
            tag & 3, tagn & 3, is_stroke, is_stroken,
            flags & 0x3F000000, linewidth, miter, T6,
            r(D_PATH), r(D_ACTIVE) > 0.5,
        )
        extras = [(S_FILL, ((flags >> 30) & 1).astype(jnp.float32))]
        extras += [(S_T6 + i, _scrub(T6[i])) for i in range(6)]
        _geometry_walks_emit(kxp, args, IT, n_paths_cap, sA, sB, sS,
                             outA, outB, outS, C, extras=extras)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # scene2d
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # slot table
        ],
        out_specs=[
            pl.BlockSpec((SUB * C, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((SUB * C, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((SUB * C, S_PAD), lambda c, *_: (c, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, DEC_COLS), jnp.float32),
            pltpu.VMEM((PTS_WROWS, 128), jnp.uint32),
            pltpu.VMEM((STY_WROWS, 128), jnp.uint32),
            pltpu.VMEM((TR_WROWS, 128), jnp.uint32),
            pltpu.VMEM((128, SUB, C), jnp.float32),
            pltpu.VMEM((128, SUB, C), jnp.float32),
            pltpu.VMEM((128, SUB, C), jnp.float32),
            pltpu.VMEM((128, SUB, C), jnp.float32),
            pltpu.VMEM((S_PAD, SUB, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_super * SUB * C, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_super * SUB * C, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_super * SUB * C, S_PAD), jnp.float32),
        ],
        interpret=interpret,
    )


def flatten_geom_tables(xp, cols, IT, n_paths_cap, caps):
    """Run the megakernel over [N]-sized decoded slot columns.

    cols: list of 21 [N] f32 arrays (layout in the module docstring).
    Returns (outA, outB, outS) sliced back to N rows.
    """
    interpret = bool(caps.get("_expand_interpret", False))
    N = cols[0].shape[0]
    C = GEOM_CHUNK
    n_chunks = max(-(-N // C), 1)
    n_super = -(-n_chunks // GEOM_SUB)
    Np = n_super * GEOM_SUB * C + 8
    tab = xp.zeros((Np, IN_COLS), dtype=xp.float32)
    tab = tab.at[:N, :21].set(xp.stack(cols, axis=1))
    call = make_geom_call(IT, n_chunks, n_paths_cap, C, interpret=interpret)
    outA, outB, outS = call(tab)
    return outA[:N], outB[:N], outS[:N]


def flatten_geom_tables_decode(xp, scene, tag_col, pts_word, sty_word,
                               tr_word, path_col, act_col, IT,
                               n_paths_cap, caps):
    """Decode-fused variant: the kernel reads segment points, styles and
    transforms from the scene buffer itself (per-chunk windows at the
    8-row-aligned starts precomputed here from the monotone offsets).

    tag_col/path_col/act_col: [N] f32; pts_word/sty_word/tr_word: [N]
    i32 absolute scene word offsets (pre-sanitized: wrapped pre-style /
    pre-transform indices clamped to their stream base so monotonicity
    holds for the window sampling).
    """
    interpret = bool(caps.get("_expand_interpret", False))
    N = tag_col.shape[0]
    C = GEOM_CHUNK
    n_chunks = max(-(-N // C), 1)
    n_super = -(-n_chunks // GEOM_SUB)
    n_sub_total = n_super * GEOM_SUB
    Np = n_sub_total * C + 8
    f32 = xp.float32
    tab = xp.zeros((Np, DEC_COLS), dtype=f32)
    tab = tab.at[:N, :6].set(xp.stack(
        [tag_col, pts_word.astype(f32), sty_word.astype(f32),
         tr_word.astype(f32), path_col, act_col], axis=1))

    S = scene.shape[0]
    rows = S // 128
    scene2d = scene[: rows * 128].reshape(rows, 128)
    min_rows = max(PTS_WROWS, TR_WROWS) + 8
    if rows < min_rows:
        scene2d = xp.concatenate(
            [scene2d,
             xp.zeros((min_rows - rows, 128), dtype=scene.dtype)]
        )
        rows = min_rows

    # One window start per sub-chunk (the kernel indexes c*SUB + j);
    # padded tail sub-chunks clamp to the last real slot.
    first = xp.minimum(
        xp.arange(n_sub_total, dtype=xp.int32) * C, max(N - 1, 0)
    )

    def ws_of(col, wrows):
        starts = col[first].astype(xp.int32)
        return xp.clip(starts // 1024 * 8, 0, rows - wrows).astype(xp.int32)

    call = make_geom_decode_call(IT, n_chunks, n_paths_cap, C,
                                 interpret=interpret)
    outA, outB, outS = call(
        ws_of(pts_word, PTS_WROWS),
        ws_of(sty_word, STY_WROWS),
        ws_of(tr_word, TR_WROWS),
        scene2d, tab,
    )
    return outA[:N], outB[:N], outS[:N]
