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
from .lockstep_pallas import _transpose_mxu, lockstep_walk

# Slots per grid step (matches LOCKSTEP_CHUNK's VMEM footprint).
GEOM_CHUNK = 256
IN_COLS = 32  # 21 used; padded to a sublane-friendly width

# outS column layout.
S_ACT_A = 0
S_ACT_B = 1
S_SL = 2          # 3 simple-line slots x (valid, x0, y0, x1, y1)
S_ARC_N = 17
S_ARC_THETA = 18
S_ARC_GEOM = 19   # bx, by, ex, ey, cx, cy
S_COLS = 32


def _scrub(v):
    """NaN/Inf -> 0 so the one-hot MXU output transpose stays exact
    (NaN*0 = NaN would smear one bad slot across the whole row).
    Inactive/degenerate slots can legitimately compute non-finite
    geometry; every consumer masks on the validity columns."""
    return jnp.where(jnp.abs(v) <= 3e38, v, 0.0)


def make_geom_call(IT, n_chunks, n_paths_cap, chunk=GEOM_CHUNK,
                   interpret=False):
    assert 23 + 3 * IT < 128, "IT too large for the 128-lane table"
    C = chunk
    W = C + 8
    f32 = jnp.float32
    i32 = jnp.int32
    col_cnt = 22 + 3 * IT
    col_ovf = 23 + 3 * IT

    def kernel(tab_hbm, outA, outB, outS, win, sA, sB, sS, sem):
        from ..pipeline.flatten import slot_geometry

        c = pl.program_id(0)
        ws = pl.multiple_of(c * C, 8)
        dma = pltpu.make_async_copy(
            tab_hbm.at[pl.ds(ws, W), :], win, sem
        )
        dma.start()
        dma.wait()

        w = win[...]
        w = jnp.where(w == w, w, 0.0)  # NaN-scrub for the MXU transposes
        cur = _transpose_mxu(w[0:C], IN_COLS)          # (IN_COLS, C)
        nxt = _transpose_mxu(pltpu.roll(w, W - 1, 0)[0:C], IN_COLS)

        def r(k):
            return cur[k : k + 1, :]

        def rn(k):
            return nxt[k : k + 1, :]

        kxp = kernel_xp()
        tag = r(8).astype(i32)
        tagn = rn(8).astype(i32)
        seg0 = tag & 3
        seg0n = tagn & 3
        style_jc = r(9).astype(i32)
        is_stroke = r(10) > 0.5
        is_stroken = rn(10) > 0.5
        active = r(20) > 0.5

        g = slot_geometry(
            kxp, tag, tagn,
            [r(k) for k in range(8)], [rn(k) for k in range(8)],
            seg0, seg0n, is_stroke, is_stroken,
            style_jc, r(11), r(12), [r(13 + i) for i in range(6)],
            r(19), active, n_paths_cap,
        )

        for scratch, tab, act in (
            (sA, g["tabA"], g["act_a"]),
            (sB, g["tabB"], g["act_b"]),
        ):
            rec_t0, rec_t1, rec_n, cnt, not_done = lockstep_walk(
                tuple(tab[:8]), tab[8], tab[9], act, IT
            )
            scratch[:, :] = jnp.zeros(scratch.shape, f32)
            for k in range(21):
                scratch[k : k + 1, :] = _scrub(tab[k])
            for it in range(IT):
                scratch[21 + it : 22 + it, :] = rec_t0[it]
                scratch[21 + IT + it : 22 + IT + it, :] = rec_t1[it]
                scratch[21 + 2 * IT + it : 22 + 2 * IT + it, :] = rec_n[it]
            scratch[col_cnt : col_cnt + 1, :] = cnt
            scratch[col_ovf : col_ovf + 1, :] = not_done.astype(f32)

        sS[:, :] = jnp.zeros(sS.shape, f32)
        sS[S_ACT_A : S_ACT_A + 1, :] = g["act_a"].astype(f32)
        sS[S_ACT_B : S_ACT_B + 1, :] = g["act_b"].astype(f32)
        for k, (sv, x0, y0, x1, y1) in enumerate(g["s_lines"]):
            base = S_SL + 5 * k
            sS[base : base + 1, :] = sv.astype(f32)
            for j, v in enumerate((x0, y0, x1, y1)):
                sS[base + 1 + j : base + 2 + j, :] = _scrub(v)
        sS[S_ARC_N : S_ARC_N + 1, :] = _scrub(g["arc_n"])
        sS[S_ARC_THETA : S_ARC_THETA + 1, :] = _scrub(g["arc_theta"])
        for j, key in enumerate(
            ("arc_bx", "arc_by", "arc_ex", "arc_ey", "arc_cx", "arc_cy")
        ):
            sS[S_ARC_GEOM + j : S_ARC_GEOM + j + 1, :] = _scrub(g[key])

        outA[...] = _transpose_mxu(sA[...], C)
        outB[...] = _transpose_mxu(sB[...], C)
        outS[...] = _transpose_mxu(sS[...], C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=[
            pl.BlockSpec((C, 128), lambda c: (c, 0)),
            pl.BlockSpec((C, 128), lambda c: (c, 0)),
            pl.BlockSpec((C, S_COLS), lambda c: (c, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, IN_COLS), jnp.float32),
            pltpu.VMEM((128, C), jnp.float32),
            pltpu.VMEM((128, C), jnp.float32),
            pltpu.VMEM((S_COLS, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks * C, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks * C, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks * C, S_COLS), jnp.float32),
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
    Np = n_chunks * C + 8
    tab = xp.zeros((Np, IN_COLS), dtype=xp.float32)
    tab = tab.at[:N, :21].set(xp.stack(cols, axis=1))
    call = make_geom_call(IT, n_chunks, n_paths_cap, C, interpret=interpret)
    outA, outB, outS = call(tab)
    return outA[:N], outB[:N], outS[:N]
