"""Lockstep Euler subdivision as a Pallas TPU kernel.

The adaptive subdivision walk (reference: flatten.go:400-522, one
data-dependent loop per thread) runs in pipeline/flatten.py as a
lockstep `lax.while_loop` over all work items. On the axon fabric that
loop costs ~40 ms/frame at 250k work items: every iteration is a chain
of top-level VPU ops over megarow arrays, paying the per-op dispatch
floor ~IT times over.

Here the same walk runs inside one streaming Pallas kernel: the grid
tiles the work-item table into (C, 128) row blocks, each block is
transposed onto lanes with an exact one-hot MXU contraction, the IT
iterations run as an unrolled register loop on (1, C) lane vectors, and
the block writes back the *expansion-ready* parameter table — columns
0..20 copied through, 21..21+3*IT the (t0, t1, n) records, and the
per-item line count — in the exact column layout
`expand_pallas.make_expand_call` consumes (tpu/expand_pallas.py
_euler_compute). XLA's only remaining work between flatten's geometry
and the line expansion is one cumsum over the counts.

Numerics: the walk uses the same f32 formulas as the XLA path
(flatten_math.py) with Mosaic-safe transcendentals (tpu/kmath.py) —
the same shims the line-expansion kernel already uses, so records and
line evaluation now share one math implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import flatten_math as fm
from .kmath import kernel_xp
from .expand_pallas import (
    EXPAND_CHUNK, EXPAND_SUB, _WIN_PAD, make_expand_call, _euler_compute,
)

# Rows per grid step. 256 f32 rows x 128 lanes = 128 KB block.
LOCKSTEP_CHUNK = 256

# Output column layout (matches _euler_compute + make_expand_call):
#   0..20   params (copied from input)
#   21..20+IT        rec_t0
#   21+IT..20+2IT    rec_t1
#   21+2IT..20+3IT   rec_n
#   21+3IT (=117 for IT=32)  incl  — written by XLA afterwards
#   22+3IT (=118)            count (sum of rec_n)
#   23+3IT (=119)            not-done overflow flag
COL_VALID = 21  # input-side: valid flag rides the (otherwise unused) rec area


def _transpose_mxu(a, out_rows):
    """Exact (one-hot f32) MXU transpose: a [R, K] -> [K, R] using a
    contraction against an identity; HIGHEST precision makes the
    passthrough bit-exact for finite f32 (the expand kernels rely on
    the same property)."""
    R = a.shape[0]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    ).astype(jnp.float32)
    return jax.lax.dot_general(
        a, eye, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[:out_rows]


def lockstep_walk(P, offset, scale, act, IT):
    """The adaptive subdivision walk on arbitrary (broadcast-compatible)
    array shapes, Mosaic-safe (shared by this kernel and the fused
    flatten geometry megakernel, tpu/flatten_geom_pallas.py).

    P: tuple of 8 cubic point arrays; act: bool mask (degenerate slots
    must already be masked out by the caller or here).
    Returns (rec_t0, rec_t1, rec_n: lists of IT arrays, cnt, not_done).
    """
    from ..pipeline.flatten import _pq_at

    kxp = kernel_xp()
    f32 = jnp.float32

    degenerate = (
        (P[0] == P[2]) & (P[1] == P[3]) & (P[0] == P[4]) & (P[1] == P[5])
        & (P[0] == P[6]) & (P[1] == P[7])
    )
    act = act & ~degenerate

    zero = jnp.zeros_like(P[0])
    # Interval counter as i32: dt >= SUBDIV_LIMIT = 2^-16 bounds it
    # at 65536 (Mosaic has no u32->f32 cast; the XLA path's u32
    # overflow clamp is unreachable defensive code).
    t0u = zero.astype(jnp.int32)
    dt = zero + 1.0
    lpx, lpy = P[0], P[1]
    lqx, lqy = P[2] - P[0], P[3] - P[1]
    small = lqx * lqx + lqy * lqy < fm.DERIV_THRESH * fm.DERIV_THRESH
    _, _, q2x, q2y = fm.eval_cubic_and_deriv(*P, f32(fm.DERIV_EPS))
    lqx = jnp.where(small, q2x, lqx)
    lqy = jnp.where(small, q2y, lqy)
    last_t = zero
    done = ~act

    rec_t0, rec_t1, rec_n = [], [], []
    cnt = zero
    for it in range(IT):
        t0 = t0u.astype(f32) * dt
        done = done | (t0 == 1.0)
        t1 = t0 + dt
        p1x, p1y, q1x, q1y, t1 = _pq_at(kxp, P, t1)
        actual_dt = t1 - last_t
        th0, th1, chord_len, err = fm.cubic_params_from_points_derivs(
            kxp, lpx, lpy, p1x, p1y, lqx, lqy, q1x, q1y, actual_dt
        )
        emit = (err * scale <= fm.FLATTEN_TOL) | (dt <= fm.SUBDIV_LIMIT)
        do_emit = emit & ~done

        k0, k1, ch = fm.euler_params_from_angles(th0, th1)
        n, _, _, _, _, _, _ = fm.espc_subdivision(
            kxp, k0, k1, ch, chord_len, offset, scale
        )
        n = jnp.where(jnp.isnan(n), f32(1.0), n)
        n = jnp.where(do_emit, n, 0.0)

        rec_t0.append(jnp.where(do_emit, last_t, 0.0))
        rec_t1.append(jnp.where(do_emit, t1, 0.0))
        rec_n.append(n)
        cnt = cnt + n

        lpx = jnp.where(do_emit, p1x, lpx)
        lpy = jnp.where(do_emit, p1y, lpy)
        lqx = jnp.where(do_emit, q1x, lqx)
        lqy = jnp.where(do_emit, q1y, lqy)
        last_t = jnp.where(do_emit, t1, last_t)

        t0u_e = t0u + 1
        low = t0u_e & (-t0u_e)
        shift = jnp.log2(low.astype(f32)).astype(jnp.int32)
        t0u_e = t0u_e >> shift
        dt_e = dt * jnp.exp2(shift.astype(f32))
        t0u_s = jnp.minimum(t0u * 2, jnp.int32(0x3FFFFFFF))
        dt_s = dt * 0.5

        advance = emit & ~done
        subdiv = ~emit & ~done
        t0u = jnp.where(advance, t0u_e, jnp.where(subdiv, t0u_s, t0u))
        dt = jnp.where(advance, dt_e, jnp.where(subdiv, dt_s, dt))

    return rec_t0, rec_t1, rec_n, cnt, ~done


def make_lockstep_call(IT, n_chunks, chunk=LOCKSTEP_CHUNK, interpret=False,
                       sub=EXPAND_SUB):
    """Each grid step walks SUB sub-blocks of C work items: the table
    rows are transposed per sub-block into a (128, SUB, C) scratch so
    the transcendental-heavy walk runs on (SUB, C) = full-VPU shapes
    instead of (1, C) lane rows (1/8 sublane utilization)."""
    assert 21 + 3 * IT + 3 <= 128, "IT too large for the 128-lane table"
    C = chunk
    SUB = sub
    f32 = jnp.float32
    col_cnt = 22 + 3 * IT
    col_ovf = 23 + 3 * IT
    n_super = -(-n_chunks // SUB)

    def kernel(in_ref, out_ref, tws, scratch):
        win = in_ref[...]  # (SUB*C, 128)
        win = jnp.where(win == win, win, 0.0)  # NaN-scrub for the MXU pass
        for j in range(SUB):
            tws[:, j, :] = _transpose_mxu(win[j * C : (j + 1) * C, :], 128)

        def r(k):
            return tws[k, :, :]  # (SUB, C)

        P = tuple(r(k) for k in range(8))
        offset, scale = r(8), r(9)
        act = r(COL_VALID) > 0.5

        rec_t0, rec_t1, rec_n, cnt, not_done = lockstep_walk(
            P, offset, scale, act, IT
        )

        scratch[:, :, :] = jnp.zeros(scratch.shape, jnp.float32)
        scratch[0:21, :, :] = tws[0:21, :, :]
        for it in range(IT):
            scratch[21 + it, :, :] = rec_t0[it]
            scratch[21 + IT + it, :, :] = rec_t1[it]
            scratch[21 + 2 * IT + it, :, :] = rec_n[it]
        scratch[col_cnt, :, :] = cnt
        scratch[col_ovf, :, :] = not_done.astype(f32)
        for j in range(SUB):
            out_ref[j * C : (j + 1) * C, :] = _transpose_mxu(
                scratch[:, j, :], C
            )

    return pl.pallas_call(
        kernel,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec((SUB * C, 128), lambda c: (c, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((SUB * C, 128), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_super * SUB * C, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((128, SUB, C), jnp.float32),
            pltpu.VMEM((128, SUB, C), jnp.float32),
        ],
        interpret=interpret,
    )


def flatten_lockstep_expansion(xp, table21, valid, IT, EC, n_paths_cap, caps):
    """Lockstep walk + Euler line expansion, both as Pallas kernels.

    table21: [NW, 21] f32 combined pass-A/pass-B work table
        (flatten_stage's rowsA ++ rowsB).
    valid:   [NW] bool work-item mask.
    Returns (x0, y0, x1, y1 f32[EC], path i32[EC], valid bool[EC],
             e_total incl. clamped slots, e_real actual line count,
             overflow bool).
    """
    interpret = bool(caps.get("_expand_interpret", False))
    NW = table21.shape[0]
    C = LOCKSTEP_CHUNK
    Wexp = EXPAND_SUB * EXPAND_CHUNK + 2 * _WIN_PAD
    Rp = -(-(NW + Wexp) // (EXPAND_SUB * C)) * (EXPAND_SUB * C)
    n_chunks = Rp // C

    # Concat construction (no scatters: column/row padding is pure
    # bandwidth and fuses; .at[slice].set lowers to scatter launches).
    body = xp.concatenate(
        [table21, valid.astype(xp.float32)[:, None],
         xp.zeros((NW, 128 - 22), dtype=xp.float32)],
        axis=1,
    )
    tab_in = xp.concatenate(
        [body, xp.zeros((Rp - NW, 128), dtype=xp.float32)], axis=0
    )

    call = make_lockstep_call(IT, n_chunks, C, interpret=interpret)
    tab = call(tab_in)
    return _expand_record_table(xp, tab, NW, IT, EC, n_paths_cap, interpret)


def _expand_record_table(xp, tab, NW, IT, EC, n_paths_cap, interpret):
    Rp = tab.shape[0]
    col_cnt = 22 + 3 * IT
    cnt = tab[:NW, col_cnt]
    wn = cnt.astype(xp.int32)
    e_real = xp.sum(wn)
    overflow = xp.sum(tab[:NW, 23 + 3 * IT]) > 0.0

    incl = xp.cumsum(xp.maximum(wn, 1))
    e_total = incl[NW - 1] if NW > 0 else xp.int32(0)
    col_incl = 21 + 3 * IT
    incl_full = xp.concatenate(
        [incl.astype(xp.float32), xp.full(Rp - NW, 3e38, dtype=xp.float32)]
    )
    tab = xp.concatenate(
        [tab[:, :col_incl], incl_full[:, None], tab[:, col_incl + 1 :]],
        axis=1,
    )

    n_exp_chunks = EC // EXPAND_CHUNK
    starts = xp.searchsorted(
        incl, xp.arange(n_exp_chunks, dtype=incl.dtype) * EXPAND_CHUNK,
        side="right",
    ).astype(xp.int32)
    ws = (xp.maximum(starts - 8, 0) // 8 * 8).astype(xp.int32)

    exp_call = make_expand_call(col_incl, 6, n_exp_chunks,
                                _euler_compute(IT, n_paths_cap),
                                interpret=interpret)
    out = exp_call(ws, tab)
    return (out[0], out[1], out[2], out[3], out[4].astype(xp.int32),
            out[5] > 0.0, e_total, e_real, overflow)
