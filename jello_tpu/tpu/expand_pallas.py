"""Pallas expand-transform kernels: data-dependent expansion as a
chunked streaming sweep.

The geometry pipeline repeatedly expands R records into sum(counts)
outputs (lines -> tile crossings, lines -> backdrop rows, Euler records
-> lines; reference: the indirect dispatches of path_count.wgsl /
path_tiling.wgsl and flatten's line emission). The XLA formulation
(pipeline/flatten.py::expand_by_counts) costs one scatter + cummax +
cumsum + a wide row gather per expansion — each a random-access op over
megarow arrays, the dominant cost of the frame on TPU.

This kernel streams the same computation with only contiguous memory
traffic:

  - XLA precomputes incl = cumsum(max(counts, 1)). Clamping counts to
    >= 1 makes every record own at least one output slot, so the
    records owning any C consecutive outputs are <= C consecutive table
    rows — each grid step needs ONE aligned sublane-window DMA of the
    parameter table, no matter how counts are distributed. (Zero-count
    records own one dead output each, flushed to a sentinel later;
    capacity stats account for them.)
  - Per chunk, each output's owning record is found with a (W, C)
    comparison matrix against the windowed inclusive prefix (#{incl <=
    j} — a vectorized lower_bound), and ALL record parameters land on
    lanes with one MXU matmul: win[W, 128]^T-contracted against the
    one-hot (W, C) -> params (128, C). The per-output transform then
    runs as (1, C) lane-vector arithmetic.
  - Outputs leave through a (No, C) output block per chunk (row p =
    output field p), which XLA slices back into 1-D streams.

The transform body is a plug-in, so one kernel shape serves the
crossing/clip expansion, the backdrop-row expansion, and the Euler line
expansion.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Chunk geometry. C outputs per sub-chunk; each grid step processes
# SUB sub-chunks on (SUB, C) blocks — the compute body then runs on
# full (8, 128)-shaped VPU registers instead of (1, C) lane rows (1/8
# sublane utilization, the measured cause of the geometry-megakernel
# regression; BASELINE.md round-3). The table window holds
# SUB*C + 32 rows: one aligned DMA per grid step covers all SUB
# sub-windows (counts >= 1 per owning row bounds the span).
EXPAND_CHUNK = 512
# JELLO_EXPAND_SUB: A/B knob for the sublane batch factor (compile-time
# vs runtime trade: bigger SUB = fuller VPU sublanes but an 8x-unrolled
# kernel body that XLA takes longer to compile).
import os as _os

EXPAND_SUB = int(_os.environ.get("JELLO_EXPAND_SUB", "8"))
if EXPAND_SUB < 1:
    raise ValueError(
        f"JELLO_EXPAND_SUB must be >= 1 (got {EXPAND_SUB}); it is the "
        "sublane batch factor of the expand/lockstep/geometry kernels"
    )
_WIN_PAD = 16

# Reserved parameter-table columns (appended after the caller's).
# incl (inclusive prefix of clamped counts) and the raw count.
COL_INCL = 0  # relative to the end: win[:, Wt], win[:, Wt+1]


def _expand_table_from_incl(xp, cols, counts, incl):
    """The table-construction half of build_expand_table, for callers
    that computed the (clamped-count) inclusive prefix themselves (e.g.
    riding a merged cumsum launch)."""
    cols = list(cols) + [incl.astype(xp.float32), counts.astype(xp.float32)]
    assert len(cols) <= 128
    table = xp.stack(cols, axis=1)
    ncol = table.shape[1]
    W = EXPAND_SUB * EXPAND_CHUNK + 2 * _WIN_PAD
    pad = xp.concatenate(
        [
            xp.zeros((W, len(cols) - 2), dtype=xp.float32),
            xp.full((W, 1), 3e38, dtype=xp.float32),
            xp.zeros((W, 1), dtype=xp.float32),
        ],
        axis=1,
    )
    table = xp.concatenate([table, pad], axis=0)
    if ncol < 128:
        table = xp.concatenate(
            [table, xp.zeros((table.shape[0], 128 - ncol), dtype=xp.float32)],
            axis=1,
        )
    return table


def build_expand_table(xp, cols, counts, out_cap, chunk=EXPAND_CHUNK,
                       assume_compact=False):
    """XLA-side preparation for expand_call.

    cols: list of [R] f32 arrays (parameter columns; values must be
        exactly representable in f32 — integers < 2^24).
    counts: [R] i32 outputs per record (>= 0).
    assume_compact: the caller guarantees counts > 0 for a prefix of
        rows and == 0 for the rest (records pre-compacted to nonzero
        counts). Skips the >= 1 clamp, so total1 == sum(counts) exactly
        and the output stream carries no dead slots. The window-span
        bound still holds: every row that owns any output owns >= 1,
        and the zero tail owns nothing (outputs past the total resolve
        to pad rows and come back invalid).
    Returns (table [Rp, 128] f32, win_start [n_chunks] i32,
             total1, n_chunks) where total1 counts clamped (>=1) slots
    (== real outputs under assume_compact).
    """
    R = counts.shape[0]
    counts1 = counts if assume_compact else xp.maximum(counts, 1)
    incl = xp.cumsum(counts1.astype(xp.int64) if not _is_jax(xp) else counts1)
    total1 = incl[R - 1]
    n_chunks = out_cap // chunk
    assert out_cap % chunk == 0

    cols = list(cols) + [incl.astype(xp.float32), counts.astype(xp.float32)]
    assert len(cols) <= 128
    table = xp.stack(cols, axis=1)  # [R, n_cols]
    ncol = table.shape[1]
    W = EXPAND_SUB * chunk + 2 * _WIN_PAD
    # Pad rows so every window DMA is in bounds; padded incl = +inf so
    # padded rows never win the ownership count.
    pad = xp.concatenate(
        [
            xp.zeros((W, len(cols) - 2), dtype=xp.float32),
            xp.full((W, 1), 3e38, dtype=xp.float32),
            xp.zeros((W, ncol - len(cols) + 1), dtype=xp.float32),
        ],
        axis=1,
    )
    table = xp.concatenate([table, pad], axis=0)
    # Lane-pad columns to 128.
    if ncol < 128:
        table = xp.concatenate(
            [table, xp.zeros((table.shape[0], 128 - ncol), dtype=xp.float32)],
            axis=1,
        )

    # Window starts: owner of output c*chunk, 8-aligned with one row of
    # backward slack.
    starts = xp.searchsorted(incl, xp.arange(n_chunks, dtype=incl.dtype) * chunk,
                             side="right").astype(xp.int32)
    win_start = xp.maximum(starts - 8, 0) // 8 * 8
    return table, win_start.astype(xp.int32), total1, n_chunks


def _is_jax(xp):
    return xp.__name__.startswith("jax")


def make_expand_call(n_cols, n_out, n_chunks, compute, chunk=EXPAND_CHUNK,
                     interpret=False, sub=EXPAND_SUB):
    """Build the pallas_call.

    compute(p, j, within, valid) -> list of n_out (SUB, C) f32 arrays,
      where p(k) returns parameter column k as a (SUB, C) array, j is
      the global output index (f32), within the index within the
      record, valid a {0,1} f32 mask (0 for clamped dead slots / tail).

    Each grid step covers SUB consecutive C-output sub-chunks: one
    window DMA (the sub-windows of consecutive chunks overlap, so the
    union is <= SUB*C + 32 rows), one ownership one-hot + MXU param
    landing per sub-chunk into a (128, SUB, C) scratch, and the
    transform body on (SUB, C) blocks — full VPU shape. Output layout
    (n_out, n_super, SUB, C) is row-major in the global output index,
    so a reshape to (n_out, N) needs no transpose.
    """
    C = chunk
    SUB = sub
    # Per-sub-chunk window: ws[c] >= owner(c*C) - 15 and the chunk's
    # owners end <= owner(c*C) + C, so C + 16 rows cover it (the
    # original single-chunk bound). Super-window: rel offsets are
    # bounded by (SUB-1)*C + 15, so SUB*C + 32 rows cover every
    # sub-window slice.
    Wc = C + _WIN_PAD              # per-sub-chunk window rows
    W = SUB * C + 2 * _WIN_PAD     # super-window rows (one DMA)
    col_incl = n_cols
    col_cnt = n_cols + 1
    n_super = -(-n_chunks // SUB)

    def kernel(win_start_s, tab_hbm, out_ref, win, params, sem):
        c = pl.program_id(0)
        c0 = jnp.minimum(c * SUB, n_chunks - 1)
        ws0 = pl.multiple_of(win_start_s[c0], 8)
        dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(ws0, W), :], win, sem)
        dma.start()
        dma.wait()

        for j in range(SUB):
            cj = jnp.minimum(c * SUB + j, n_chunks - 1)
            rel = pl.multiple_of(win_start_s[cj] - ws0, 8)
            sub_win = win[pl.ds(rel, Wc), :]  # (Wc, 128)
            jf_row = (
                jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) + cj * C
            ).astype(jnp.float32)
            incl_col = sub_win[:, col_incl : col_incl + 1]  # (Wc, 1)
            # Vectorized lower_bound: local owner index = #{incl <= j}.
            lam = jnp.sum(
                (incl_col <= jf_row).astype(jnp.int32), axis=0, keepdims=True
            )  # (1, C) i32
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (Wc, C), 0)
            onehot = (iota_w == lam).astype(jnp.float32)  # (Wc, C)
            params[:, j, :] = jax.lax.dot_general(
                sub_win, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (128, C): row k = column k of the table, per output

        def p(k):
            return params[k, :, :]  # (SUB, C)

        # Global output index per (sub-chunk, lane).
        jf = (
            jax.lax.broadcasted_iota(jnp.int32, (SUB, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (SUB, C), 1)
            + c * SUB * C
        ).astype(jnp.float32)
        incl_o = p(col_incl)
        cnt_o = p(col_cnt)
        cnt1_o = jnp.maximum(cnt_o, 1.0)
        within = jf - (incl_o - cnt1_o)
        # within < 0 happens for outputs past the last real record
        # (ownership resolves to an inf-prefix pad row).
        valid = ((within >= 0.0) & (within < cnt_o)).astype(jnp.float32)

        outs = compute(p, jf, within, valid)
        for k in range(n_out):
            out_ref[k, 0, :, :] = outs[k]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # table (HBM)
        ],
        out_specs=pl.BlockSpec((n_out, 1, SUB, C), lambda c, s: (0, c, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((W, 128), jnp.float32),
            pltpu.VMEM((128, SUB, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, n_super, SUB, C), jnp.float32),
        interpret=interpret,
    )

    def run(ws, tab):
        out = call(ws, tab)
        # Row-major (super, sub, lane) == global output order.
        return out.reshape(n_out, n_super * SUB * C)[:, : n_chunks * C]

    return run


def _crossing_compute(T):
    """Transform body for the lines -> tile crossings expansion: the DDA
    walk of path_count.wgsl fused with path_tiling.wgsl's tile-relative
    segment clipping (column layout = tiling.py's P table)."""

    def compute(p, j, within, valid):
        from ..pipeline.tiling import _tile_clip_segments

        imin = p(0)
        a, b, sign = p(1), p(2), p(3)
        y0i, x0f = p(4), p(5)
        bb0, bb1, bb2 = p(6), p(7), p(8)
        stride, tiles_base = p(9), p(10)
        s0y, delta = p(11), p(12)

        ci = imin + within
        z = jnp.floor(a * ci + b)
        cy = y0i + ci - z
        cx = x0f + sign * z
        cbase = tiles_base + (cy - bb1) * stride - bb0
        last_z = jnp.floor(a * (ci - 1.0) + b)
        top_edge = jnp.where(ci == 0.0, (y0i == s0y).astype(jnp.float32),
                             (last_z == z).astype(jnp.float32))
        ok = valid > 0.0
        bump_ok = (top_edge > 0.0) & (cx + 1.0 < bb2) & ok
        x_bump = jnp.maximum(cx + 1.0, bb0)
        bump_slot = jnp.where(bump_ok, cbase + x_bump, jnp.float32(T))
        bump_delta = jnp.where(bump_ok, delta, 0.0)
        tile_slot = jnp.where(ok, cbase + cx, jnp.float32(T))

        ls_c = {
            "a": a, "b": b, "sign": sign, "y0i": y0i, "x0f": x0f,
            "xy0x": p(14), "xy0y": p(15), "xy1x": p(16), "xy1y": p(17),
            "is_down": p(18) > 0.5, "count": p(19),
            "is_positive": p(20) > 0.5,
        }
        seg = _tile_clip_segments(jnp, ls_c, ci, z, last_z, cx, cy)
        # Dead/clamped slots can compute NaN/inf from pad-row params;
        # they must not leak into payloads (NaN * 0 poisons coverage
        # sums downstream).
        def mask(v):
            return jnp.where(ok, v, 0.0)

        return [
            tile_slot,
            mask(seg["seg_x0"]), mask(seg["seg_y0"]),
            mask(seg["seg_x1"]), mask(seg["seg_y1"]),
            jnp.where(ok, seg["seg_y_edge"], 1e9),
            bump_slot, jnp.where(bump_ok, delta, 0.0),
        ]

    return compute


def _row_compute(T):
    """Transform body for the lines -> backdrop-row expansion
    (backdrop_dyn.wgsl's winding deltas at each crossed tile row)."""

    def compute(p, j, within, valid):
        ymin, tiles_base, bb1, stride, delta = p(0), p(1), p(2), p(3), p(4)
        r_y = ymin + within
        r_slot = tiles_base + (r_y - bb1) * stride
        ok = valid > 0.0
        return [
            jnp.where(ok, r_slot, jnp.float32(T)),
            jnp.where(ok, delta, 0.0),
        ]

    return compute


def _euler_compute(IT, sentinel_path):
    """Transform body for the Euler-record -> line expansion: the
    per-work-item records ride the table as 3*IT columns (t0/t1/n per
    lockstep iteration); the owning record is found with a static
    prefix walk over the iterations, and the line endpoint math
    (euler_line_points) runs on kernel-safe transcendentals
    (tpu/kmath.py). Chaining (line start = previous line's end within
    the work item) re-evaluates at within-1 instead of communicating
    across lanes."""

    def compute(p, j, within, valid):
        from ..pipeline.flatten import euler_line_points
        from .kmath import kernel_xp

        kxp = kernel_xp()
        P8 = tuple(p(k) for k in range(8))
        off, scale = p(8), p(9)
        tsx, tsy, tex, tey = p(10), p(11), p(12), p(13)
        T6 = [p(14 + k) for k in range(6)]
        path = p(20)

        def rec_at(w):
            zero = jnp.zeros_like(w)
            acc, t0, t1, n, wr = zero, zero, zero, zero, zero
            for it in range(IT):
                n_it = p(21 + 2 * IT + it)
                hi = acc + n_it
                sel = (w >= acc) & (w < hi)
                t0 = jnp.where(sel, p(21 + it), t0)
                t1 = jnp.where(sel, p(21 + IT + it), t1)
                n = jnp.where(sel, n_it, n)
                wr = jnp.where(sel, w - acc, wr)
                acc = hi
            return t0, t1, n, wr

        t0, t1, n, wr = rec_at(within)
        lx1, ly1 = euler_line_points(
            kxp, P8, t0, t1, wr, n, off, scale, tex, tey
        )
        wprev = jnp.maximum(within - 1.0, 0.0)
        t0p, t1p, np_, wrp = rec_at(wprev)
        px, py = euler_line_points(
            kxp, P8, t0p, t1p, wrp, np_, off, scale, tex, tey
        )
        first = within < 0.5
        lp0x = jnp.where(first, tsx, px)
        lp0y = jnp.where(first, tsy, py)
        swap = off < 0.0
        ex0 = jnp.where(swap, lx1, lp0x)
        ey0 = jnp.where(swap, ly1, lp0y)
        ex1 = jnp.where(swap, lp0x, lx1)
        ey1 = jnp.where(swap, lp0y, ly1)
        dx0 = T6[0] * ex0 + T6[2] * ey0 + T6[4]
        dy0 = T6[1] * ex0 + T6[3] * ey0 + T6[5]
        dx1 = T6[0] * ex1 + T6[2] * ey1 + T6[4]
        dy1 = T6[1] * ex1 + T6[3] * ey1 + T6[5]
        ok = valid > 0.0

        def mask(v):
            return jnp.where(ok, v, 0.0)

        pout = jnp.where(ok, path, jnp.float32(sentinel_path))
        return [mask(dx0), mask(dy0), mask(dx1), mask(dy1), pout, valid]

    return compute


def flatten_euler_expansion(xp, table21, rec_t0, rec_t1, rec_n, counts,
                            EC, IT, n_paths_cap, caps):
    """Euler record -> line expansion as one Pallas sweep.

    table21: [R, 21] per-work-item parameter table (flatten_stage's
        combined pass-a/pass-b table).
    rec_t0/rec_t1/rec_n: [IT, R] f32 lockstep records.
    counts: [R] i32 per-work-item line totals (sum of rec_n).
    Returns (x0, y0, x1, y1 f32[EC], path i32[EC], valid bool[EC],
    e_total incl. clamped slots)."""
    interpret = bool(caps.get("_expand_interpret", False))
    cols = [table21[:, k] for k in range(21)]
    cols += [rec_t0[it] for it in range(IT)]
    cols += [rec_t1[it] for it in range(IT)]
    cols += [rec_n[it] for it in range(IT)]
    tab, ws, e_total, n_chunks = build_expand_table(xp, cols, counts, EC)
    call = make_expand_call(len(cols), 6, n_chunks,
                            _euler_compute(IT, n_paths_cap),
                            interpret=interpret)
    out = call(ws, tab)
    return (out[0], out[1], out[2], out[3],
            out[4].astype(xp.int32), out[5] > 0.0, e_total)


def path_count_expansions(xp, P, PRT, n_cross, n_rows, T, caps,
                          assume_compact=False):
    """Run both path_count expansions as Pallas streaming sweeps.

    P:   [L, 21] f32 per-line DDA/clip parameter table (tiling.py).
    PRT: [L, 5] f32 per-line backdrop-row parameters.
    assume_compact: rows of P / PRT are pre-compacted to nonzero counts
        (tiling.py), so the >=1 window clamp is skipped and the output
        streams carry no one-dead-slot-per-line inflation.
    Returns (tile_slot i32[SC], seg_pre dict of f32[SC], bump_slot
    i32[SC], bump_delta i32[SC], r_slot i32[RC], r_delta i32[RC],
    c_total, r_total) where the totals count clamped (>=1) slots
    (exact totals under assume_compact).
    """
    SC = caps["seg_cap"]
    RC = caps["row_cap"]
    interpret = bool(caps.get("_expand_interpret", False))

    # Both tables' prefix cumsums AND window-start searches ride one
    # launch each (concat + static-offset rebase; the row block's keys
    # and queries shift by 2^30 so one searchsorted serves both).
    Lc = n_cross.shape[0]
    Lr = n_rows.shape[0]
    c1 = n_cross if assume_compact else xp.maximum(n_cross, 1)
    r1 = n_rows if assume_compact else xp.maximum(n_rows, 1)
    cc = xp.cumsum(xp.concatenate([c1, r1]))
    incl_c = cc[:Lc]
    incl_r = cc[Lc:] - cc[Lc - 1]
    c_total = incl_c[Lc - 1]
    r_total = incl_r[Lr - 1]
    n_chunks = SC // EXPAND_CHUNK
    rn_chunks = RC // EXPAND_CHUNK
    BIGQ = xp.int32(1 << 30)
    q = xp.concatenate([
        xp.arange(n_chunks, dtype=xp.int32) * EXPAND_CHUNK,
        BIGQ + xp.arange(rn_chunks, dtype=xp.int32) * EXPAND_CHUNK,
    ])
    keys = xp.concatenate([incl_c, BIGQ + incl_r])
    starts2 = xp.searchsorted(keys, q, side="right").astype(xp.int32)
    ws = xp.maximum(starts2[:n_chunks] - 8, 0) // 8 * 8
    rws = xp.maximum(starts2[n_chunks:] - Lc - 8, 0) // 8 * 8

    cols = [P[:, k] for k in range(P.shape[1])]
    tab = _expand_table_from_incl(xp, cols, n_cross, incl_c)
    call = make_expand_call(len(cols), 8, n_chunks,
                            _crossing_compute(T), interpret=interpret)
    out = call(ws, tab)
    tile_slot = out[0].astype(xp.int32)
    seg_pre = {
        "seg_x0": out[1], "seg_y0": out[2],
        "seg_x1": out[3], "seg_y1": out[4],
        "seg_y_edge": out[5],
    }
    bump_slot = out[6].astype(xp.int32)
    bump_delta = out[7].astype(xp.int32)

    rcols = [PRT[:, k] for k in range(PRT.shape[1])]
    rtab = _expand_table_from_incl(xp, rcols, n_rows, incl_r)
    rcall = make_expand_call(len(rcols), 2, rn_chunks,
                             _row_compute(T), interpret=interpret)
    rout = rcall(rws, rtab)
    r_slot = rout[0].astype(xp.int32)
    r_delta = rout[1].astype(xp.int32)
    return (tile_slot, seg_pre, bump_slot, bump_delta, r_slot, r_delta,
            c_total, r_total)
