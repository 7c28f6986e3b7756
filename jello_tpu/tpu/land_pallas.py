"""Pallas monotone-landing kernel: scatter_set at nondecreasing
positions that advance at most 1 per row.

Every expansion/compaction scatter in the pipeline writes values at
positions that are an exclusive cumsum of small per-row counts — i.e.
nondecreasing, advancing <= 1 per input row (expand_by_counts' marks
scatter, pipeline/tiling.py's nonzero-line compaction index scatter).
On this fabric a top-level XLA scatter costs ~10 ns per *input* row
regardless of how many rows actually land (the r5 trace: 9.4 ms for the
688k-row sa-line marks scatter, 9.9 ms for the 2.1M-row compaction
scatter), so sparse landings pay for every dropped row.

This kernel streams the input table through VMEM windows and lands the
kept rows with two tiny one-hot MXU contractions per 512-row sub-chunk:

    eqrow[w, r]  = (dest_row(pos[r]) - jr0 == w)          (16, 512)
    eqlane[r, l] = (dest_lane(pos[r]) == l)               (512, 128)
    landed_k     = (eqrow * keep * val_k) @ eqlane        (16, 128)

The <=1-per-row advance bounds every sub-chunk's landing span to 512
positions (= 4 output rows of 128 lanes, + alignment slack), so the
landings accumulate into a bounded per-step output window that flushes
with the compact-kernel discipline (two-buffer deferred flush,
overlapping windows resolved later-wins by the sequential grid, 8-row
head carry across steps).

Output guarantee: positions [0, pos_last] are written (landed values,
zeros where nothing landed — matching a zeros-initialised scatter
target); rows beyond the last flush window are UNWRITTEN (garbage).
Callers mask consumption beyond the landed total, as they already do
for the scatter formulation.

Reference semantics: the atomic bump-allocator writes of
path_count.wgsl / flatten.wgsl that these expansions replace.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LAND_SUB = 8          # sub-chunks per grid step
SUB_ROWS = 512        # input rows per sub-chunk
CH = LAND_SUB * SUB_ROWS
SUB_WIN = 16          # output rows a sub-chunk may touch (4 + align slack)
# Step output window: 4096 positions (32 rows) + 8-row base alignment
# slack + SUB_WIN tail.
OUT_ROWS = 56


def _kernel(K, n_super):
    def kernel(pos_sub_s, blk, out_hbm, outbuf2, head, sem_out):
        c = pl.program_id(0)
        parity = jax.lax.rem(c, 2)
        base_row_al = pl.multiple_of(
            pos_sub_s[c * LAND_SUB] // 1024 * 8, 8)

        def out_copy(j, slot):
            jc = jnp.minimum(j, n_super - 1)
            b_al = pl.multiple_of(
                pos_sub_s[jc * LAND_SUB] // 1024 * 8, 8)
            return pltpu.make_async_copy(
                outbuf2.at[slot],
                out_hbm.at[:, pl.ds(b_al, OUT_ROWS)],
                sem_out.at[slot],
            )

        # Rows [base_row_al, prev last landed row] were already flushed
        # by step c-1; this step's flush covers them again, so carry
        # the 8-row head (the alignment bound: both bases are 8-row
        # aligned and the previous step landed nothing past this
        # step's first position).
        prev_base_al = pos_sub_s[jnp.maximum(c - 1, 0) * LAND_SUB] // 1024 * 8
        d8 = pl.multiple_of(base_row_al - prev_base_al, 8)

        outbuf = outbuf2.at[parity]
        prevbuf = outbuf2.at[1 - parity]

        @pl.when(c > 0)
        def _():
            head[...] = prevbuf[:, pl.ds(d8, 8), :]

        outbuf[...] = jnp.zeros((K, OUT_ROWS, 128), jnp.float32)

        @pl.when(c > 0)
        def _():
            outbuf[:, pl.ds(0, 8), :] = head[...]

        for j in range(LAND_SUB):
            sub = blk[pl.ds(j * SUB_ROWS, SUB_ROWS), :]
            pos = sub[:, 0].astype(jnp.int32) - base_row_al * 128
            keep = sub[:, 1]
            jr0 = pl.multiple_of(
                (pos_sub_s[c * LAND_SUB + j] // 1024 * 8)
                - base_row_al, 8)
            drow = pos // 128 - jr0
            dlane = jax.lax.rem(pos, 128)
            iw = jax.lax.broadcasted_iota(jnp.int32, (SUB_WIN, SUB_ROWS), 0)
            eqrow = (iw == drow[None, :]).astype(jnp.float32)   # (16, 512)
            il = jax.lax.broadcasted_iota(jnp.int32, (SUB_ROWS, 128), 1)
            eqlane = (il == dlane[:, None]).astype(jnp.float32)  # (512, 128)
            for k in range(K):
                a = eqrow * (keep * sub[:, 2 + k])[None, :]
                landed = jax.lax.dot_general(
                    a, eqlane, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                               # (16, 128)
                cur = outbuf[k, pl.ds(jr0, SUB_WIN), :]
                outbuf[k, pl.ds(jr0, SUB_WIN), :] = cur + landed

        @pl.when(c >= 1)
        def _():
            out_copy(c - 1, 1 - parity).wait()

        out_copy(c, parity).start()

        @pl.when(c == n_super - 1)
        def _():
            out_copy(c, parity).wait()

    return kernel


def monotone_land(xp, pos, keep, vals, out_len, interpret=False):
    """Land vals[k][r] at position pos[r] for rows with keep[r], into K
    zero-initialised f32 vectors of length out_len.

    Contract: pos is nondecreasing, advances <= 1 per row, and is
    strictly increasing on kept rows (each position lands at most one
    row). Values must be exactly representable in f32 (|v| < 2^24).

    Returns a list of K [out_len] f32 arrays (flattened from the
    kernel's [rows, 128] planes; positions beyond the last flush are
    garbage — mask beyond the landed total).
    """
    K = len(vals)
    R = pos.shape[0]
    Rp = -(-R // CH) * CH
    f32 = xp.float32
    cols = [pos.astype(f32), keep.astype(f32)] + [v.astype(f32) for v in vals]
    table = xp.stack(cols, axis=1)
    if Rp != R:
        # Pad with the last position, keep=0: windows stay bounded.
        padrow = xp.concatenate(
            [pos[-1:].astype(f32), xp.zeros(1 + K, dtype=f32)]
        )[None, :]
        table = xp.concatenate(
            [table, xp.broadcast_to(padrow, (Rp - R, 2 + K))])
    n_super = Rp // CH
    out_rows = -(-out_len // 128) + OUT_ROWS + 16
    # Per-sub-chunk landing bases, clamped for overflowing frames
    # (estimate class too small; the retry loop discards the frame).
    pos_sub = xp.minimum(
        table[:: SUB_ROWS, 0], xp.float32(out_len)
    ).astype(xp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_super,),
        in_specs=[pl.BlockSpec((CH, 2 + K), lambda c, s: (c, 0))],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, K, OUT_ROWS, 128), jnp.float32),
            pltpu.VMEM((K, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        _kernel(K, n_super),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, out_rows, 128), jnp.float32),
        interpret=interpret,
    )
    out = call(pos_sub, table)
    return [out[k].reshape(-1)[:out_len] for k in range(K)]
