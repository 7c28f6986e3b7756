"""Pallas stream-compaction kernel: gather the rows of a table whose
count column is nonzero into a dense prefix, preserving order.

The XLA formulation of compaction (pipeline/tiling.py::path_count's
`compact`: exclusive-cumsum positions + a scatter_set of row indices +
a row gather) costs three megarow random-access ops per compaction
(~15 ms for the two path_count compactions on the config5 profile —
random-access rows are the frame's currency at ~10 ns/row). This
kernel streams the same permutation with only contiguous traffic:

  - XLA precomputes the destination position of every row (one
    multi-column cumsum serves counts AND positions for several
    compactions at once) and slices per-sub-chunk scalar bases.
  - Each grid step reads one (CH, NC) input block (static pipeline),
    builds a (512, 520) one-hot of in-window destinations per
    sub-chunk, and lands the kept rows with one MXU contraction:
    out[d, :] = sum_r onehot[r, d] * block[r, :].
  - Accumulated (CH+16, NC) windows flush to HBM at the 8-aligned
    compacted base of the step — consecutive windows overlap and the
    sequential grid makes later writes win, so the zero tail of step c
    is overwritten by step c+1's data.

Flush windows are contiguous from row 0 and each extends CH+32 rows,
so rows [0, n_nz + 25) are always written (data then zeros) — the
expand kernel clamps its window starts under that bound, so no
pre-zeroed output donation is needed (a donated zeros backing measured
~40 ms of XLA zero-fill per frame at [cap, 128]).
Reference semantics: the indirect-dispatch compaction implicit in
path_count.wgsl / path_count_setup.wgsl sizing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .expand_pallas import EXPAND_CHUNK as _EC, EXPAND_SUB as _ES

COMPACT_SUB = 8           # sub-chunks per grid step
SUB_ROWS = 512            # rows per sub-chunk
CH = COMPACT_SUB * SUB_ROWS
# Flush window rows: sized so written coverage always reaches
# n_nz + (OUT_WIN - CH - 7) rows AND at least one full expand-kernel
# super-window (max(CH, EXPAND_SUB*EXPAND_CHUNK) + 32 >= W = ES*EC+32)
# — the expand kernel clamps its window reads under that guarantee, so
# no pre-zeroed output donation is needed even at JELLO_EXPAND_SUB > 8.
OUT_WIN = max(CH, _ES * _EC) + 32


def _kernel(nc, pos_col, cnt_col, n_super):
    # The output table is 128 lanes wide (columns nc..127 zero): Mosaic
    # requires manually-DMA'd HBM slices to be lane-tiling (128)
    # aligned, so a narrow [*, 16] output cannot be window-flushed. The
    # input table stays narrow — it rides the static BlockSpec
    # pipeline, which handles sub-tile widths.
    def kernel(pos_sub_s, blk, out_hbm, outbuf2, head, sem_out):
        c = pl.program_id(0)
        parity = jax.lax.rem(c, 2)
        outbuf = outbuf2.at[parity]
        base = pos_sub_s[c * COMPACT_SUB]
        base_al = pl.multiple_of(base // 8 * 8, 8)

        def out_copy(j, slot):
            jc = jnp.minimum(j, n_super - 1)
            b_al = pl.multiple_of(
                pos_sub_s[jc * COMPACT_SUB] // 8 * 8, 8
            )
            return pltpu.make_async_copy(
                outbuf2.at[slot], out_hbm.at[pl.ds(b_al, OUT_WIN)],
                sem_out.at[slot],
            )

        # This step's aligned window can start up to 7 rows before its
        # first owned output row; those rows hold the PREVIOUS step's
        # last outputs (already flushed, but this flush covers them
        # again). Carry them across the sequential grid: scratch
        # persists between steps, so lift the 8-row head out of the old
        # window before zeroing.
        prev_base_al = pos_sub_s[jnp.maximum(c - 1, 0) * COMPACT_SUB] // 8 * 8
        d8 = pl.multiple_of(base_al - prev_base_al, 8)  # <= CH + 8

        @pl.when(c > 0)
        def _():
            head[...] = outbuf2.at[1 - parity][pl.ds(d8, 8), :]

        outbuf[...] = jnp.zeros((OUT_WIN, 128), jnp.float32)

        @pl.when(c > 0)
        def _():
            outbuf[pl.ds(0, 8), :] = head[...]
        for j in range(COMPACT_SUB):
            pj = pos_sub_s[c * COMPACT_SUB + j]
            w_al = pl.multiple_of((pj - base_al) // 8 * 8, 8)
            sub = blk[pl.ds(j * SUB_ROWS, SUB_ROWS), :]      # (512, NC)
            pos_r = sub[:, pos_col:pos_col + 1]              # (512, 1)
            keep = sub[:, cnt_col:cnt_col + 1] > 0.0
            dest = jnp.where(
                keep,
                pos_r.astype(jnp.int32) - (base_al + w_al),
                -1,
            )
            iota_d = jax.lax.broadcasted_iota(
                jnp.int32, (SUB_ROWS, SUB_ROWS + 16), 1
            )
            onehot = (dest == iota_d).astype(jnp.float32)    # (512, 528)
            landed = jax.lax.dot_general(
                onehot, sub, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                                # (528, NC)
            cur = outbuf[pl.ds(w_al, SUB_ROWS + 16), pl.ds(0, nc)]
            outbuf[pl.ds(w_al, SUB_ROWS + 16), pl.ds(0, nc)] = cur + landed
        # Deferred two-buffer flush (coverage-kernel idiom): wait for
        # flush c-1 only after this step's compute, keep exactly one
        # out-DMA in flight (consecutive windows overlap, so write
        # order must be preserved).
        @pl.when(c >= 1)
        def _():
            out_copy(c - 1, 1 - parity).wait()

        out_copy(c, parity).start()

        @pl.when(c == n_super - 1)
        def _():
            out_copy(c, parity).wait()

    return kernel


def compact_rows(xp, table, pos_col, cnt_col, pos_excl, cap,
                 interpret=False):
    """Compact table rows with counts > 0 into a dense prefix.

    table: [Lp, NC] f32, Lp a multiple of 4096 (caller pads), NC <= 128.
        Column pos_col holds each row's exclusive compacted position
        (f32 exact int, = cumsum(count > 0) - keep), column cnt_col the
        count deciding keep.
    pos_excl: [Lp] f32 — the same positions as a standalone array
        (sliced for the per-sub-chunk scalar bases).
    cap: nominal compacted capacity; the output has cap + OUT_WIN + 16
        rows so every flush and every downstream window DMA stays in
        bounds. Rows [n_nz, n_nz + 25) are guaranteed zeros; rows
        beyond the last flush window are UNWRITTEN — consumers must
        clamp window reads under n_nz + 24 (tiling._path_count_raw
        does).

    Returns out [cap + OUT_WIN + 16, 128] f32 (lanes NC..127 zero).
    """
    Lp, NC = table.shape
    assert Lp % CH == 0, Lp
    n_super = Lp // CH
    cap_out = cap + OUT_WIN + 16
    # Per-sub-chunk compacted bases, clamped so an overflowing frame
    # (total > cap: estimate class too small, retry discards) still
    # flushes in bounds.
    pos_sub = xp.minimum(
        pos_excl[:: SUB_ROWS], xp.float32(cap)
    ).astype(xp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec((CH, NC), lambda c, s: (c, 0)),       # table
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, OUT_WIN, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        _kernel(NC, pos_col, cnt_col, n_super),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap_out, 128), jnp.float32),
        interpret=interpret,
    )
    return call(pos_sub, table)
