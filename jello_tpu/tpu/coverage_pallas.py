"""Pallas coverage kernel: per-rank fill coverage as a streaming
segmented sum.

Replaces the XLA chunked coverage loop (pipeline/coverage.py) on
device. The rank-sorted segment stream (segments of coverage-row r are
contiguous, rows non-decreasing) streams through VMEM in C-segment
blocks; each block's per-row sums come from ONE MXU matmul against the
local-row one-hot (a segmented sum — no cumsum, no scatter), rows
spanning block boundaries accumulate through a carry, and completed
rows leave with one contiguous window write. Rows are written by every
block that touches them; the last write (the completing one) wins —
grid steps execute in order on TPU.

Antialiasing modes (fine.wgsl's fine_area vs fine_msaa8/16 as ONE
kernel shape):
  - area: sums are the analytic trapezoid winding (fine.wgsl:824-864);
    the output row is raw winding + backdrop, and the fine kernels
    apply the fill rule per record (unchanged semantics).
  - msaa8/msaa16: sums are exact per-sample winding (the zero-width
    limit of the area math, pipeline/fine_ref.py::_seg_winding)
    against the reference's sample patterns (renderer/mask.go); the
    output row is the RESOLVED coverage mean_s(rule(round(w_s + bd)))
    in [0,1], and the fine kernels consume it directly (resolved mode).
    This replaces the reference's LUT + SWAR shared-memory scheme
    (fine.wgsl:125-711) with exact winding — same pixels, vector math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pipeline import ops
from ..pipeline.coverage import rank_records, sort_segments_by_rank

_SLACK = 16


def _chunk_for_mode(aa):
    import os

    env = os.environ.get("JELLO_COV_CHUNK", "")
    if env:
        # A/B knob: the kernel's (C, CS) one-hot segmented-sum matmul
        # is QUADRATIC in C (CS = C + slack), so smaller chunks cut
        # MXU work per segment; per-chunk DMA/grid overhead pushes the
        # other way. Tune on-chip.
        return int(env)
    if aa == "msaa16":
        return 128
    if aa == "msaa8":
        return 256
    # Area default measured on chip (round 5): C=128 = 11.1 ms vs
    # C=512 = 13.1 ms for the kernel (fine stage 61.7 -> 58.8).
    return 128


def make_coverage_kernel(AR_out, n_chunks, C, offsets, interpret=False):
    """offsets: None for area mode, else list of (ox, oy) sample
    offsets (static floats)."""
    CS = C + _SLACK
    S = 1 if offsets is None else len(offsets)

    def kernel(row0_s, stream_ref, bd_ref, out_hbm, stage, outbuf2, carry,
               crow_s, bdwin2, sem_bd, sem_out):
        c = pl.program_id(0)
        # Two-buffer DMA pipeline: chunk c+1's backdrop window streams
        # in during chunk c's compute (per-chunk first-row indices ride
        # scalar prefetch), and the output flush of chunk c-1 is waited
        # only after chunk c's compute. Consecutive output windows
        # OVERLAP (open rows are rewritten by the completing block), so
        # at most one out-DMA is in flight to preserve write order.
        parity = jax.lax.rem(c, 2)

        def bd_copy(j, slot):
            jc = jnp.minimum(j, n_chunks - 1)
            r8 = pl.multiple_of((row0_s[jc] // 8) * 8, 8)
            return pltpu.make_async_copy(
                bd_ref.at[pl.ds(r8, CS + 8), :], bdwin2.at[slot],
                sem_bd.at[slot],
            )

        @pl.when(c == 0)
        def _():
            crow_s[0] = -1
            carry[...] = jnp.zeros((S, 1, 256), jnp.float32)
            bd_copy(0, 0).start()

        @pl.when(c + 1 < n_chunks)
        def _():
            bd_copy(c + 1, 1 - parity).start()

        blk = stream_ref[...]  # (C, 8)
        sx0 = blk[:, 0:1]
        sy0 = blk[:, 1:2]
        sx1 = blk[:, 2:3]
        sy1 = blk[:, 3:4]
        sye = blk[:, 4:5]
        rows_f = blk[:, 5:6]
        valid = blk[:, 6:7]

        rows_i = rows_f.astype(jnp.int32)  # (C, 1)
        row0 = rows_i[0, 0]
        row_last = rows_i[C - 1, 0]
        local = rows_i - row0  # (C, 1), in [0, C)

        # Backdrop/rule window for the rows this block can complete.
        row0_8 = pl.multiple_of((row0 // 8) * 8, 8)
        d = row0 - row0_8

        # Pixel-center coordinates.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        px = (lane % 16).astype(jnp.float32)
        py = (lane // 16).astype(jnp.float32)

        # Local-row one-hot (C, CS): M[j, r] = (local_j == r); the
        # segmented sum is one MXU contraction over j per sample.
        iota_cs = jax.lax.broadcasted_iota(jnp.int32, (C, CS), 1)
        M = (iota_cs == local).astype(jnp.float32)

        merge = (crow_s[0] == row0).astype(jnp.float32)
        rowmask0 = (
            jax.lax.broadcasted_iota(jnp.int32, (CS, 1), 0) == 0
        ).astype(jnp.float32)

        dx = sx1 - sx0
        dy = sy1 - sy0

        def seg_sum(contrib):
            return jax.lax.dot_general(
                M, contrib, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (CS, 256)

        if offsets is None:
            # Analytic trapezoid area per pixel (fine.wgsl:824-864).
            y = sy0 - py
            y0c = jnp.clip(y, 0.0, 1.0)
            y1c = jnp.clip(y + dy, 0.0, 1.0)
            dyc = y0c - y1c
            safe_dy = jnp.where(dy == 0.0, 1.0, dy)
            t0 = (y0c - y) / safe_dy
            t1 = (y1c - y) / safe_dy
            startx = sx0 - px
            x0 = startx + t0 * dx
            x1 = startx + t1 * dx
            xmin0 = jnp.minimum(x0, x1)
            xmax0 = jnp.maximum(x0, x1)
            xmin = jnp.minimum(xmin0, 1.0) - 1.0e-6
            b = jnp.minimum(xmax0, 1.0)
            cc = jnp.maximum(b, 0.0)
            dd = jnp.maximum(xmin, 0.0)
            a = (b + 0.5 * (dd * dd - cc * cc) - xmin) / (xmax0 - xmin)
            contrib = jnp.where(dyc != 0.0, a * dyc, 0.0)
            contrib = contrib + jnp.sign(dx) * jnp.clip(py - sye + 1.0, 0.0, 1.0)
            contrib = contrib * valid
            sums = seg_sum(contrib)
            sums = jnp.where(rowmask0 > 0.5,
                             sums + merge * carry[0, :, :], sums)
            stage[0, :, :] = sums
        else:
            sgn_dy = jnp.sign(dy)
            sgn_dx = jnp.sign(dx)
            safe_dy = jnp.where(dy == 0.0, 1.0, dy)
            for s, (ox, oy) in enumerate(offsets):
                xs = px + ox
                ys = py + oy
                covered = ((sy0 <= ys) != (sy1 <= ys)).astype(jnp.float32)
                t = (ys - sy0) / safe_dy
                xi = sx0 + t * dx
                left = (xi < xs).astype(jnp.float32)
                w = covered * left * (-sgn_dy)
                w = w + sgn_dx * (ys >= sye).astype(jnp.float32)
                w = w * valid
                sums = seg_sum(w)
                sums = jnp.where(rowmask0 > 0.5,
                                 sums + merge * carry[s, :, :], sums)
                stage[s, :, :] = sums

        bd_copy(c, parity).wait()

        # bdwin rows [d, d+CS) -> (CS, 1): dynamic rotate (sublane
        # slices must start 8-aligned, rotates are unconstrained).
        WB = CS + 8

        bdwin_v = bdwin2.at[parity][...]

        def win_col(col):
            rolled = pltpu.roll(bdwin_v, WB - d, 0)
            return rolled[0:CS, col : col + 1]

        bd_col = win_col(0)  # (CS, 1)

        if offsets is None:
            out_rows = stage[0, :, :] + bd_col
        else:
            # Boolean vector selects don't lower; blend f32 masks.
            eo_f = win_col(1)  # 0/1
            acc = jnp.zeros((CS, 256), jnp.float32)
            for s in range(S):
                wi = jnp.round(stage[s, :, :] + bd_col).astype(jnp.int32)
                in_eo = ((wi & 1) != 0).astype(jnp.float32)
                in_nz = (wi != 0).astype(jnp.float32)
                acc = acc + eo_f * in_eo + (1.0 - eo_f) * in_nz
            out_rows = acc * (1.0 / S)

        # Write the window; rows still open get rewritten (complete) by
        # a later block. The out array is 3-D (rows, 1, 256) so the
        # leading dim is outside the (8, 128) tiling and the DMA offset
        # needs no sublane alignment.
        outbuf2.at[parity][:, 0, :] = out_rows

        def out_copy(j, slot):
            jc = jnp.minimum(j, n_chunks - 1)
            r0 = jnp.minimum(row0_s[jc], AR_out - 1)
            return pltpu.make_async_copy(
                outbuf2.at[slot], out_hbm.at[pl.ds(r0, CS)],
                sem_out.at[slot],
            )

        @pl.when(c >= 1)
        def _():
            out_copy(c - 1, 1 - parity).wait()

        out_copy(c, parity).start()

        @pl.when(c == n_chunks - 1)
        def _():
            out_copy(c, parity).wait()

        # Carry = the last (open) row's per-sample sums; extracted with
        # a one-hot contraction (no dynamic sublane slice).
        last_local = row_last - row0
        oh_last = (
            jax.lax.broadcasted_iota(jnp.int32, (1, CS), 1) == last_local
        ).astype(jnp.float32)
        for s in range(S):
            carry[s, :, :] = jax.lax.dot_general(
                oh_last, stage[s, :, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        crow_s[0] = row_last

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # per-chunk first-row indices (row0s)
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((C, 8), lambda c, s: (c, 0)),          # stream
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),   # bd table
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[
            pltpu.VMEM((S, CS, 256), jnp.float32),      # per-sample sums
            pltpu.VMEM((2, CS, 1, 256), jnp.float32),   # out staging (2-buf)
            pltpu.VMEM((S, 1, 256), jnp.float32),       # carry
            pltpu.SMEM((1,), jnp.int32),                # carry row
            pltpu.VMEM((2, CS + 8, 128), jnp.float32),  # bd windows (2-buf)
            pltpu.SemaphoreType.DMA((2,)),              # bd sems
            pltpu.SemaphoreType.DMA((2,)),              # out sems
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((AR_out + CS, 1, 256), jnp.float32),
        interpret=interpret,
    )


def compute_area_rows_pallas(xp, cmds, counted, caps):
    """Drop-in device replacement for coverage.compute_area_rows.

    Coverage accumulates in SLOT-rank order — the dense rank of
    (path, tile) slots with segments, in slot order, which is exactly
    the order the crossing sort already produced — so the per-rank
    re-sort of the segment stream disappears (rank = a run-boundary
    cumsum over the sorted stream). The finished table is then permuted
    into RECORD-rank order (one [AR]-row gather — rows, not segments)
    for the fine kernels' windowed reads.

    Returns (area_rows [AR + CS, 256], area_row_rec [PC], overflow).
    In MSAA modes the rows are RESOLVED coverage (the fine kernels must
    consume them directly); in area mode they are raw winding +
    backdrop, exactly like the XLA pass."""
    from ..pipeline.fine_ref import sample_offsets
    from ..pipeline.coarse import CMD_BEGIN_CLIP

    AR = caps["area_rows_cap"]
    T = caps["tiles_cap"]
    GRID = caps["tile_grid_cap"]
    aa = caps.get("aa_mode", "area")
    offsets = sample_offsets(aa)
    C = _chunk_for_mode(aa)
    interpret = bool(caps.get("_expand_interpret", False))

    # Slot-rank of each sorted segment: run boundaries of the
    # slot-sorted stream (non-decreasing by construction).
    slot = counted["sorted_slot"]
    SC = slot.shape[0]
    valid_f = (slot < T).astype(xp.float32)
    has = (counted["seg_count"] > 0).astype(xp.int32)

    c_first = counted.get("first_cum")
    if c_first is None:
        # XLA-bincount route: compute the per-segment slot-rank here
        # (rides rank_records' cumsum launch as an SC-length extra).
        prev = xp.concatenate([xp.full(1, -1, slot.dtype), slot[:-1]])
        first = (slot != prev) & (slot >= 0) & (slot < T)
        area_row_rec, slot2rank, bd_tgt, n_rows, (c_first, c_has) = (
            rank_records(xp, cmds, caps,
                         extra=[first.astype(xp.int32), has])
        )
    else:
        # Pallas route: the sorted-run bincount in tiling.py already
        # produced the first_v cumsum — reuse it.
        area_row_rec, slot2rank, bd_tgt, n_rows, (c_has,) = (
            rank_records(xp, cmds, caps, extra=[has])
        )
    srank = xp.clip(c_first - 1, 0, AR - 1)
    n_rows_sr = c_first[-1]
    sr_of_slot = c_has - has

    segs = counted["segs"]
    SCpad = -(-SC // C) * C
    n_chunks = SCpad // C
    stream = xp.stack(
        [
            segs["seg_x0"], segs["seg_y0"], segs["seg_x1"], segs["seg_y1"],
            segs["seg_y_edge"], srank.astype(xp.float32), valid_f,
            xp.zeros(SC, xp.float32),
        ],
        axis=1,
    )
    if SCpad != SC:
        # Padding rides the last real row (clamped sentinel) with
        # valid = 0 (this module is device-only: xp is jnp).
        pad = jnp.zeros((SCpad - SC, 8), dtype=jnp.float32)
        pad = pad.at[:, 5].set(jnp.float32(AR - 1))
        stream = xp.concatenate([stream, pad], axis=0)

    # Per-row backdrop + fill-rule table in slot-rank space
    # ([ARpad, 128]: col 0 backdrop, col 1 even-odd flag of the
    # consuming rule — clip rows resolve nonzero; see fine_pallas).
    tile = cmds["tile"]
    segc = cmds["seg_count"]
    owns = (tile < GRID) & (segc > 0)
    rec_sr = ops.gather_guarded(
        xp, sr_of_slot, xp.clip(cmds["tile_slot"], 0, T - 1)
    )
    ARpad = AR + C + 2 * _SLACK
    tgt_sr = xp.where(owns, xp.minimum(rec_sr, ARpad - 1), ARpad)
    eo_rec = ((cmds["flags"] & 1) != 0) & (cmds["kind"] != CMD_BEGIN_CLIP)
    # Backdrop and even-odd flag ride ONE scatter into a [ARpad, 2]
    # target; the kernel table pads to the 128-lane width by concat.
    bdeo = ops.scatter_set(
        xp, xp.zeros((ARpad, 2), xp.float32), tgt_sr,
        xp.stack([cmds["backdrop"].astype(xp.float32),
                  eo_rec.astype(xp.float32)], axis=1),
    )
    bd_tab = xp.concatenate(
        [bdeo, xp.zeros((ARpad, 126), dtype=xp.float32)], axis=1
    )

    call = make_coverage_kernel(AR, n_chunks, C, offsets, interpret=interpret)
    # Per-chunk first rows (for the kernel's prefetched bd-window and
    # deferred out-flush DMAs; identical to the in-block rows_i[0, 0]).
    row0s = stream[0::C, 5].astype(xp.int32)
    area_sr = call(row0s, stream.reshape(SCpad, 8), bd_tab)
    area_sr = area_sr.reshape(area_sr.shape[0], 256)

    # Gather slot-rank rows into RECORD order directly: record i's row
    # is its slot's (rec_sr); EndClips share their BeginClip's slot so
    # they get a duplicate of its row at their own index. This replaces
    # the previous two-step permute (a [NROWS] src_of scatter + an [AR]
    # rank-space gather + a second record-space gather in fine_v2).
    # Rowless records read row 0 (always written — unwritten pallas-out
    # rows are uninitialized and a NaN row poisons masked math) and are
    # zeroed below.
    needs = area_row_rec >= 0
    NROWS = area_sr.shape[0]
    area = ops.gather_guarded(
        xp, area_sr,
        xp.where(needs, xp.minimum(rec_sr, NROWS - 1), 0),
    )
    area = xp.where(needs[:, None], area, xp.float32(0.0))
    PCn = area_row_rec.shape[0]
    area_row_rec = xp.where(
        needs, xp.arange(PCn, dtype=xp.int32), -1
    )
    # The interpreter kernel DMAs 8-row aligned windows; keep the table
    # a multiple of 8 rows.
    PC8 = -(-PCn // 8) * 8
    if PC8 != PCn:
        area = xp.concatenate(
            [area, xp.zeros((PC8 - PCn, 256), dtype=area.dtype)]
        )

    overflow = (n_rows > AR) | (n_rows_sr > AR)
    return area, area_row_rec, overflow
