"""Batched fill-coverage pass.

Computes, for every (path, tile) slot that has segments, the raw
analytic winding of all 256 pixels (fine.wgsl:824-864: trapezoid areas
plus y_edge terms, plus the tile backdrop), as a dense [AR, 256] f32
"area row" table. The fine kernel then just fetches its command's row
and applies the fill rule — the irregular per-tile segment loop becomes
one regular chunked sweep over the (already tile-sorted) segment
stream, which is the TPU-native formulation.
"""

from __future__ import annotations

from . import ops

COVERAGE_CHUNK = 1024


def compute_area_rows(xp, counted, segs, caps):
    """Returns (area_rows [AR+1, 256] f32, overflow).

    Row indices are `counted["row_of_slot"][slot]` for slots with
    segments; rows include the slot's backdrop winding.
    """
    AR = caps["area_rows_cap"]
    SC = segs["seg_x0"].shape[0]
    CH = COVERAGE_CHUNK
    f32 = xp.float32

    # Per-segment target row.
    slot = counted["sorted_slot"]
    T = counted["seg_count"].shape[0]
    valid = slot < T
    row = xp.where(
        valid, ops.gather_guarded(xp, counted["row_of_slot"], slot), AR
    ).astype(xp.int32)
    row = xp.where(row < AR, row, AR)

    # Materialize loop inputs (prevents re-running path_tiling inside
    # every chunk iteration via fusion).
    sx0a, sy0a, sx1a, sy1a, syea, row = ops.barrier(
        xp,
        segs["seg_x0"], segs["seg_y0"], segs["seg_x1"], segs["seg_y1"],
        segs["seg_y_edge"], row,
    )
    segs = {
        "seg_x0": sx0a, "seg_y0": sy0a, "seg_x1": sx1a, "seg_y1": sy1a,
        "seg_y_edge": syea,
    }

    # Pixel coordinate constants.
    p = xp.arange(256, dtype=xp.int32)
    lx = (p % 16).astype(f32)[None, :]
    ly = (p // 16).astype(f32)[None, :]

    # Table rows: AR real rows, 1 drop row, CH unique dump rows for the
    # MXU-segmented accumulation (see body()).
    area = xp.zeros((AR + 1 + CH, 256), dtype=f32)
    ar_ids = xp.arange(CH, dtype=xp.int32)

    n_chunks = (SC + CH - 1) // CH

    def body(c, area):
        base = c * CH
        sl = lambda a: jax_dynamic_slice(xp, a, base, CH)
        sx0 = sl(segs["seg_x0"])[:, None]
        sy0 = sl(segs["seg_y0"])[:, None]
        sx1 = sl(segs["seg_x1"])[:, None]
        sy1 = sl(segs["seg_y1"])[:, None]
        sye = sl(segs["seg_y_edge"])[:, None]
        rows = sl(row)
        dx = sx1 - sx0
        dy = sy1 - sy0
        y = sy0 - ly
        y0c = xp.clip(y, 0.0, 1.0)
        y1c = xp.clip(y + dy, 0.0, 1.0)
        dyc = y0c - y1c
        safe_dy = xp.where(dy == 0.0, f32(1.0), dy)
        t0 = (y0c - y) / safe_dy
        t1 = (y1c - y) / safe_dy
        startx = sx0 - lx
        x0 = startx + t0 * dx
        x1 = startx + t1 * dx
        xmin0 = xp.minimum(x0, x1)
        xmax0 = xp.maximum(x0, x1)
        xmin = xp.minimum(xmin0, 1.0) - 1.0e-6
        b = xp.minimum(xmax0, 1.0)
        cc = xp.maximum(b, 0.0)
        d = xp.maximum(xmin, 0.0)
        a = (b + 0.5 * (d * d - cc * cc) - xmin) / (xmax0 - xmin)
        contrib = xp.where(dyc != 0.0, a * dyc, 0.0)
        contrib = contrib + xp.sign(dx) * xp.clip(ly - sye + 1.0, 0.0, 1.0)

        # Segmented accumulation without duplicate-index scatter: rows
        # within a chunk are sorted, so group segments by their rank
        # (first-occurrence position) with a one-hot matmul on the MXU,
        # then scatter the per-rank sums to *unique* target rows (ranks
        # that are not first occurrences carry all-zero sums and go to
        # per-chunk dump rows).
        ranks = xp.searchsorted(rows, rows, side="left").astype(xp.int32)
        onehot = (ranks[None, :] == ar_ids[:, None]).astype(f32)  # (CH, CH)
        if ops.is_jax(xp):
            import jax

            per_rank = jax.lax.dot_general(
                onehot, contrib, (((1,), (0,)), ((), ())),
                preferred_element_type=xp.float32,
            )
        else:
            per_rank = onehot @ contrib
        is_first = ranks == ar_ids
        tgt = xp.where(is_first, rows, AR + 1 + ar_ids)
        if ops.is_jax(xp):
            return area.at[tgt].add(per_rank, mode="drop", unique_indices=True)
        out = area.copy()
        import numpy as _np

        _np.add.at(out, tgt, per_rank)
        return out

    area = ops.fori(xp, n_chunks, body, area)

    # Add per-slot backdrops to their rows.
    has = counted["seg_count"] > 0
    tgt = xp.where(has, counted["row_of_slot"], AR).astype(xp.int32)
    bd = counted["backdrop"].astype(f32)[:, None] * xp.ones((1, 256), f32)
    area = ops.scatter_add(xp, area, tgt, bd)

    overflow = counted["n_rows"] > AR
    return area, overflow


def jax_dynamic_slice(xp, a, start, size):
    if ops.is_jax(xp):
        import jax

        return jax.lax.dynamic_slice_in_dim(a, start, size)
    return a[start : start + size]
