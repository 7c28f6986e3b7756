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
    """Returns (area_rows [AR+CH, 256] f32, overflow); rows [AR:] are slack.

    Row indices are `counted["row_of_slot"][slot]` for slots with
    segments; rows include the slot's backdrop winding.
    """
    AR = caps["area_rows_cap"]
    SC = segs["seg_x0"].shape[0]
    CH = COVERAGE_CHUNK
    f32 = xp.float32

    # Per-segment target row. row_of_slot assigns *dense ranks* to the
    # slots that have segments, and the segment stream is sorted by
    # slot, so the row sequence is non-decreasing and covers every rank
    # in [0, n_rows) with no gaps. Invalid tail segments (slot == T)
    # are remapped to the last valid row via cummax (their contribution
    # is zeroed below), preserving density: any 1024-segment window
    # then spans a contiguous row range of width < 1024, which lets the
    # accumulation below use a contiguous slice-add instead of a
    # scatter.
    slot = counted["sorted_slot"]
    T = counted["seg_count"].shape[0]
    valid = slot < T
    row = xp.where(
        valid,
        ops.gather_guarded(xp, counted["row_of_slot"], slot),
        xp.int32(-1),
    ).astype(xp.int32)
    row = xp.maximum(ops.cummax(xp, row), 0)
    # Overflow safety only (frame is discarded and retried): keep the
    # slice windows in bounds.
    row = xp.minimum(row, AR - 1)
    valid_f = valid.astype(f32)

    # Materialize loop inputs (prevents re-running path_tiling inside
    # every chunk iteration via fusion).
    sx0a, sy0a, sx1a, sy1a, syea, row, valid_f = ops.barrier(
        xp,
        segs["seg_x0"], segs["seg_y0"], segs["seg_x1"], segs["seg_y1"],
        segs["seg_y_edge"], row, valid_f,
    )
    segs = {
        "seg_x0": sx0a, "seg_y0": sy0a, "seg_x1": sx1a, "seg_y1": sy1a,
        "seg_y_edge": syea,
    }

    # Pixel coordinate constants.
    p = xp.arange(256, dtype=xp.int32)
    lx = (p % 16).astype(f32)[None, :]
    ly = (p // 16).astype(f32)[None, :]

    # AR real rows + CH slack so each chunk's contiguous window fits.
    area = xp.zeros((AR + CH, 256), dtype=f32)
    q_ids = xp.arange(CH, dtype=xp.int32)

    n_chunks = (SC + CH - 1) // CH

    def body(c, area):
        base = c * CH
        sl = lambda a: jax_dynamic_slice(xp, a, base, CH)
        sx0 = sl(segs["seg_x0"])[:, None]
        sy0 = sl(segs["seg_y0"])[:, None]
        sx1 = sl(segs["seg_x1"])[:, None]
        sy1 = sl(segs["seg_y1"])[:, None]
        sye = sl(segs["seg_y_edge"])[:, None]
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
        contrib = contrib * sl(valid_f)[:, None]

        # Segmented accumulation without any 256-wide scatter: rows in
        # this chunk are non-decreasing and dense, so they span the
        # contiguous range [rmin, rmin + CH). Run sums come from the
        # chunk-local inclusive cumsum differenced at run boundaries
        # (exact per chunk: magnitudes are bounded by the chunk), and
        # land in the area table with one contiguous slice-add. Runs
        # spanning chunk borders accumulate across iterations.
        rows = sl(row)
        rmin = rows[0]
        r_local = rows - rmin  # in [0, CH)
        lc = xp.cumsum(contrib, axis=0)
        # Last in-chunk position of each local row (max combines
        # duplicates associatively).
        if ops.is_jax(xp):
            lp = xp.full((CH,), -1, dtype=xp.int32)
            lp = lp.at[r_local].max(q_ids, mode="drop")
        else:
            import numpy as _np

            lp = _np.full((CH,), -1, dtype=_np.int32)
            m = (r_local >= 0) & (r_local < CH)
            _np.maximum.at(lp, r_local[m], q_ids[m])
        gm = ops.gather_guarded(xp, lc, xp.maximum(lp, 0))
        present = (lp >= 0)[:, None]
        gm = xp.where(present, gm, f32(0.0))
        gprev = xp.concatenate([xp.zeros((1, 256), dtype=f32), gm[:-1]])
        partial = xp.where(present, gm - gprev, f32(0.0))

        if ops.is_jax(xp):
            import jax

            cur = jax.lax.dynamic_slice(area, (rmin, 0), (CH, 256))
            return jax.lax.dynamic_update_slice(area, cur + partial, (rmin, 0))
        area[rmin : rmin + CH] += partial
        return area

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
