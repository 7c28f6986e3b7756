"""Batched fill-coverage pass, keyed by fine-command record rank.

Computes, for every fine command (record) that has segments, the raw
analytic winding of all 256 pixels of its tile (fine.wgsl:824-864:
trapezoid areas plus y_edge terms, plus the tile backdrop), as a dense
[AR, 256] f32 "area row" table indexed by *record rank* — the dense
rank of the record among coverage-carrying records in tile-sorted
command order. Because ranks are non-decreasing along the command
stream, a chunk of C consecutive records needs a contiguous window of
at most C rows: the streaming fine kernels read coverage with one
aligned DMA per chunk instead of per-command row fetches.

The segment stream arrives sorted by (path, tile) slot (path_count's
order, which the backdrop prefix needs); it is re-sorted here by record
rank so the accumulation stays a regular chunked sweep with contiguous
slice-adds (no 256-wide scatters).
"""

from __future__ import annotations

from . import ops

COVERAGE_CHUNK = 1024


def rank_records(xp, cmds, caps, extra=None):
    """Assign coverage-row ranks to fine-command records.

    A record needs a row iff it is visible (tile < GRID) and has
    segments; EndClip shares its BeginClip's row (they cover the same
    (path, tile) slot — clip_leaf patches EndClip's path to the clip
    path, cpu.go:458-472).

    extra: optional list of independent i32 arrays whose INCLUSIVE
    cumsums ride the same cumsum launch (concat + per-segment rebase at
    static offsets — cumsums cost per row, and the fabric charges
    ~60-80 us per op regardless).

    Returns (area_row [PC] i32 with -1 for rowless records,
             slot2rank [T+1] i32, bd_tgt [PC] i32 backdrop scatter
             targets, n_rows scalar[, list of extra inclusive
             cumsums])."""
    from .coarse import CMD_END_CLIP

    GRID = caps["tile_grid_cap"]
    T = caps["tiles_cap"]
    AR = caps["area_rows_cap"]
    tile = cmds["tile"]
    kind = cmds["kind"]
    segc = cmds["seg_count"]
    valid = tile < GRID
    needs = valid & (segc > 0) & (kind != CMD_END_CLIP)
    ni = needs.astype(xp.int32)
    extra_out = None
    if extra:
        PCn = ni.shape[0]
        cc = xp.cumsum(xp.concatenate([ni] + list(extra)))
        rk = cc[:PCn] - ni
        extra_out = []
        off = PCn
        for e in extra:
            n = e.shape[0]
            extra_out.append(cc[off : off + n] - cc[off - 1])
            off += n
    else:
        rk = ops.exclusive_cumsum(xp, ni)
    n_rows = rk[-1] + ni[-1]
    slot2rank = xp.full((T + 1,), -1, dtype=xp.int32)
    slot2rank = ops.scatter_set(
        xp, slot2rank, xp.where(needs, cmds["tile_slot"], T), rk
    )
    end_needs = valid & (segc > 0) & (kind == CMD_END_CLIP)
    end_rank = ops.gather_guarded(xp, slot2rank, xp.clip(cmds["tile_slot"], 0, T))
    area_row = xp.where(needs, rk, xp.where(end_needs, end_rank, -1)).astype(xp.int32)
    bd_tgt = xp.where(needs, xp.minimum(rk, AR - 1), AR).astype(xp.int32)
    if extra_out is not None:
        return area_row, slot2rank, bd_tgt, n_rows, extra_out
    return area_row, slot2rank, bd_tgt, n_rows


def sort_segments_by_rank(xp, counted, slot2rank, caps):
    """Re-sort the (slot-sorted) segment stream by record rank.

    Segments of slots whose records were dropped (clip-bbox
    intersection removed the tile from the draw's range) get a sentinel
    key past every real rank and contribute nothing.

    Returns (row [SC] i32 non-decreasing, valid [SC] bool, segs dict)."""
    T = caps["tiles_cap"]
    AR = caps["area_rows_cap"]
    segs = counted["segs"]
    slot = counted["sorted_slot"]
    key = ops.gather_guarded(xp, slot2rank, xp.clip(slot, 0, T))
    ok = (slot < T) & (key >= 0)
    key = xp.where(ok, key, AR + COVERAGE_CHUNK)
    key_s, okf, x0, y0, x1, y1, ye = ops.sort_multi(
        xp,
        key.astype(xp.int32),
        (
            ok.astype(xp.float32),
            segs["seg_x0"],
            segs["seg_y0"],
            segs["seg_x1"],
            segs["seg_y1"],
            segs["seg_y_edge"],
        ),
    )
    out = {
        "seg_x0": x0,
        "seg_y0": y0,
        "seg_x1": x1,
        "seg_y1": y1,
        "seg_y_edge": ye,
    }
    return xp.minimum(key_s, AR - 1).astype(xp.int32), okf, out


def compute_area_rows(xp, cmds, counted, caps):
    """Returns (area_rows [AR+CH, 256] f32 rank-indexed, area_row [PC]
    per-record row ids (-1 when rowless), overflow).

    On device (and whenever MSAA is requested on the Pallas path) the
    streaming coverage kernel takes over (tpu/coverage_pallas.py); in
    MSAA modes its rows are RESOLVED coverage, consumed directly by the
    fine kernels."""
    if caps.get("_coverage_pallas") and ops.is_jax(xp):
        from ..tpu.coverage_pallas import compute_area_rows_pallas

        return compute_area_rows_pallas(xp, cmds, counted, caps)
    AR = caps["area_rows_cap"]
    CH = COVERAGE_CHUNK
    f32 = xp.float32

    area_row_rec, slot2rank, bd_tgt, n_rows = rank_records(xp, cmds, caps)
    row, valid_f, segs = sort_segments_by_rank(xp, counted, slot2rank, caps)
    SC = segs["seg_x0"].shape[0]

    # Materialize loop inputs (prevents re-running the producers inside
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
        # this chunk are non-decreasing (rank-sorted), so they span the
        # contiguous range [rmin, rmin + CH). Run sums come from the
        # chunk-local inclusive cumsum differenced at run boundaries,
        # and land in the area table with one contiguous slice-add.
        # Runs spanning chunk borders accumulate across iterations.
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

    # Add per-record backdrops to their rows (once per row: the
    # row-owning record carries the slot's backdrop prefix).
    bd = cmds["backdrop"].astype(f32)[:, None] * xp.ones((1, 256), f32)
    area = ops.scatter_add(xp, area, bd_tgt, bd)

    # Per-RECORD table (matching the Pallas route): record i's row at
    # index i, EndClips duplicating their Begin's row, rowless records
    # zeroed. Consumers (fine_v2 blocks, the interpreter's per-rank
    # row DMAs) index rows by the returned area_row ids.
    needs = area_row_rec >= 0
    area = ops.gather_guarded(xp, area, xp.where(needs, area_row_rec, 0))
    area = xp.where(needs[:, None], area, f32(0.0))
    PCn = area_row_rec.shape[0]
    area_row_rec = xp.where(
        needs, xp.arange(PCn, dtype=area_row_rec.dtype), -1
    ).astype(xp.int32)
    # The interpreter kernel DMAs 8-row aligned windows; keep the table
    # a multiple of 8 rows.
    PC8 = -(-PCn // 8) * 8
    if PC8 != PCn:
        area = xp.concatenate(
            [area, xp.zeros((PC8 - PCn, 256), dtype=area.dtype)]
        )

    overflow = n_rows > AR
    return area, area_row_rec, overflow


def jax_dynamic_slice(xp, a, start, size):
    if ops.is_jax(xp):
        import jax

        return jax.lax.dynamic_slice_in_dim(a, start, size)
    return a[start : start + size]
