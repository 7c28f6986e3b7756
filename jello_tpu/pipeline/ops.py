"""Small backend shim between numpy and jax.numpy.

Only the handful of operations whose APIs differ (scatter, stable sort)
live here; everything else uses the common numpy/jax.numpy surface.
"""

from __future__ import annotations

import numpy as np


def is_jax(xp) -> bool:
    return xp.__name__.startswith("jax")


def scatter_add(xp, target, idx, values):
    if is_jax(xp):
        return target.at[idx].add(values, mode="drop")
    out = np.array(target, copy=True)
    idx = np.asarray(idx)
    values = np.broadcast_to(values, idx.shape + target.shape[1:])
    mask = (idx >= 0) & (idx < out.shape[0])
    np.add.at(out, idx[mask], values[mask])
    return out


def scatter_min(xp, target, idx, values):
    if is_jax(xp):
        return target.at[idx].min(values, mode="drop")
    out = np.array(target, copy=True)
    idx = np.asarray(idx)
    values = np.broadcast_to(values, idx.shape + target.shape[1:])
    mask = (idx >= 0) & (idx < out.shape[0])
    np.minimum.at(out, idx[mask], values[mask])
    return out


def scatter_max(xp, target, idx, values):
    if is_jax(xp):
        return target.at[idx].max(values, mode="drop")
    out = np.array(target, copy=True)
    idx = np.asarray(idx)
    values = np.broadcast_to(values, idx.shape + target.shape[1:])
    mask = (idx >= 0) & (idx < out.shape[0])
    np.maximum.at(out, idx[mask], values[mask])
    return out


def scatter_set(xp, target, idx, values):
    if is_jax(xp):
        return target.at[idx].set(values, mode="drop")
    out = np.array(target, copy=True)
    idx = np.asarray(idx)
    values = np.broadcast_to(values, idx.shape + target.shape[1:])
    mask = (idx >= 0) & (idx < out.shape[0])
    out[idx[mask]] = values[mask]
    return out


def sort_multi(xp, key, arrays):
    """Stable sort of `arrays` (a tuple) by integer `key`.

    Under jax this is one multi-operand lax.sort (the values ride the
    compare-exchange network — much cheaper on TPU than argsort + a
    permutation gather); under numpy a stable argsort + fancy index.
    Returns (sorted_key, *sorted_arrays)."""
    if is_jax(xp):
        import jax

        return jax.lax.sort((key,) + tuple(arrays), num_keys=1, is_stable=True)
    order = np.argsort(key, kind="stable")
    return (key[order],) + tuple(a[order] for a in arrays)


def stable_argsort(xp, keys):
    if is_jax(xp):
        return xp.argsort(keys, stable=True)
    return np.argsort(keys, kind="stable")


def exclusive_cumsum(xp, v, axis=-1):
    c = xp.cumsum(v, axis=axis)
    return c - v


def searchsorted_right(xp, a, v):
    return xp.searchsorted(a, v, side="right")


def bitcast_u32_f32(xp, v):
    if is_jax(xp):
        import jax

        return jax.lax.bitcast_convert_type(v.astype(xp.uint32), xp.float32)
    return np.asarray(v, dtype=np.uint32).view(np.float32)


def bitcast_f32_u32(xp, v):
    if is_jax(xp):
        import jax

        return jax.lax.bitcast_convert_type(v.astype(xp.float32), xp.uint32)
    return np.asarray(v, dtype=np.float32).view(np.uint32)


def trailing_zeros32(xp, v):
    """Count of trailing zero bits of nonzero uint32 v (exact: the
    isolated low bit is a power of two, represented exactly in f32)."""
    v = v.astype(xp.uint32)
    low = v & (~v + xp.uint32(1))
    return xp.log2(low.astype(xp.float32)).astype(xp.int32)


def gather_guarded(xp, arr, idx):
    """arr[idx] with out-of-range indices clamped (values unspecified but
    in-bounds; callers mask)."""
    idx = xp.clip(idx.astype(xp.int64) if not is_jax(xp) else idx.astype(xp.int32), 0, arr.shape[0] - 1)
    return arr[idx]


def gather_rows(xp, arr, starts, width):
    """arr[starts[i] : starts[i]+width] for each i -> [len(starts), width].

    One sliced gather (contiguous words per row) instead of `width`
    independent element gathers. Out-of-range starts are clamped so the
    slice stays in bounds (values unspecified; callers mask).

    CAUTION: measured MUCH slower than element gathers on TPU/XLA (the
    multi-element-slice gather lowers poorly; +190 ms on config5 when
    used in the slab build). Prefer packing into a stacked row table
    and gathering rows of it; use this only off the hot path."""
    if is_jax(xp):
        import jax

        return jax.lax.gather(
            arr,
            starts[:, None].astype(xp.int32),
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,),
                collapsed_slice_dims=(),
                start_index_map=(0,),
            ),
            slice_sizes=(width,),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
    idx = np.clip(
        np.asarray(starts)[:, None].astype(np.int64) + np.arange(width),
        0,
        arr.shape[0] - 1,
    )
    return arr[idx]


def barrier(xp, *arrays):
    """Materialization barrier: stops XLA from duplicating expensive
    producers (e.g. re-running a while loop once per consumer) or fusing
    them into downstream loop bodies. Identity under numpy."""
    if is_jax(xp):
        import jax

        out = jax.lax.optimization_barrier(tuple(arrays))
        return out if len(arrays) > 1 else out[0]
    return arrays if len(arrays) > 1 else arrays[0]


def cummax(xp, v):
    if is_jax(xp):
        import jax

        return jax.lax.cummax(v)
    return np.maximum.accumulate(v)


def fori(xp, n, body, state):
    """Bounded loop: Python loop under numpy, lax.fori_loop under jax."""
    if is_jax(xp):
        import jax

        return jax.lax.fori_loop(0, n, body, state)
    for i in range(n):
        state = body(i, state)
    return state


def while_bounded(xp, max_iters, cond, body, state):
    """while cond(state): state = body(state), at most max_iters times.

    Under numpy runs eagerly; under jax lowers to lax.while_loop with an
    iteration counter bound.
    """
    if is_jax(xp):
        import jax

        def wcond(carry):
            i, s = carry
            return (i < max_iters) & cond(s)

        def wbody(carry):
            i, s = carry
            return (i + 1, body(s))

        _, state = jax.lax.while_loop(wcond, wbody, (0, state))
        return state
    it = 0
    while it < max_iters and cond(state):
        state = body(state)
        it += 1
    return state
