"""Microbench: does a scatter_add writing a 2-row WINDOW per input row
cost like N rows or like 2N rows on this fabric?

Motivation: path_count's merged scatter (BASELINE.md round-5 trace:
17.1 ms) feeds 2 SC-row thirds — the per-tile bincount at tile_slot and
the top-edge bump at bump_slot, which is tile_slot + 1 whenever
cx+1 >= cbb0 (the overwhelmingly common case). If a windowed scatter
([2, 2] update at start row = slot: [[1, 0], [0, bump]]) costs per
input row, the two thirds merge into one SC-row scatter (~-8 ms).

Whole-program timings with content-varied inputs (the axon runtime
memoizes constant microbenches — BASELINE.md round-1 rule); fetch
forces compile+execute.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, args_list, reps=4):
    import jax

    out = fn(*args_list[0])
    jax.block_until_ready(out)
    _ = np.asarray(out)  # fetch: forces server-side compile+execute
    times = []
    for r in range(reps):
        a = args_list[1 + (r % (len(args_list) - 1))]
        t0 = time.perf_counter()
        o = fn(*a)
        _ = np.asarray(o)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    N = 1 << 20
    T = 311296
    rng = np.random.default_rng(0)
    sets = []
    for _ in range(4):
        slot = rng.integers(0, T - 2, N).astype(np.int32)
        ones = np.ones(N, np.float32)
        bump = rng.standard_normal(N).astype(np.float32)
        sets.append((jnp.asarray(slot), jnp.asarray(ones),
                     jnp.asarray(bump)))

    @jax.jit
    def two_scatters(slot, ones, bump):
        t = jnp.zeros(2 * T, jnp.float32)
        t = t.at[slot].add(ones, mode="drop")
        t = t.at[T + slot + 1].add(bump, mode="drop")
        return t.sum()

    @jax.jit
    def one_concat_scatter(slot, ones, bump):
        t = jnp.zeros(2 * T, jnp.float32)
        t = t.at[jnp.concatenate([slot, T + slot + 1])].add(
            jnp.concatenate([ones, bump]), mode="drop")
        return t.sum()

    @jax.jit
    def windowed(slot, ones, bump):
        # [T+2, 2] target; row i writes a [2, 2] window at (slot, 0):
        # [[1, 0], [0, bump]].
        t = jnp.zeros((T + 2, 2), jnp.float32)
        upd = jnp.stack(
            [jnp.stack([ones, jnp.zeros_like(ones)], axis=1),
             jnp.stack([jnp.zeros_like(bump), bump], axis=1)],
            axis=1,
        )  # [N, 2, 2]
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2),
            inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,),
        )
        t = jax.lax.scatter_add(
            t, slot[:, None], upd, dnums,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
        )
        return t.sum()

    for name, fn in (("two_scatters", two_scatters),
                     ("one_concat_scatter", one_concat_scatter),
                     ("windowed_2x2", windowed)):
        try:
            dt = bench(fn, sets)
            print(f"{name:>20}: {dt*1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:>20}: FAILED {type(e).__name__}: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
