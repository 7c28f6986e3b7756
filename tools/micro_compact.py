"""On-chip microbenchmark of the stream-compaction kernel alone
(config5-sized: L=1.07M rows x 16 cols, ~76% kept), vs the XLA
cumsum+scatter+gather formulation it replaces."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def bench(fn, args_fn, reps=6, trials=3):
    import jax

    fn = jax.jit(fn)
    np.asarray(jax.block_until_ready(fn(*args_fn())))
    best = 1e9
    for _ in range(trials):
        argsets = [args_fn() for _ in range(reps)]
        jax.block_until_ready(argsets)
        t0 = time.time()
        outs = [fn(*a) for a in argsets]
        jax.block_until_ready(outs)
        best = min(best, (time.time() - t0) / reps)
    return best * 1000.0


def main():
    import jax.numpy as jnp

    from jello_tpu.tpu.compact_pallas import CH, compact_rows

    rng = np.random.default_rng(0)
    L = 1069056  # config5 line_cap
    assert L % CH == 0
    NC = 16
    LCC = 811008

    def mk():
        cnt = rng.integers(1, 3, L).astype(np.float32)
        cnt[rng.random(L) < 0.24] = 0.0
        tab = rng.standard_normal((L, NC)).astype(np.float32)
        tab[:, 9] = cnt
        keep = (cnt > 0).astype(np.float32)
        pos = np.cumsum(keep) - keep
        tab[:, 11] = pos
        return jnp.asarray(tab), jnp.asarray(pos)

    t = bench(lambda tab, pos: compact_rows(
        jnp, tab, 11, 9, pos, LCC).sum(), mk)
    print(f"compact kernel 1.07M x16 -> 811k: {t:7.2f} ms", flush=True)

    # In-pipeline shape: the table is PRODUCED by an XLA stack feeding
    # the custom call (layout/copy at the boundary?).
    def stacked(tab, pos):
        cols = [tab[:, k] * 1.0000001 for k in range(16)]
        t2 = jnp.stack(cols, axis=1)
        return compact_rows(jnp, t2, 11, 9, pos, LCC).sum()

    t3 = bench(stacked, mk)
    print(f"compact w/ XLA-stacked input:     {t3:7.2f} ms", flush=True)

    # Both compactions from ONE table (the production pattern).
    def two(tab, pos):
        a = compact_rows(jnp, tab, 11, 9, pos, LCC).sum()
        b = compact_rows(jnp, tab, 14, 12, pos, 8192).sum()
        return a + b

    t4 = bench(two, mk)
    print(f"two compactions, same table:      {t4:7.2f} ms", flush=True)

    def xla_compact(tab, pos):
        nz = tab[:, 9] > 0
        idx = jnp.full(LCC, L, jnp.int32).at[
            jnp.where(nz, pos.astype(jnp.int32), LCC)
        ].set(jnp.arange(L, dtype=jnp.int32), mode="drop")
        safe = jnp.minimum(idx, L - 1)
        return jnp.where((idx < L)[:, None], tab[safe], 0.0).sum()

    t2 = bench(xla_compact, mk)
    print(f"XLA scatter+gather compact:       {t2:7.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
