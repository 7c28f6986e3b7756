"""Round-4 microbenchmarks: sorted vs random scatter, elementwise-chain
per-op cost, row-gather cost — whole-program traces, fetch-forced
warmup, content-varied inputs (BASELINE.md round-2 methodology).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def bench(fn, args_fn, reps=8, trials=3):
    import jax

    fn = jax.jit(fn)
    a0 = args_fn()
    np.asarray(jax.block_until_ready(fn(*a0)))  # fetch-forced compile
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
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    L = 1 << 20          # ~1M rows (seg_cap scale)
    T = 311296 + 1       # tiles_cap scale
    NP = 16384           # n_paths_cap

    def mk_idx(sort):
        idx = rng.integers(0, T - 1, size=L).astype(np.int32)
        if sort:
            idx = np.sort(idx)
        return jnp.asarray(idx)

    vals = lambda: jnp.asarray(rng.standard_normal(L).astype(np.float32))

    # 1) scatter_add random vs sorted
    def scat(idx, v, sorted_=False):
        tgt = jnp.zeros(T, jnp.float32)
        d = jax.lax.scatter_add(
            tgt, idx[:, None], v,
            jax.lax.ScatterDimensionNumbers(
                update_window_dims=(), inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,)),
            indices_are_sorted=sorted_, unique_indices=False,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
        return d.sum()

    t_rand = bench(lambda i, v: scat(i, v, False), lambda: (mk_idx(False), vals()))
    print(f"scatter_add 1M random  -> T: {t_rand:7.2f} ms", flush=True)
    t_sort = bench(lambda i, v: scat(i, v, True), lambda: (mk_idx(True), vals()))
    print(f"scatter_add 1M sorted  -> T: {t_sort:7.2f} ms", flush=True)

    # segment_sum with sorted ids
    def segsum(idx, v):
        return jax.ops.segment_sum(v, idx, num_segments=T,
                                   indices_are_sorted=True).sum()

    t_ss = bench(segsum, lambda: (mk_idx(True), vals()))
    print(f"segment_sum 1M sorted  -> T: {t_ss:7.2f} ms", flush=True)

    # 2) elementwise chain per-op cost over [1M]
    def chain(x, n):
        for i in range(n):
            x = x * 1.000001 + 0.5
            x = jnp.where(x > 1.0, x - 1.0, x)
        return x.sum()

    t5 = bench(lambda x: chain(x, 5), lambda: (vals(),))
    t40 = bench(lambda x: chain(x, 40), lambda: (vals(),))
    print(f"elementwise [1M] 10 ops: {t5:7.2f} ms   80 ops: {t40:7.2f} ms  "
          f"(per extra op {(t40 - t5) / 70:.3f} ms)", flush=True)

    # 3) row gather: 1M indices into [16k, 8] table
    def rg(tab, idx):
        return tab[idx].sum()

    tabf = lambda: jnp.asarray(rng.standard_normal((NP, 8)).astype(np.float32))
    idxp = lambda s: jnp.asarray(
        (np.sort(rng.integers(0, NP, L)) if s else rng.integers(0, NP, L))
        .astype(np.int32))
    t_rg = bench(rg, lambda: (tabf(), idxp(False)))
    print(f"row gather 1M x 8 from 16k (random): {t_rg:7.2f} ms", flush=True)
    t_rgs = bench(rg, lambda: (tabf(), idxp(True)))
    print(f"row gather 1M x 8 from 16k (sorted): {t_rgs:7.2f} ms", flush=True)

    # 4) stack of 21 [1M] arrays into [1M, 21]
    def stk(x):
        return jnp.stack([x * (i + 1.0) for i in range(21)], axis=1).sum()

    t_stk = bench(stk, lambda: (vals(),))
    print(f"stack 21 x [1M] cols:  {t_stk:7.2f} ms", flush=True)

    # 5) sort 1M i32 key + 6 f32 payloads
    def srt(k, v):
        outs = jax.lax.sort((k,) + tuple(v * (i + 1.0) for i in range(6)),
                            num_keys=1)
        return sum(o.sum() for o in outs[1:]) + outs[0].sum()

    t_srt = bench(srt, lambda: (mk_idx(False), vals()))
    print(f"sort 1M key+6 payloads: {t_srt:7.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
