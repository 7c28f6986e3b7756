"""Microbenchmark the row-level primitives that dominate path_count.

Fetch-forced warmup + content-varied inputs (axon methodology, see
BASELINE.md). Sizes mirror config5's calibrated caps: L=1,069,056
lines, LCC=811,008 compacted, P=16,384 paths.

Usage: python tools/micro_rows.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    L = 1_069_056
    LCC = 811_008
    P = 16_384

    rng = np.random.default_rng(0)
    # Path ids sorted (as flatten emits them), fields random.
    pidx_np = np.sort(rng.integers(0, P, L)).astype(np.int32)
    ptab_np = rng.random((P, 5), np.float32)
    P22_np = rng.random((L, 22), np.float32)
    cidx_np = np.sort(rng.choice(L, LCC, replace=False)).astype(np.int32)
    cols_np = [rng.random(L, np.float32) for _ in range(21)]

    pidx = jnp.asarray(pidx_np)
    ptab = jnp.asarray(ptab_np)
    P22 = jnp.asarray(P22_np)
    cidx = jnp.asarray(cidx_np)
    cols = [jnp.asarray(c) for c in cols_np]

    def timeit(name, fn, *args):
        jfn = jax.jit(fn)
        out = jfn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])  # force compile
        best = 1e9
        for _t in range(3):
            # Content-vary: add a tiny different constant per call via a
            # donated scalar... simplest: pass a varied scalar operand.
            t0 = time.time()
            outs = [jfn(*args) for _ in range(5)]
            jax.block_until_ready(outs)
            best = min(best, (time.time() - t0) / 5)
        print(f"{name:34s} {best*1000:8.2f} ms", flush=True)

    import functools

    bar = jax.lax.optimization_barrier

    # A: per-line path-field row gather (the params join).
    timeit("A ptab[pidx]  1.07M rows x5",
           lambda t, i: bar(t[jnp.minimum(i, P - 1)]).sum(), ptab, pidx)

    # B: compact row gather of the 22-wide line table.
    timeit("B P22[cidx]   811k rows x22",
           lambda t, i: bar(t[jnp.minimum(i, L - 1)]).sum(), P22, cidx)

    # C: stack 21 cols -> [L,21] materialized.
    def stack21(*cs):
        return bar(jnp.stack(cs, axis=1)).sum()

    timeit("C stack21     [1.07M,21]", stack21, *cols)

    # C2: stack as planar [21, L] instead.
    def stack_planar(*cs):
        return bar(jnp.stack(cs, axis=0)).sum()

    timeit("C2 stack21 planar [21,1.07M]", stack_planar, *cols)

    # D: concatenate one more column onto [L,21] -> [L,22].
    def concat22(t, c):
        return bar(jnp.concatenate([t, c[:, None]], axis=1)).sum()

    timeit("D concat [1.07M,21]+[L,1]", concat22, P22[:, :21], cols[0])

    # E: element gather (1 col) at 1.07M rows.
    timeit("E ptab[:,0][pidx] 1.07M elems",
           lambda t, i: bar(t[:, 0][jnp.minimum(i, P - 1)]).sum(), ptab, pidx)

    # F: scatter_add ones at 1M rows into [311k] (the bincount).
    T = 311_296
    slots_np = rng.integers(0, T, L).astype(np.int32)
    slots = jnp.asarray(slots_np)

    def bincount(s):
        z = jnp.zeros(T + 1, jnp.int32)
        return bar(z.at[jnp.minimum(s, T)].add(1)).sum()

    timeit("F bincount 1.07M -> [311k]", bincount, slots)

    # G: cumsum over [L].
    timeit("G cumsum 1.07M", lambda c: bar(jnp.cumsum(c)).sum(), cols[0])

    # H: 3x tagged-cummax fill over [L] (the sorted-join alternative).
    def fill3(p, v1, v2, v3):
        o = jnp.maximum(jnp.cumsum(jnp.zeros_like(p)), 0)  # noop shape
        a = jax.lax.cummax(p.astype(jnp.int32) * 131072
                           + v1.astype(jnp.int32))
        b = jax.lax.cummax(p.astype(jnp.int32) * 131072
                           + v2.astype(jnp.int32))
        c = jax.lax.cummax(v3.astype(jnp.int32))
        return bar(a).sum() + bar(b).sum() + bar(c).sum() + o.sum()

    timeit("H 3x cummax fill 1.07M", fill3, pidx, cols[0], cols[1], cols[2])

    return 0


if __name__ == "__main__":
    sys.exit(main())
