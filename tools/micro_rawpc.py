"""Standalone config5-sized benchmark of the raw path_count ensemble:
table build -> two compactions -> both raw expand kernels, exactly as
tiling._path_count_raw wires them — isolates the in-pipeline 50 ms
regression (same-session A/B: raw 151.7 ms vs via-P 102.2 ms) from the
individually-fast kernels (compacts 15.2 ms standalone)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


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

    from jello_tpu.pipeline.tiling import _path_count_raw, path_count

    rng = np.random.default_rng(0)
    L = 1069056
    T = 311296
    caps = {
        "tiles_cap": T, "seg_cap": 1007616, "row_cap": 8192,
        "cross_lines_cap": 811008, "row_lines_cap": 8192,
        "n_draws_cap": 16384, "n_paths_cap": 16384,
        "_expand_pallas": True,
    }

    def mk():
        # Random lines roughly matching config5's distribution: short
        # segments scattered over a 1920x1080 canvas, ~75% alive.
        x0 = rng.uniform(0, 1920, L).astype(np.float32)
        y0 = rng.uniform(0, 1080, L).astype(np.float32)
        ang = rng.uniform(0, 2 * np.pi, L)
        ln = rng.exponential(8.0, L)
        x1 = (x0 + np.cos(ang) * ln).astype(np.float32)
        y1 = (y0 + np.sin(ang) * ln).astype(np.float32)
        valid = rng.random(L) < 0.75
        path = np.sort(rng.integers(0, 256, L)).astype(np.int32)
        lines = {
            "line_x0": jnp.asarray(x0), "line_y0": jnp.asarray(y0),
            "line_x1": jnp.asarray(x1), "line_y1": jnp.asarray(y1),
            "line_valid": jnp.asarray(valid),
            "line_path": jnp.asarray(path),
        }
        # One full-canvas rect per path.
        P = caps["n_paths_cap"]
        paths = {
            "rect_x0": jnp.zeros(P, jnp.int32),
            "rect_y0": jnp.zeros(P, jnp.int32),
            "rect_x1": jnp.full(P, 120, jnp.int32),
            "rect_y1": jnp.full(P, 68, jnp.int32),
            "tile_offset": jnp.zeros(P, jnp.int32),
            "tile_row_start": jnp.zeros(T, jnp.int32),
        }
        return lines, paths

    def run_raw(lines, paths):
        out = _path_count_raw(jnp, lines, paths, dict(caps))
        return sum(v.sum() for v in
                   (out["sorted_slot"], out["seg_start"], out["backdrop"]))

    def run_old(lines, paths):
        c = dict(caps)
        c["_pc_raw"] = False
        out = path_count(jnp, lines, paths, c)
        return sum(v.sum() for v in
                   (out["sorted_slot"], out["seg_start"], out["backdrop"]))

    t1 = bench(run_raw, mk)
    print(f"raw path_count (standalone): {t1:7.2f} ms", flush=True)
    t2 = bench(run_old, mk)
    print(f"via-P path_count (standalone): {t2:7.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
