"""Synthetic microbench of the per-tile interpreter kernel: attributes
its per-program cost to grid overhead, tape walk, and the image branch.

Usage: python tools/probe_legacy.py [--lt 3072] [--mc 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lt", type=int, default=3072)
    ap.add_argument("--mc", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jello_tpu.pipeline.coarse import CMD_COLOR, CMD_IMAGE
    from jello_tpu.tpu.fine_pallas import make_fine_kernel

    LT, MC = args.lt, args.mc
    GRID = 8192
    caps = {
        "tile_grid_cap": GRID,
        "cmds_per_tile": MC,
        "blend_depth": 8,
        "max_stops": 2,
        "aa_mode": "area",
        "area_rows_cap": 1 << 14,
    }
    AR = caps["area_rows_cap"]

    rng = np.random.default_rng(0)
    tile_ids = np.sort(rng.choice(GRID, size=LT, replace=False)).astype(np.int32)

    def build(counts_per_tile, with_image):
        slab = np.zeros((LT, MC, 16), dtype=np.uint32)
        for k in range(counts_per_tile):
            is_img = with_image and k == counts_per_tile - 1
            kind = CMD_IMAGE if is_img else CMD_COLOR
            slab[:, k, 0] = kind
            slab[:, k, 1] = rng.integers(0, AR, size=LT)  # area row
            slab[:, k, 2] = 3  # seg_count > 0 -> fetch coverage row
            slab[:, k, 3] = tile_ids
            if is_img:
                xf = np.zeros(LT, np.uint32)
                slab[:, k, 6] = np.float32(0.25).view(np.uint32)  # m0
                slab[:, k, 9] = np.float32(0.25).view(np.uint32)  # m3
                slab[:, k, 12] = 0  # placement
                slab[:, k, 13] = (8 << 16) | 8  # wh
            else:
                for w, v in zip(range(5, 9), (0.7, 0.3, 0.2, 0.9)):
                    slab[:, k, w] = np.float32(v).view(np.uint32)
        counts = np.full(LT, counts_per_tile, dtype=np.int32)
        return jnp.asarray(slab), jnp.concatenate(
            [jnp.asarray(counts), jnp.asarray([120], jnp.int32)])

    rows = jnp.asarray(rng.random((AR + 528, 256), np.float32))
    stops = jnp.zeros((4, 128), jnp.float32)
    img = jnp.asarray(rng.random((4, 64, 256), np.float32))
    scalars = jnp.asarray(np.array([1, 1, 1, 1], np.float32))

    for label, cnt, wimg in (
        ("empty tapes (grid overhead)", 0, False),
        ("2 color cmds", 2, False),
        ("6 color cmds", 6, False),
        ("2 color + 1 image", 3, True),
    ):
        slab, counts = build(cnt, wimg)
        call = make_fine_kernel(caps, (64, 256), n_ramp_rows=4, n_programs=LT)
        f = jax.jit(lambda c, t, s, sl: call(c, t, s, sl, rows, stops, img))
        t0 = time.time()
        out, _ = f(counts, jnp.asarray(tile_ids), scalars, slab)
        _ = np.asarray(out[:1])
        comp = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            outs = [f(counts, jnp.asarray(tile_ids), scalars, slab)
                    for _ in range(args.reps)]
            jax.block_until_ready(outs)
            best = min(best, (time.time() - t0) / args.reps)
        print(f"{label:28s} {best*1e3:7.2f} ms ({best/LT*1e6:6.2f} us/tile)"
              f" warmup {comp:.0f}s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
