"""Benchmark: renders the tiger-profile 1080p scene (BASELINE config 5)
on the default JAX backend and prints one JSON line.

Metric: ms/frame (device execution, steady state, post-compile).
vs_baseline: ratio of the 2 ms/frame driver target to the measured time
(>1.0 means faster than target).

Usage: python bench.py [--config N] [--paths N] [--iters N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5)
    ap.add_argument("--paths", type=int, default=10000)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    from jello_tpu.renderer.params import RenderParams  # noqa: F401
    from jello_tpu.scenes import CONFIGS
    from jello_tpu.tpu import Renderer

    if args.config == 5:
        scene, params = CONFIGS[5](n_paths=args.paths)
    else:
        scene, params = CONFIGS[args.config]()

    r = Renderer()
    # Warmup: compile + capacity-retry settle.
    t0 = time.time()
    fine_out, ld = r.render_device(scene, params)
    jax.block_until_ready(fine_out)
    warm = time.time() - t0

    # Steady state: dispatch a batch of frames, block once (host<->device
    # sync latency is not part of the per-frame cost).
    times = []
    for _ in range(3):
        t0 = time.time()
        outs = []
        for _ in range(args.iters):
            fine_out, _ = r.render_device(scene, params, check_flags=False)
            outs.append(fine_out)
        jax.block_until_ready(outs)
        times.append((time.time() - t0) / args.iters)
    ms = float(min(times) * 1000.0)

    mpx = params.width * params.height / 1e6
    result = {
        "metric": f"config{args.config}_ms_frame",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(2.0 / ms, 4),
        "extra": {
            "backend": jax.default_backend(),
            "warmup_s": round(warm, 1),
            "mpx_per_s": round(mpx / (ms / 1000.0), 1),
            "width": params.width,
            "height": params.height,
            "flags": r.last_flags,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
