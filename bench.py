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


def parity_check(configs=(1, 2, 3, 4)):
    """Render configs on the device and compare pixels to the numpy
    oracle (the UseCPU cross-check discipline, wgpu.go:454-513).
    Returns {config: max_abs_err}."""
    import jax

    from jello_tpu.cpu import render_numpy
    from jello_tpu.scenes import CONFIGS
    from jello_tpu.tpu import Renderer

    errs = {}
    for c in configs:
        scene, params = CONFIGS[c]()
        r = Renderer()
        img_dev = r.render(scene, params)
        img_ref, flags, _ = render_numpy(scene, params)
        errs[c] = float(abs(img_dev - img_ref).max())
    return errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5)
    ap.add_argument("--paths", type=int, default=10000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--parity", action="store_true",
                    help="also run the on-device pixel parity gate (configs 1-4)")
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

    # Blocking single-frame latency (includes the host<->device sync;
    # on the tunneled setup this is dominated by ~100-200 ms RTT).
    t0 = time.time()
    fine_out, _ = r.render_device(scene, params, check_flags=False)
    jax.block_until_ready(fine_out)
    blocking_ms = (time.time() - t0) * 1000.0

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
            "blocking_single_frame_ms": round(blocking_ms, 1),
            "width": params.width,
            "height": params.height,
            "flags": r.last_flags,
        },
    }
    if args.parity:
        result["extra"]["parity_max_err"] = {
            str(k): round(v, 6) for k, v in parity_check().items()
        }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
