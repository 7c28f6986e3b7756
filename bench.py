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


def parity_check():
    """Render feature-covering small scenes on the device and compare
    pixels to the numpy oracle (the UseCPU cross-check discipline,
    wgpu.go:454-513). Small sizes keep the compile+fetch cost practical
    on the tunneled fabric. Returns {name: max_abs_err}."""
    import numpy as np

    import jello_tpu as jt
    from jello_tpu.cpu import render_numpy
    from jello_tpu.renderer.params import AaConfig, RenderParams
    from jello_tpu.tpu import Renderer

    ident = jt.Affine.identity()
    rng = np.random.default_rng(11)

    def fills():
        s = jt.Scene()
        p = jt.BezPath().move_to(30, 40).cubic_to(90, 10, 150, 220, 200, 240).close()
        s.fill(jt.Fill.NON_ZERO, ident, jt.SolidBrush(jt.Color.rgba(1, 0, 0, 1)), None, p)
        t = jt.BezPath().move_to(10, 10).line_to(200, 30).line_to(60, 200).close()
        s.fill(jt.Fill.EVEN_ODD, ident, jt.SolidBrush(jt.Color.rgba(0, 0, 1, 0.5)), None, t)
        return s, RenderParams(width=256, height=256, base_color=jt.Color.rgba(1, 1, 1, 1))

    def strokes():
        s = jt.Scene()
        st = jt.Stroke(width=6.0, join=jt.Join.ROUND,
                       start_cap=jt.Cap.ROUND, end_cap=jt.Cap.ROUND)
        w = jt.BezPath().move_to(20, 200).cubic_to(80, 120, 160, 260, 240, 180)
        s.stroke(st, ident, jt.SolidBrush(jt.Color.rgba(0, 0.5, 0, 1)), None, w)
        st2 = jt.Stroke(width=2.0, dash_pattern=(8, 4))
        s.stroke(st2, ident, jt.SolidBrush(jt.Color.rgba(0.2, 0.2, 0.2, 1)), None,
                 jt.BezPath().move_to(10, 40).line_to(240, 60))
        return s, RenderParams(width=256, height=256, base_color=jt.Color.rgba(1, 1, 1, 1))

    def gradients():
        s = jt.Scene()
        stops = (jt.ColorStop(0.0, jt.Color.rgba(1, 0, 0, 1)),
                 jt.ColorStop(1.0, jt.Color.rgba(0, 0, 1, 1)))
        g = jt.GradientBrush(jt.LinearGradient((0, 0), (256, 256), stops))
        full = jt.BezPath().move_to(0, 0).line_to(256, 0).line_to(256, 256).line_to(0, 256).close()
        s.fill(jt.Fill.NON_ZERO, ident, g, None, full)
        rstops = (jt.ColorStop(0.0, jt.Color.rgba(1, 1, 0, 1)),
                  jt.ColorStop(1.0, jt.Color.rgba(0, 1, 1, 0.3)))
        rg = jt.GradientBrush(
            jt.RadialGradient((128, 128), 20.0, (140, 140), 90.0, rstops))
        c = jt.BezPath().move_to(50, 128)
        c.cubic_to(50, 60, 206, 60, 206, 128)
        c.cubic_to(206, 196, 50, 196, 50, 128)
        c.close()
        s.fill(jt.Fill.NON_ZERO, ident, rg, None, c)
        return s, RenderParams(width=256, height=256, base_color=jt.Color.rgba(1, 1, 1, 1))

    def clips_images():
        s = jt.Scene()
        pix = (rng.random((16, 16, 4)) * 255).astype(np.uint8)
        pix[..., 3] = 255
        img = jt.Image(pixels=pix)
        sq = jt.BezPath().move_to(20, 20).line_to(120, 20).line_to(120, 120).line_to(20, 120).close()
        s.fill(jt.Fill.NON_ZERO, ident, jt.ImageBrush(img), None, sq)
        clip = jt.BezPath().move_to(60, 60).line_to(220, 80).line_to(140, 220).close()
        s.push_layer(jt.BlendMode(jt.Mix.MULTIPLY, jt.Compose.SRC_OVER), 0.8, ident, clip)
        t = jt.BezPath().move_to(40, 100).line_to(230, 120).line_to(120, 230).close()
        s.fill(jt.Fill.NON_ZERO, ident, jt.SolidBrush(jt.Color.rgba(0.9, 0.4, 0.1, 1)), None, t)
        s.pop_layer()
        return s, RenderParams(width=256, height=256, base_color=jt.Color.rgba(1, 1, 1, 1))

    def msaa8():
        s, p = fills()
        return s, RenderParams(width=256, height=256,
                               base_color=jt.Color.rgba(1, 1, 1, 1),
                               antialiasing_method=AaConfig.MSAA8)

    cases = {
        "fills": fills, "strokes": strokes, "gradients": gradients,
        "clips_images": clips_images, "msaa8": msaa8,
    }
    errs = {}
    for name, make in cases.items():
        scene, params = make()
        r = Renderer()
        img_dev = r.render(scene, params)
        img_ref, flags, _ = render_numpy(scene, params)
        errs[name] = float(abs(img_dev - img_ref).max())
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
