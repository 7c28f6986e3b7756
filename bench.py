"""Benchmark: renders the five BASELINE.json configs on the default JAX
backend and prints ONE JSON line.

Headline metric: config-5 (tiger-profile 1080p) ms/frame, device
execution, steady state, post-compile. vs_baseline: ratio of the
2 ms/frame driver target to the measured time (>1.0 = faster than
target). `extra` carries all five configs, the MSAA modes on config 4,
the on-device pixel-parity gate (the UseCPU cross-check discipline of
the reference, wgpu.go:454-513 — runs unless the sweep blew its time
budget, in which case parity_max_err = "skipped_budget"), and compile
metrics. Consumers must take the LAST config{N}_ms_frame line; an
early `config{N}_provisional_ms_frame` line is emitted as a crash
guard and carries no configs/parity.

Usage: python bench.py [--config N] [--paths N] [--iters N]
       [--quick] (headline config only, parity skipped)
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
    pixels to the numpy oracle. Small sizes keep the compile+fetch cost
    practical on the tunneled fabric. Returns {name: max_abs_err}."""
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

    def msaa16():
        s, p = fills()
        return s, RenderParams(width=256, height=256,
                               base_color=jt.Color.rgba(1, 1, 1, 1),
                               antialiasing_method=AaConfig.MSAA16)

    cases = {
        "fills": fills, "strokes": strokes, "gradients": gradients,
        "clips_images": clips_images, "msaa8": msaa8, "msaa16": msaa16,
    }
    errs = {}
    for name, make in cases.items():
        scene, params = make()
        r = Renderer()
        img_dev = r.render(scene, params)
        img_ref, flags, _ = render_numpy(scene, params)
        errs[name] = float(abs(img_dev - img_ref).max())
    return errs


def bench_one(scene, params, iters, label=""):
    """Measure one (scene, params): returns dict with amortized
    ms/frame, blocking single-frame ms, warmup seconds, compile count."""
    import jax

    from jello_tpu.tpu import Renderer

    r = Renderer()
    t0 = time.time()
    fine_out, ld = r.render_device(scene, params)
    # The fetch inside render_device already forced compile+execute for
    # new executables; block for the settled-class run.
    jax.block_until_ready(fine_out)
    warm = time.time() - t0

    times = []
    enq_times = []
    for _ in range(3):
        t0 = time.time()
        outs = []
        for _ in range(iters):
            fine_out, _ = r.render_device(scene, params, check_flags=False)
            outs.append(fine_out)
        t_enq = time.time() - t0
        jax.block_until_ready(outs)
        times.append((time.time() - t0) / iters)
        enq_times.append(t_enq / iters)
    ms = float(min(times) * 1000.0)
    # Host-side enqueue cost per frame (dispatch without the block):
    # if this approaches ms, throughput is host-dispatch-bound, not
    # device-bound (device busy time from tools/device_trace.py).
    enqueue_ms = float(min(enq_times) * 1000.0)

    t0 = time.time()
    fine_out, _ = r.render_device(scene, params, check_flags=False)
    jax.block_until_ready(fine_out)
    blocking_ms = (time.time() - t0) * 1000.0

    mpx = params.width * params.height / 1e6
    return {
        "ms": round(ms, 3),
        "mpx_per_s": round(mpx / (ms / 1000.0), 1),
        "enqueue_ms": round(enqueue_ms, 2),
        "blocking_ms": round(blocking_ms, 1),
        "warmup_s": round(warm, 1),
        "host_calib_s": round(getattr(r, "host_calib_s", 0.0), 1),
        "n_compiles": len(r.compile_log),
        "compile_s": [round(s, 1) for _, s in r.compile_log],
        "retry_flags": getattr(r, "flags_history", []),
        "flags": {k: bool(v) for k, v in r.last_flags.items() if v},
    }


def _device_discovery_watchdog(timeout_s=900):
    """The axon tunnel can wedge so hard that jax.devices() blocks
    forever (observed 2026-08-17: >5 h unreachable). Emit an error JSON
    line and hard-exit if discovery doesn't finish in time, so the
    driver records *something* instead of hanging. Armed only until
    discovery succeeds — slow compiles are never interrupted."""
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(timeout_s):
            print(json.dumps({
                "metric": "config5_ms_frame", "value": None, "unit": "ms",
                "vs_baseline": 0.0,
                "extra": {"error": f"device discovery timed out after "
                                   f"{timeout_s}s (tunnel down)"},
            }), flush=True)
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    return done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5)
    ap.add_argument("--paths", type=int, default=10000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--quick", action="store_true",
                    help="headline config only; skip parity + other configs")
    ap.add_argument("--no-parity", action="store_true")
    args = ap.parse_args()

    discovery_done = _device_discovery_watchdog()
    import jax

    from jello_tpu.renderer.params import AaConfig, RenderParams  # noqa: F401
    from jello_tpu.scenes import CONFIGS

    t_start = time.time()
    extra = {"backend": jax.default_backend()}
    jax.devices()
    discovery_done.set()

    def make(cfg):
        if cfg == 5:
            return CONFIGS[5](n_paths=args.paths)
        return CONFIGS[cfg]()

    # Headline config first (so a timeout still yields the main metric).
    scene, params = make(args.config)
    head = bench_one(scene, params, args.iters)

    if not args.quick:
        # Print a provisional headline line NOW: if the driver kills the
        # full sweep mid-way, the last complete JSON line on stdout is
        # still the main metric instead of nothing.
        # Distinct metric name: a consumer that takes the FIRST matching
        # JSON line (or aggregates all lines) must never pick up this
        # record — it lacks configs/parity (advisor r3).
        print(json.dumps({
            "metric": f"config{args.config}_provisional_ms_frame",
            "value": head["ms"],
            "unit": "ms", "vs_baseline": round(2.0 / head["ms"], 4),
            "extra": {"backend": extra["backend"], "provisional": True,
                      "warmup_s": head["warmup_s"]},
        }), flush=True)
        # Per-config budget: each additional config costs one server-side
        # compile (~2 min) + host calibration; stop adding configs when
        # the sweep already spent its budget so the final (complete)
        # line always prints.
        budget_s = float(os.environ.get("JELLO_BENCH_BUDGET_S", "2400"))
        configs = {}
        truncated = []
        for cfg in (1, 2, 3, 4, 5):
            if cfg == args.config:
                configs[str(cfg)] = head
                continue
            if time.time() - t_start > budget_s:
                truncated.append(str(cfg))
                continue
            s, p = make(cfg)
            configs[str(cfg)] = bench_one(s, p, args.iters)
        # MSAA modes on config 4 (clips/blends @1080p).
        s, p = make(4)
        for mode, aa in (("msaa8", AaConfig.MSAA8), ("msaa16", AaConfig.MSAA16)):
            if time.time() - t_start > budget_s:
                truncated.append("4_" + mode)
                continue
            p2 = RenderParams(width=p.width, height=p.height,
                              base_color=p.base_color, antialiasing_method=aa)
            configs["4_" + mode] = bench_one(s, p2, max(2, args.iters // 2))
        extra["configs"] = configs
        if truncated:
            extra["configs_truncated"] = truncated
        if not args.no_parity and time.time() - t_start < budget_s * 1.25:
            extra["parity_max_err"] = {
                k: round(v, 6) for k, v in parity_check().items()
            }
        elif not args.no_parity:
            # Explicit marker: "skipped on budget" is distinguishable
            # from "never ran" in the output JSON (advisor r3).
            extra["parity_max_err"] = "skipped_budget"

    ms = head["ms"]
    mpx = params.width * params.height / 1e6
    extra.update({
        "warmup_s": head["warmup_s"],
        "host_calib_s": head["host_calib_s"],
        "retry_flags": head["retry_flags"],
        "n_compiles": head["n_compiles"],
        "compile_s": head["compile_s"],
        "mpx_per_s": head["mpx_per_s"],
        "blocking_single_frame_ms": head["blocking_ms"],
        "width": params.width,
        "height": params.height,
        "bench_total_s": round(time.time() - t_start, 1),
    })
    result = {
        "metric": f"config{args.config}_ms_frame",
        "value": ms,
        "unit": "ms",
        "vs_baseline": round(2.0 / ms, 4),
        "extra": extra,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
