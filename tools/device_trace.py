"""Capture a device trace of production frames and attribute time per op.

This is the ground-truth attribution tool the op-count scoreboard
lacked: `jax.profiler.trace` captures an XSpace with one line per TPU
core showing every executed XLA op (fusions, custom calls, whiles) and
its actual device duration. We aggregate by op kind and by the HLO
op-name prefix so the "where do the milliseconds go" question is
answered by measurement instead of jaxpr counting (which round-5's
181->70 collapse showed does NOT predict wall clock on this fabric).

Usage: python tools/device_trace.py [--config N] [--frames K] [--top M]
Writes the raw trace under /tmp/jello_trace_cfg{N}/ for re-analysis.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def capture(config: int, frames: int, logdir: str) -> None:
    import jax

    from jello_tpu.scenes import CONFIGS
    from jello_tpu.tpu import Renderer

    scene, params = CONFIGS[config]()
    r = Renderer()
    out, _ = r.render_device(scene, params)
    # check_flags=True above already fetched the flags, forcing the
    # server-side compile+execute (tunnel rule); block for settle.
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        outs = []
        for _ in range(frames):
            out, _ = r.render_device(scene, params, check_flags=False)
            outs.append(out)
        jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"captured {frames} frames in {dt*1e3:.1f} ms "
          f"({dt*1e3/frames:.1f} ms/frame incl. host)")


def analyze(logdir: str, top: int, frames: int) -> None:
    from jello_tpu.xtrace import attribute

    tabs = attribute(logdir, frames)
    if not tabs:
        raise SystemExit(f"no TPU plane in capture under {logdir}")
    for plane, t in tabs.items():
        print(f"\n== plane {plane} (per-frame over {frames} frames)")
        print("-- lines (sum / union coverage / events per frame):")
        for ln, (ms, un, n) in sorted(t["lines"].items(),
                                      key=lambda kv: -kv[1][0]):
            print(f"  {ms:9.3f} ms  union {un:8.3f} ms  x{n:7.1f}  {ln}")
        print("-- XLA Ops by named-scope stage (tf_op[1]), ms/frame:")
        for sc, (ms, n) in sorted(t["stages"].items(),
                                  key=lambda kv: -kv[1][0])[:40]:
            print(f"  {ms:9.3f} ms  x{n:7.1f}  {sc}")
        print("-- XLA Ops by source line, ms/frame (top 40):")
        for src, (ms, n) in sorted(t["sources"].items(),
                                   key=lambda kv: -kv[1][0])[:40]:
            print(f"  {ms:9.3f} ms  x{n:7.1f}  {src}")
        print("-- XLA Ops by kind (sync op stream), ms/frame:")
        for k, (ms, n) in sorted(t["kinds"].items(),
                                 key=lambda kv: -kv[1][0])[:25]:
            print(f"  {ms:9.3f} ms  x{n:7.1f}  {k}")
        print(f"-- top {top} individual ops, ms/frame:")
        for ln, name, ms, n in t["ops"][:top]:
            print(f"  {ms:9.4f} ms  x{n:6.1f} [{ln}] {name[:130]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=1)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    logdir = f"/tmp/jello_trace_cfg{args.config}"
    if not args.analyze_only:
        os.makedirs(logdir, exist_ok=True)
        capture(args.config, args.frames, logdir)
    analyze(logdir, args.top, args.frames)
    return 0


if __name__ == "__main__":
    sys.exit(main())
