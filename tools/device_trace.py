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
import collections
import glob
import gzip
import os
import re
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


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


def load_xspace(logdir: str):
    # The xplane proto ships inside tensorflow's bundled tsl protos in
    # this image (tensorboard_plugin_profile has no xplane_pb2).
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


_KIND_RE = re.compile(r"%([a-zA-Z][a-zA-Z0-9_-]*?)[.\s]")


def _kind(name: str) -> str:
    m = _KIND_RE.match(name)
    return m.group(1) if m else name.split(" ")[0].lstrip("%")


def _union_ms(spans) -> float:
    """Total coverage of possibly-overlapping (start, end) ps spans."""
    spans = sorted(spans)
    tot = 0
    cur_s = cur_e = None
    for s, e in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                tot += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        tot += cur_e - cur_s
    return tot / 1e9


def _meta_stats(plane, em):
    """Decode an event-metadata stats list into a dict."""
    st = plane.stat_metadata
    out = {}
    for s in em.stats:
        name = st[s.metadata_id].name
        out[name] = (s.str_value or s.int64_value or s.uint64_value
                     or s.double_value
                     or (st[s.ref_value].name if s.ref_value else ""))
    return out


def analyze(logdir: str, top: int, frames: int) -> None:
    xspace = load_xspace(logdir)
    print("planes:", [p.name for p in xspace.planes])
    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        meta_cache = {}
        per_op = collections.Counter()
        n_events = collections.Counter()
        line_tot = collections.Counter()
        line_n = collections.Counter()
        kind_tot = collections.Counter()
        kind_n = collections.Counter()
        scope_tot = collections.Counter()
        scope_n = collections.Counter()
        src_tot = collections.Counter()
        src_n = collections.Counter()
        spans = collections.defaultdict(list)
        for line in plane.lines:
            lname = line.name
            for ev in line.events:
                em = ev_meta[ev.metadata_id]
                name = em.name
                dur = ev.duration_ps
                per_op[(lname, name)] += dur
                n_events[(lname, name)] += 1
                line_tot[lname] += dur
                line_n[lname] += 1
                spans[lname].append((ev.offset_ps, ev.offset_ps + dur))
                if lname == "XLA Ops":
                    kind_tot[_kind(name)] += dur
                    kind_n[_kind(name)] += 1
                    ms = meta_cache.get(ev.metadata_id)
                    if ms is None:
                        ms = meta_cache[ev.metadata_id] = _meta_stats(plane, em)
                    # tf_op is the jax named_scope path: per-stage
                    # attribution for free (replaces profile_stages.py's
                    # one-compile-per-cut protocol).
                    tf_op = str(ms.get("tf_op", ""))
                    parts = tf_op.split("/")
                    scope = parts[1] if len(parts) > 2 else (
                        parts[-1] if parts else "?")
                    scope_tot[scope] += dur
                    scope_n[scope] += 1
                    # Attribute to the first frame in the source stack
                    # that is not the ops.py shim, so scatter/gather
                    # helpers report their call sites.
                    src = str(ms.get("source", "?")).replace(
                        "/root/repo/jello_tpu/", "")
                    stack = str(ms.get("source_stack", ""))
                    if "/ops.py:" in src or src.startswith("pipeline/ops.py"):
                        for fr in stack.splitlines():
                            fr = fr.strip()
                            if not fr or "/ops.py" in fr:
                                continue
                            parts = fr.rsplit(":", 2)
                            if len(parts) >= 2:
                                src = (parts[0].replace(
                                    "/root/repo/jello_tpu/", "")
                                    + ":" + parts[1] + " (shim)")
                            break
                    src_tot[src] += dur
                    src_n[src] += 1
        print(f"\n== plane {plane.name} (per-frame over {frames} frames)")
        print("-- lines (sum / union coverage / events per frame):")
        for lname, ps in line_tot.most_common():
            print(f"  {ps/1e9/frames:9.3f} ms  union {_union_ms(spans[lname])/frames:8.3f} ms"
                  f"  x{line_n[lname]/frames:7.1f}  {lname}")
        print("-- XLA Ops by named-scope stage (tf_op[1]), ms/frame:")
        for scope, ps in scope_tot.most_common(40):
            print(f"  {ps/1e9/frames:9.3f} ms  x{scope_n[scope]/frames:7.1f}  {scope}")
        print("-- XLA Ops by source line, ms/frame (top 40):")
        for src, ps in src_tot.most_common(40):
            print(f"  {ps/1e9/frames:9.3f} ms  x{src_n[src]/frames:7.1f}  {src}")
        print("-- XLA Ops by kind (sync op stream), ms/frame:")
        for kind, ps in kind_tot.most_common(25):
            print(f"  {ps/1e9/frames:9.3f} ms  x{kind_n[kind]/frames:7.1f}  {kind}")
        print(f"-- top {top} individual ops, ms/frame:")
        for (lname, name), ps in per_op.most_common(top):
            print(f"  {ps/1e9/frames:9.4f} ms  x{n_events[(lname, name)]/frames:6.1f} "
                  f"[{lname}] {name[:130]}")


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
