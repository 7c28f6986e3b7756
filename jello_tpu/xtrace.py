"""XSpace (xplane) device-trace parsing: per-stage / per-source / per-op
device-time attribution from one `jax.profiler.trace` capture.

This is the device half of the profiler (reference:
engine/wgpu_engine/profiler.go:160-227, 337-385 — timestamp-query
per-pass GPU times). On this fabric one capture answers every
"where do the milliseconds go" question: each XLA op event carries
`tf_op` (the jax named_scope path, i.e. our pipeline stage names) and
`source`/`source_stack` stats, so per-stage and per-source-line device
timings come from a single compile instead of the one-compile-per-cut
protocol of tools/profile_stages.py.

Used by `Profiler.device_trace(...)`/`collect()` (jello_tpu/profiler.py)
and the `tools/device_trace.py` CLI.
"""

from __future__ import annotations

import collections
import glob
import os
import re


def load_xspace(logdir: str):
    # The xplane proto ships inside tensorflow's bundled tsl protos in
    # this image (tensorboard_plugin_profile has no xplane_pb2).
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


_KIND_RE = re.compile(r"%([a-zA-Z][a-zA-Z0-9_-]*?)[.\s]")


def op_kind(name: str) -> str:
    m = _KIND_RE.match(name)
    return m.group(1) if m else name.split(" ")[0].lstrip("%")


def union_ms(spans) -> float:
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


def attribute(logdir: str, frames: int = 1, plane_filter: str = "TPU"):
    """Parse a capture into attribution tables (all times ms/frame).

    Returns a dict per matching device plane name:
      {"lines": {line: (sum_ms, union_ms, n/frame)},
       "stages": {named_scope_stage: (ms, n/frame)},
       "sources": {file:line: (ms, n/frame)},
       "kinds": {hlo_op_kind: (ms, n/frame)},
       "ops": [(line, op_name, ms, n/frame)] sorted desc}
    """
    xspace = load_xspace(logdir)
    result = {}
    for plane in xspace.planes:
        if plane_filter not in plane.name:
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
                    kind_tot[op_kind(name)] += dur
                    kind_n[op_kind(name)] += 1
                    ms = meta_cache.get(ev.metadata_id)
                    if ms is None:
                        ms = meta_cache[ev.metadata_id] = _meta_stats(
                            plane, em)
                    # tf_op is the jax named_scope path: per-stage
                    # attribution for free.
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
                            fparts = fr.rsplit(":", 2)
                            if len(fparts) >= 2:
                                src = (fparts[0].replace(
                                    "/root/repo/jello_tpu/", "")
                                    + ":" + fparts[1] + " (shim)")
                            break
                    src_tot[src] += dur
                    src_n[src] += 1
        result[plane.name] = {
            "lines": {
                ln: (ps / 1e9 / frames, union_ms(spans[ln]) / frames,
                     line_n[ln] / frames)
                for ln, ps in line_tot.items()
            },
            "stages": {
                sc: (ps / 1e9 / frames, scope_n[sc] / frames)
                for sc, ps in scope_tot.items()
            },
            "sources": {
                s: (ps / 1e9 / frames, src_n[s] / frames)
                for s, ps in src_tot.items()
            },
            "kinds": {
                k: (ps / 1e9 / frames, kind_n[k] / frames)
                for k, ps in kind_tot.items()
            },
            "ops": sorted(
                ((ln, name, ps / 1e9 / frames,
                  n_events[(ln, name)] / frames)
                 for (ln, name), ps in per_op.items()),
                key=lambda t: -t[2]),
        }
    return result


def stage_times(logdir: str, frames: int = 1,
                plane_filter: str = "TPU") -> dict:
    """Per-named-scope-stage device ms/frame (first matching plane)."""
    tabs = attribute(logdir, frames, plane_filter)
    for _, t in tabs.items():
        return {k: v[0] for k, v in t["stages"].items()}
    return {}
