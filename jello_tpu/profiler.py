"""Profiling (reference: profiler/profiler.go + engine/wgpu_engine/profiler.go).

The reference threads a dependency-free two-method interface
(`Start(label) ProfilerGroup; End()`) through the renderer and implements
it with GPU timestamp queries. The TPU equivalents:

  - host-side nestable wall-clock spans (`Profiler`/`ProfilerGroup`),
    collected into the same nested result tree shape,
  - device-side annotation via `jax.named_scope` (emitted by the
    pipeline stages; visible in XLA/jax profiler traces),
  - whole-trace capture via `Profiler.device_trace(dir)` wrapping
    `jax.profiler.trace` (the analog of the query-set resolve/map/collect
    machinery, which XLA's profiler subsumes).

A `None` group no-ops everywhere, as in the reference.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class ProfilerResult:
    label: str
    start: float
    duration: float
    children: list = field(default_factory=list)

    def pretty(self, indent: int = 0) -> str:
        out = f"{'  ' * indent}{self.label}: {self.duration * 1000:.3f} ms\n"
        for c in self.children:
            out += c.pretty(indent + 1)
        return out


class ProfilerGroup:
    """A nestable span. Mirrors the reference's ProfilerGroup
    (Nest/End); use as a context manager or with explicit end()."""

    def __init__(self, label: str, parent: "ProfilerGroup | None" = None):
        self.label = label
        self._parent = parent
        self._start = time.perf_counter()
        self._end: float | None = None
        self.children: list[ProfilerGroup] = []

    def nest(self, label: str) -> "ProfilerGroup":
        child = ProfilerGroup(label, self)
        self.children.append(child)
        return child

    def end(self):
        if self._end is None:
            self._end = time.perf_counter()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.end()

    def result(self) -> ProfilerResult:
        end = self._end if self._end is not None else time.perf_counter()
        return ProfilerResult(
            self.label,
            self._start,
            end - self._start,
            [c.result() for c in self.children],
        )


class Profiler:
    """Collects per-frame span trees (reference: Profiler.Start/Collect).

    `collect()` returns both host span trees and — after a
    `device_trace(...)` scope — per-stage DEVICE timing trees parsed
    from the capture (the analog of the reference's per-pass GPU
    timestamp queries, profiler.go:337-385): one result labeled
    `device:<plane>` whose children are the pipeline's named-scope
    stages with their on-chip ms.
    """

    def __init__(self):
        self._groups: list[ProfilerGroup] = []
        self._device_results: list[ProfilerResult] = []

    def start(self, label: str) -> ProfilerGroup:
        g = ProfilerGroup(label)
        self._groups.append(g)
        return g

    def collect(self) -> list[ProfilerResult]:
        done = [g.result() for g in self._groups if g._end is not None]
        self._groups = [g for g in self._groups if g._end is None]
        done += self._device_results
        self._device_results = []
        return done

    @contextlib.contextmanager
    def device_trace(self, log_dir: str, frames: int = 1,
                     plane_filter: str = "TPU"):
        """Capture a device trace (XLA op timeline) for the scope and
        fold its per-stage device timings into the next `collect()`.

        `frames`: how many frames the scope renders (times are
        normalized to ms/frame). Parsing failures (e.g. no device
        plane on a CPU-only run) degrade to host-only collection."""
        import time as _time

        import jax

        start = _time.perf_counter()
        with jax.profiler.trace(log_dir):
            yield
        try:
            self._device_results += device_stage_results(
                log_dir, frames, plane_filter, start=start)
        except Exception:
            pass


def device_stage_results(log_dir: str, frames: int = 1,
                         plane_filter: str = "TPU",
                         start: float = 0.0) -> list[ProfilerResult]:
    """Parse a `jax.profiler.trace` capture into per-stage device
    timing trees (one per matching device plane)."""
    from .xtrace import attribute

    out = []
    for plane, tabs in attribute(log_dir, frames, plane_filter).items():
        stages = sorted(tabs["stages"].items(), key=lambda kv: -kv[1][0])
        total = sum(ms for _, (ms, _) in stages)
        out.append(ProfilerResult(
            f"device:{plane}", start, total / 1e3,
            [ProfilerResult(name, start, ms / 1e3)
             for name, (ms, _) in stages],
        ))
    return out


def named_scope(label: str):
    """Device-side stage annotation; no-op outside jax tracing."""
    try:
        import jax

        return jax.named_scope(label)
    except Exception:  # pragma: no cover - jax always present in practice
        return contextlib.nullcontext()
