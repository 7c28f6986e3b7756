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
    """Collects per-frame span trees (reference: Profiler.Start/Collect)."""

    def __init__(self):
        self._groups: list[ProfilerGroup] = []

    def start(self, label: str) -> ProfilerGroup:
        g = ProfilerGroup(label)
        self._groups.append(g)
        return g

    def collect(self) -> list[ProfilerResult]:
        done = [g.result() for g in self._groups if g._end is not None]
        self._groups = [g for g in self._groups if g._end is None]
        return done

    @staticmethod
    @contextlib.contextmanager
    def device_trace(log_dir: str):
        """Capture a full device trace (XLA op timeline) for the scope."""
        import jax

        with jax.profiler.trace(log_dir):
            yield


def named_scope(label: str):
    """Device-side stage annotation; no-op outside jax tracing."""
    try:
        import jax

        return jax.named_scope(label)
    except Exception:  # pragma: no cover - jax always present in practice
        return contextlib.nullcontext()
