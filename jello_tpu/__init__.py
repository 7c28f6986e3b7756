"""jello_tpu — a TPU-native 2D vector graphics renderer.

A ground-up reimplementation of the capabilities of dominikh/jello (a Go
port of Vello) designed for TPU hardware: the scene/encoding layer keeps
the reference's binary stream contract (reference: scene.go, encoding/),
while the entire GPU compute pipeline (reference:
engine/wgpu_engine/shaders/) is re-architected as a single jit-compiled
JAX/XLA program with Pallas kernels, built around dense scans,
sort-based expansion and static capacity classes instead of atomics,
bump allocators and indirect dispatch.

Layering (top to bottom):
  - Scene / gfx / curve  — user-facing scene construction API
  - encoding             — binary stream encoding (byte-compatible with
                           reference encoding/encoding.go layout)
  - renderer             — host-side resolve, ramp cache, layout/config,
                           bump estimation (capacity classes)
  - cpu                  — NumPy oracle pipeline (executable spec, the
                           analog of the reference's shaders/cpu/)
  - tpu                  — the JAX/XLA/Pallas device pipeline
"""

from .scene import Scene
from .gfx import (
    Fill,
    Extend,
    Mix,
    Compose,
    BlendMode,
    Color,
    SolidBrush,
    GradientBrush,
    ImageBrush,
    LinearGradient,
    RadialGradient,
    SweepGradient,
    ColorStop,
    Image,
)
from .curve import (
    Point,
    Affine,
    BezPath,
    Stroke,
    Cap,
    Join,
    Rect,
)
from .renderer.params import RenderParams, AaConfig

__all__ = [
    "Scene",
    "Fill",
    "Extend",
    "Mix",
    "Compose",
    "BlendMode",
    "Color",
    "SolidBrush",
    "GradientBrush",
    "ImageBrush",
    "LinearGradient",
    "RadialGradient",
    "SweepGradient",
    "ColorStop",
    "Image",
    "Point",
    "Affine",
    "BezPath",
    "Stroke",
    "Cap",
    "Join",
    "Rect",
    "RenderParams",
    "AaConfig",
]

__version__ = "0.1.0"
