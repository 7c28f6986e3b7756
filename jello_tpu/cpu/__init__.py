"""NumPy oracle pipeline.

The reference ships bit-faithful CPU ports of its compute shaders as an
executable specification (engine/wgpu_engine/shaders/cpu/). This package
plays the same role for the TPU build: a trusted, readable NumPy
implementation of every pipeline stage — including fine rasterization,
which the reference has no CPU port of — used as the oracle for the
device pipeline's tests.
"""

from .pipeline import render as render_numpy  # noqa: F401
