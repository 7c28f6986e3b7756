"""The device (JAX/XLA/Pallas) renderer."""

from .render import Frame, Renderer  # noqa: F401
