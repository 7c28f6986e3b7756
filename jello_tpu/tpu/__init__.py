"""The device (JAX/XLA/Pallas) renderer."""

from .render import Renderer  # noqa: F401
