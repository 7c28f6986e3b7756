"""Kernel-safe math shims for Pallas TPU.

Mosaic does not lower atan/atan2/asin/acos/cbrt (probed on this
fabric), and its native sin/cos round differently from both libm and
the XLA:TPU lowering. All replacements live in jello_tpu.pmath —
polynomials built from IEEE-exact elementwise ops — shared verbatim by
the numpy oracle and the XLA pipeline, so kernel-side geometry is
bit-identical to both (VERDICT r4 item #6: on-chip fills parity).

`kernel_xp()` returns a jnp-like namespace with the replacements, so
xp-generic math modules (flatten_math) run unmodified inside kernels.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from ..pmath import poly_xp
from ..pmath import (  # noqa: F401  (re-exported, jnp-bound)
    arccos as _arccos,
    arcsin as _arcsin,
    arctan as _arctan,
    arctan2 as _arctan2,
    cbrt as _cbrt,
)

arctan = functools.partial(_arctan, jnp)
arctan2 = functools.partial(_arctan2, jnp)
arcsin = functools.partial(_arcsin, jnp)
arccos = functools.partial(_arccos, jnp)
cbrt = functools.partial(_cbrt, jnp)


def kernel_xp():
    return poly_xp(jnp)
