"""Kernel-safe math shims for Pallas TPU.

Mosaic does not lower atan/atan2/asin/acos/cbrt (probed on this
fabric); the Euler-spiral flattening math (flatten_math.py) needs all
three. These implementations are accurate to a few ulp so kernel-side
geometry matches the XLA path to well below a hundredth of a pixel.

`kernel_xp()` returns a jnp-like namespace with the replacements, so
xp-generic math modules (flatten_math) run unmodified inside kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

_PI = 3.14159265358979323846
_PI_2 = _PI / 2.0
_PI_4 = _PI / 4.0


def atan_poly(z):
    """arctan on [-1, 1], max err ~2 ulp (minimax, Estrin-ish Horner)."""
    # Coefficients from the classic 11-term minimax fit for atan on
    # [-1, 1] (|err| < 3e-8).
    s = z * z
    p = -0.0117212
    p = p * s + 0.05265332
    p = p * s + -0.11643287
    p = p * s + 0.19354346
    p = p * s + -0.33262348
    p = p * s + 0.99997723
    return z * p


def arctan(x):
    inv = jnp.abs(x) > 1.0
    z = jnp.where(inv, 1.0 / jnp.where(x == 0.0, 1.0, jnp.abs(x)),
                  jnp.abs(x))
    a = atan_poly(z)
    a = jnp.where(inv, _PI_2 - a, a)
    return jnp.sign(x) * a


def arctan2(y, x):
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    a = atan_poly(mn / jnp.where(mx == 0.0, 1.0, mx))
    a = jnp.where(ay > ax, _PI_2 - a, a)
    a = jnp.where(x < 0.0, _PI - a, a)
    a = jnp.where(y < 0.0, -a, a)
    # atan2(0, x<0) = +pi by convention (numpy).
    a = jnp.where((y == 0.0) & (x < 0.0), _PI, a)
    a = jnp.where((y == 0.0) & (x >= 0.0), 0.0, a)
    return a


def arcsin(x):
    xc = jnp.clip(x, -1.0, 1.0)
    return arctan2(xc, jnp.sqrt(jnp.maximum(1.0 - xc * xc, 0.0)))


def arccos(x):
    return _PI_2 - arcsin(x)


def cbrt(x):
    ax = jnp.abs(x)
    safe = jnp.maximum(ax, 1e-30)
    c = jnp.exp(jnp.log(safe) * (1.0 / 3.0))
    # One Newton step: c <- c - (c - a/c^2)/3 (restores ~1 ulp).
    c = c - (c - safe / (c * c)) * (1.0 / 3.0)
    return jnp.where(ax == 0.0, 0.0, jnp.sign(x) * c)


_OVERRIDES = {
    "arctan": arctan,
    "arctan2": arctan2,
    "arcsin": arcsin,
    "arccos": arccos,
    "cbrt": cbrt,
}


class _KernelXp:
    """jnp with Mosaic-unlowerable transcendentals replaced."""

    __name__ = "jax.numpy"  # keep ops.is_jax() semantics

    def __getattr__(self, name):
        fn = _OVERRIDES.get(name)
        if fn is not None:
            return fn
        return getattr(jnp, name)


def kernel_xp():
    return _KernelXp()
