"""Monotone-landing kernel (tpu/land_pallas.py) parity tests.

Fast-suite policy (VERDICT r4 weak #5): every Pallas kernel has at
least one cheap interpret-mode parity test that is NOT slow-marked.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from jello_tpu.tpu.land_pallas import monotone_land  # noqa: E402


def _ref_land(pos, keep, vals, out_len):
    outs = [np.zeros(out_len, np.float32) for _ in vals]
    for r in np.nonzero(keep)[0]:
        if pos[r] < out_len:
            for k, v in enumerate(vals):
                outs[k][pos[r]] = v[r]
    return outs


@pytest.mark.parametrize(
    "R,out_len,density,seed",
    [
        (5000, 3000, 0.5, 0),
        (4096, 4096, 1.0, 1),   # dense: every row lands
        (8192, 600, 0.07, 2),   # sparse landings
        (700, 200, 0.9, 3),     # overflow: landed > out_len
        (1, 128, 1.0, 4),       # single row
    ],
)
def test_monotone_land_matches_scatter(R, out_len, density, seed):
    rng = np.random.default_rng(seed)
    counts = (rng.random(R) < density).astype(np.int32)
    excl = np.cumsum(counts) - counts
    keep = counts > 0
    v0 = rng.integers(0, 1 << 20, R).astype(np.int32)
    v1 = excl.astype(np.int32)
    ref0, ref1 = _ref_land(excl, keep, [v0, v1], out_len)
    o0, o1 = monotone_land(
        jnp, jnp.asarray(excl), jnp.asarray(keep),
        [jnp.asarray(v0), jnp.asarray(v1)], out_len, interpret=True,
    )
    lim = min(int(keep.sum()), out_len)
    np.testing.assert_array_equal(np.asarray(o0)[:lim], ref0[:lim])
    np.testing.assert_array_equal(np.asarray(o1)[:lim], ref1[:lim])
    # The flushed region just past the landings is zero (the
    # zeros-initialised-scatter contract consumers rely on).
    if lim < out_len:
        pad = np.asarray(o0)[lim:min(lim + 8, out_len)]
        np.testing.assert_array_equal(pad, np.zeros_like(pad))


def test_expand_by_counts_landed_matches_scatter():
    from jello_tpu.pipeline.flatten import expand_by_counts

    rng = np.random.default_rng(7)
    counts = (rng.random(6000) < 0.4).astype(np.int32)
    cap = 4096
    base = expand_by_counts(jnp, jnp.asarray(counts), cap)
    landed = expand_by_counts(
        jnp, jnp.asarray(counts), cap, land=(True, True)
    )
    total = int(base[4])
    lim = min(total, cap)
    for a, b in zip(base[:2], landed[:2]):
        np.testing.assert_array_equal(
            np.asarray(a)[:lim], np.asarray(b)[:lim]
        )
    np.testing.assert_array_equal(np.asarray(base[2]), np.asarray(landed[2]))
