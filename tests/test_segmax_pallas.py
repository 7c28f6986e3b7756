"""Segmented-max landing kernel (tpu/segmax_pallas.py) parity: exact
equality vs a numpy scatter-max oracle on block-monotone ids with
interleaved sentinel rows (the line-soup bbox contract), in the fast
suite per the kernel-coverage policy."""

import numpy as np
import jax.numpy as jnp
import pytest

from jello_tpu.tpu.segmax_pallas import segmax_land


@pytest.mark.parametrize("R,P,blocks,seed", [
    (5000, 1024, 2, 0),
    (4096, 128, 1, 1),
    (9000, 2048, 3, 2),
    (300, 256, 1, 3),
    (128, 64, 1, 4),      # P below one lane row
])
def test_segmax_land_matches_scatter_max(R, P, blocks, seed):
    rng = np.random.default_rng(seed)
    ids = np.full(R, P, np.int32)
    bs = max(-(-R // blocks) // 512 * 512, 512)
    pos = 0
    for _ in range(blocks):
        n = min(bs, R - pos)
        if n <= 0:
            break
        valid = rng.random(n) > 0.3
        vid = np.sort(rng.integers(0, P, n)).astype(np.int32)
        ids[pos:pos + n] = np.where(valid, vid, P)
        pos += n
    K = 4
    vals = [(rng.standard_normal(R) * 100).astype(np.float32)
            for _ in range(K)]

    ref = np.full((P, K), -1e30, np.float32)
    m = ids < P
    for k in range(K):
        np.maximum.at(ref[:, k], ids[m], vals[k][m])

    got = np.asarray(segmax_land(
        jnp, jnp.asarray(ids), [jnp.asarray(v) for v in vals], P,
        interpret=True))
    assert np.array_equal(got, ref)


def test_segmax_land_all_invalid():
    ids = np.full(600, 77, np.int32)  # all sentinels (P = 77)
    vals = [np.ones(600, np.float32)]
    got = np.asarray(segmax_land(jnp, jnp.asarray(ids), [jnp.asarray(v) for v in vals],
                                 77, interpret=True))
    assert (got == -1e30).all()
