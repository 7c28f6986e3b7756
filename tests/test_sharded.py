"""Multi-chip (virtual 8-device mesh) sharded rendering."""

import jax
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_dryrun_multichip():
    from jello_tpu.tpu.sharded import dryrun

    err = dryrun(8)
    assert err < 1e-3
