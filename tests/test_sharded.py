"""Multi-chip (virtual 8-device mesh) sharded rendering."""

import jax
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_dryrun_multichip():
    from jello_tpu.tpu.sharded import dryrun

    err = dryrun(8)
    assert err < 1e-3


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_dryrun_geometry_sharded():
    """Geometry-sharded pipeline (flatten/path_count/coverage/fine all
    inside the shard; crossing exchange over all_to_all). ~6 min of
    XLA CPU compile — slow set; the driver's dryrun_multichip runs the
    same path."""
    from jello_tpu.tpu.sharded2 import dryrun

    err = dryrun(8)
    assert err < 1e-3


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_dryrun_geometry_sharded_full_features():
    """Clips, gradients and an image crossing stripe boundaries through
    the geometry-sharded pipeline."""
    from jello_tpu.tpu.sharded2 import dryrun

    err = dryrun(8, full_profile=True)
    assert err < 8e-3


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_dryrun_geometry_sharded_image_tap():
    """Image paints through the image-tap kernel + record-stream fine
    inside each shard: the full-feature scene's image spans stripe
    boundaries, so fg rows and ranks must stay consistent per stripe."""
    from jello_tpu.tpu.sharded2 import dryrun

    err = dryrun(8, full_profile=True, image_tap=True)
    assert err < 8e-3


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_dryrun_geometry_sharded_msaa8():
    """MSAA8 through the geometry-sharded pipeline: each stripe's
    coverage kernel emits resolved per-sample-exact rows; clip edges
    crossing stripe boundaries must resolve identically to the oracle."""
    from jello_tpu.tpu.sharded2 import dryrun

    err = dryrun(8, full_profile=True, aa="msaa8")
    assert err < 8e-3
