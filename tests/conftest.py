import os

# Force CPU with a virtual 8-device mesh (for the sharding tests).
#
# This must OVERRIDE any inherited JAX_PLATFORMS (the axon/TPU tunnel
# sets JAX_PLATFORMS=axon in the shell): a setdefault here silently
# routed the whole suite through the tunneled TPU — 20-minute runs,
# server-side compiles of every interpret-mode kernel, and bench
# interference. Tests are CPU-only by design; the real chip is
# exercised by bench.py and tools/profile_stages.py. Set
# JELLO_TEST_TPU=1 to run the suite against the device anyway.
if not os.environ.get("JELLO_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    # The env vars alone are NOT enough: the axon sitecustomize
    # (/root/.axon_site) registers the tunneled-TPU plugin at
    # interpreter startup and force-sets jax_platforms='axon,cpu',
    # which routes every jax op in the suite through the TPU tunnel
    # (and hangs the whole suite whenever the tunnel is busy
    # compiling). Overriding the *config state* wins over the
    # sitecustomize default and keeps the axon factory from ever
    # initializing a client.
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import warnings

warnings.filterwarnings("ignore", category=RuntimeWarning)

import pytest

# Interpret-mode Pallas parity tests dominate the suite (~17 of 20
# minutes wall); they are skipped by default so the inner loop stays
# under ~2 minutes, and run with --runslow (CI / driver / pre-commit
# for kernel work). The fast set keeps >60 tests including end-to-end
# device-pipeline coverage (test_full_scene, test_fill, ...).
_SLOW = {
    "test_mixed_size_images_render",
    "test_device_matches_oracle",
    "test_v2_many_small_paths_multi_chunk",
    "test_coverage_kernel_msaa8_matches_oracle",
    "test_flatten_euler_kernel_matches_xla",
    "test_path_count_pallas_matches_xla",
    "test_coverage_kernel_area_matches_xla",
    "test_hybrid_image_only_tiles",
    "test_hybrid_matches_reference_full_scene",
    "test_v2_solid_fills",
    "test_pallas_interpret_matches_reference_fine",
    "test_512_image_renders_through_pallas_fine",
    "test_v2_gradients_all_kinds",
    "test_overflow_retry_recovers",
    "test_expand_kernel_generic_toy",
}


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run interpret-mode Pallas parity tests")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: interpret-mode Pallas parity test (use --runslow)"
    )
    config.addinivalue_line(
        "markers",
        "fast_guard: always runs, even in a slow-marked module — guards "
        "a production routing the fast suite must cover",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow Pallas-interpret test; use --runslow")
    for item in items:
        if "fast_guard" in item.keywords:
            continue
        if item.name.split("[")[0] in _SLOW or "slow" in item.keywords:
            item.add_marker(skip)
