import os

# Force CPU with a virtual 8-device mesh for sharding tests; must be set
# before jax is imported anywhere. Note: the axon TPU plugin ignores
# JAX_PLATFORMS, so set the legacy JAX_PLATFORM_NAME too.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import warnings

warnings.filterwarnings("ignore", category=RuntimeWarning)
