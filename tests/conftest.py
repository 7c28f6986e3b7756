import os

# Prefer CPU with a virtual 8-device mesh (for the sharding tests).
#
# Note: the axon TPU plugin snapshots the environment at interpreter
# startup, so on that setup these in-process defaults are too late and
# the sharding test self-skips; run
#   JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
#       python -m pytest tests/
# to exercise it (the driver's dryrun_multichip covers the same path).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import warnings

warnings.filterwarnings("ignore", category=RuntimeWarning)
