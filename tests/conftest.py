"""Test harness: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip hardware is not available in CI; every sharding/collective test
runs against ``xla_force_host_platform_device_count=8`` CPU devices, the
same mechanism the driver uses to dry-run the multi-chip path.
"""

import os
import sys
from pathlib import Path

# Force CPU even when the ambient environment selects a TPU platform: tests
# need the virtual device mesh and f32-exact numerics.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable without an install step.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The axon sitecustomize imports jax at interpreter startup, freezing the
# config defaults from the ambient env (JAX_PLATFORMS=axon) before this
# conftest runs — so the env vars above are not enough; update the live
# config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
