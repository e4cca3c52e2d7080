"""Test config: force an 8-device CPU platform before JAX initializes.

Multi-chip sharding paths are exercised on a virtual CPU mesh
(xla_force_host_platform_device_count=8), mirroring how the reference tests
simulated 8-way distributed evaluation without a cluster
(reference test/test_model.py:53-71).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This image's sitecustomize force-registers a TPU backend that wins over
# JAX_PLATFORMS=cpu; pin the platform explicitly so tests run on the
# 8-virtual-device CPU mesh (and never contend for the single real chip).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
