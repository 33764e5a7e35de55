"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run on this virtual mesh (the real environment has
a single TPU chip); numerics tests are platform-independent.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU through the
# config API (must run before the backend initializes).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
