"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding is validated on a host-platform device mesh (the driver
separately dry-run-compiles the real multi-chip path via __graft_entry__.py).
"""

import os

# Force CPU. The env var alone is NOT enough here: the machine's
# sitecustomize registers the axon TPU backend and sets the jax_platforms
# *config* to "axon,cpu", which takes precedence over JAX_PLATFORMS — so we
# must override the config after importing jax (before any backend init).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
