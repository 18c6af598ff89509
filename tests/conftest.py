"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding paths (shard_map / pjit over a Mesh) are exercised on
fake CPU devices via ``--xla_force_host_platform_device_count=8`` — the
standard JAX trick for testing collectives without hardware. Must run before
jax is first imported.
"""

import os

# Force CPU even if the ambient environment selects a TPU platform: tests
# must be reproducible and run the 8-fake-device mesh paths. Note: the image's
# sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so the env var alone
# is not enough — override the live config before any backend initializes.
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
