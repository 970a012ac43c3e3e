"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests use
``xla_force_host_platform_device_count=8`` per the project contract.

NOTE: this environment's axon TPU plugin ignores the ``JAX_PLATFORMS``
environment variable; ``jax.config.update("jax_platforms", ...)`` is the
reliable switch, so we set both before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
