"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests use
``xla_force_host_platform_device_count=8`` per the project contract. Must be
set before jax initializes, hence at conftest import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
