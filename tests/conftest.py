"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding tests run on virtual CPU devices
(xla_force_host_platform_device_count), mirroring how the driver dry-runs
the multi-chip path.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(1)
