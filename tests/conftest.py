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

import jax
import numpy as np
import pytest

# The axon TPU plugin force-selects the tunneled TPU backend regardless of
# JAX_PLATFORMS; pin test computation to the virtual CPU devices so the
# suite is deterministic, fast, and runs without TPU access.
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(1)
