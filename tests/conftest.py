"""Test config: force CPU backend with 8 virtual devices.

Multi-chip sharding logic is validated on fake CPU devices
(`xla_force_host_platform_device_count`) per SURVEY §4; real-TPU runs happen
via bench.py and the driver's dryrun.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize (TPU tunnel) force-registers jax_platforms
# "axon,cpu" in every process, overriding the env var — without this
# explicit update, "CPU" tests silently run on the tunneled TPU with
# remote compilation (~50s per trivial test).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(1234)
