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

# Persistent compilation cache: the suite's wall time is dominated by CPU
# XLA compiles of the full train/eval steps (keyed by HLO hash — safe across
# code edits; only unchanged programs hit).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(1234)
