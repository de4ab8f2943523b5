"""Test configuration: force the CPU backend with 8 virtual devices.

Tests run on CPU (fast eager dispatch + multi-device sharding checks); the
real TPU chip is exercised by ``bench.py``. Float64 is enabled to match the
reference's test number format (reference tests use Float64, examples
Float32).

NOTE: in this environment a sitecustomize module imports jax at interpreter
startup (latching ``JAX_PLATFORMS``), so env vars set here are too late —
``jax.config.update`` must be used instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (>40 s); skip with -m 'not slow'")
