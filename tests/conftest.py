"""Test configuration: run the whole suite on a virtual 8-device CPU
mesh so single-chip kernels and multi-chip shardings are both covered
without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize registers a TPU PJRT plugin and
sets JAX_PLATFORMS=axon for every process, so we must override via
jax.config (env vars alone are read too early).
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

assert jax.devices()[0].platform == "cpu", "tests must run on CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(42)
