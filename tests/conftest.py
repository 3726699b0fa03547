"""Test configuration: hermetic CPU backend with 8 virtual devices.

Tests run on the CPU backend so the suite is hermetic (no TPU needed) and the
multi-chip sharding path is exercised on a virtual 8-device mesh
(`--xla_force_host_platform_device_count=8`).  Pallas kernels run in
interpret mode on CPU (selected automatically by the kernels layer).
Real-TPU execution is covered by `bench.py` and the driver's graft entry.

NOTE: this environment boots an `axon` TPU plugin from sitecustomize which
force-sets jax_platforms via jax.config (the JAX_PLATFORMS env var alone is
NOT enough).  We must override through jax.config before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# IE_TESTS_PLATFORM overrides the hermetic CPU default (e.g. "axon" to run
# the full-size config tests on the real TPU).
jax.config.update("jax_platforms", os.environ.get("IE_TESTS_PLATFORM", "cpu"))

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    if "IE_TESTS_PLATFORM" not in os.environ:
        assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
    yield


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
