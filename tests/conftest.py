"""Test env: run everything on CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md section 4)."""

import os

# The image's sitecustomize pins JAX_PLATFORMS=axon (the tunneled TPU); tests
# must run on 8 virtual CPU devices, so override hard before touching jax.
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


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU; got " + jax.devices()[0].platform
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
