"""Test harness: force an 8-device CPU mesh before JAX initializes backends.

This is the standard trick (SURVEY.md §4) to exercise shardings and
collectives without TPU hardware: tests see 8 virtual CPU devices.

Note: this environment pre-sets ``JAX_PLATFORMS=axon`` (a tunneled TPU
backend) via sitecustomize, so we must override the platform through
``jax.config`` — an env-var setdefault is not enough — and set XLA_FLAGS
before the first backend initialization.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert jax.device_count() == 8, jax.devices()


@pytest.fixture
def rng_np():
    return np.random.RandomState(2301)
