"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use an 8-device host-platform mesh
(xla_force_host_platform_device_count), per the project's testing contract.
The axon TPU plugin force-sets JAX_PLATFORMS, so we must override through
jax.config, not the environment.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def max_abs_err(a, b):
    return float(np.max(np.abs(np.asarray(a, dtype=np.complex128)
                               - np.asarray(b, dtype=np.complex128))))
