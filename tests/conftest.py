"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run without TPU hardware, and keep everything float32."""

import os

# Must be set before jax is imported anywhere.  Tests run on the virtual
# CPU mesh by default (the real chip is reserved for bench/acceptance
# runs); AEJPEG_TEST_TPU=1 keeps the real backend so the tests/tpu/
# acceptance suite can run on hardware.
_USE_TPU = os.environ.get("AEJPEG_TEST_TPU") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's sitecustomize force-registers the axon TPU plugin in
# every interpreter, overriding JAX_PLATFORMS; undo it for unit tests.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
