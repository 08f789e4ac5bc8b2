"""Test configuration: run on CPU with a virtual 8-device mesh so the
multi-chip sharding paths compile and execute without TPU hardware."""

import os

# The session environment pins JAX_PLATFORMS to the remote TPU ("axon") and
# a sitecustomize hook registers that backend at interpreter start; unit
# tests must run on the local CPU backend — eager TT orchestration over the
# TPU tunnel pays ~100ms latency per op.  The env var alone is not enough;
# jax.config.update below actually wins.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
    yield
