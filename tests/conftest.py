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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # Tiny kernels: O0 halves XLA:CPU compile latency (the suite's cost).
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")

from ttipm_tpu import config as _ttipm_config

# Same-host persistent compile cache (see ttipm_tpu/config.py): repeat test
# runs skip XLA backend compilation.  TTIPM_JAX_CACHE=0 disables.
_ttipm_config.enable_persistent_cache()

import numpy as np
import pytest

# TTIPM_FORCE_JACOBI=1 runs the whole suite through the TPU-only Jacobi
# SVD/eigh path (ops/jacobi.py) on the CPU backend — CI coverage for the
# on-chip factorizations without TPU hardware.
if os.environ.get("TTIPM_FORCE_JACOBI") == "1":
    from ttipm_tpu.ops import jacobi as _jacobi

    _jacobi.force_jacobi(True)


@pytest.fixture(autouse=True)
def _seed():
    # Exact reference rank parity in unit tests: disable rank bucketing
    # (perf contexts re-enable it; test_bucketing covers the padded path).
    from ttipm_tpu import config as tt_config

    tt_config.set_rank_bucket(1)
    np.random.seed(0)
    yield
    tt_config.set_rank_bucket(4)
