"""Global numeric configuration for ttipm_tpu.

The reference implementation is a float64 CPU code with rounding thresholds
down to 1e-12 (``/root/reference/src/tt_ipm.py:914``).  TPUs execute f64 by
emulation; for performance runs a float32 profile with rescaled tolerance
floors is provided.  x64 is enabled at import time so that all ``jnp``
arrays default to float64 exactly like the reference's numpy arrays.
"""

from __future__ import annotations

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

# Active floating dtype for TT cores.  float64 gives parity with the
# reference; float32 is the TPU performance mode (tolerance floors below).
_DTYPE = jnp.float64

# Smallest rounding threshold that is meaningful for the active dtype.
# In f32, thresholds below ~1e-7 act like 0 and let numerical noise inflate
# TT ranks, so `eps_floor` clamps them.
_EPS_FLOOR = 0.0


def set_dtype(dtype) -> None:
    """Select the global TT dtype (jnp.float64 or jnp.float32)."""
    global _DTYPE, _EPS_FLOOR
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float64:
        _DTYPE, _EPS_FLOOR = jnp.float64, 0.0
    elif dtype == jnp.float32:
        _DTYPE, _EPS_FLOOR = jnp.float32, 1e-7
    else:
        raise ValueError(f"unsupported TT dtype {dtype}")


def dtype():
    return _DTYPE


def clamp_eps(eps: float) -> float:
    """Clamp a rounding/tolerance threshold to the active dtype's floor."""
    return max(float(eps), _EPS_FLOOR)
