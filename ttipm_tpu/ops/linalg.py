"""TPU-compatible dense solves.

TPU XLA implements f64 Cholesky/QR/SVD/eigh/triangular-solve but NOT LU
("Only F32 and C64 types are implemented in LuDecomposition" — measured on
v5e, 2026-08-18), so ``jnp.linalg.solve`` and ``lu_factor``/``lu_solve``
fail to compile in the x64 profile.  All general square solves in the
framework go through the QR path below: backward-stable (Householder QR
beats unpivoted LU), one extra matmul versus LU, identical code on CPU and
TPU so numerics stay platform-uniform.

SPD systems keep using Cholesky directly (supported everywhere).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jla

__all__ = ["qr_factor", "qr_apply", "qr_solve"]


def qr_factor(a: jax.Array):
    """Householder QR factorization of a square matrix, for reuse across
    multiple right-hand sides (the LU-factor replacement)."""
    return jnp.linalg.qr(a, mode="reduced")


def qr_apply(qr, b: jax.Array) -> jax.Array:
    """Solve A x = b given ``qr = qr_factor(A)``."""
    q, r = qr
    return jla.solve_triangular(r, q.T @ b, lower=False)


def qr_solve(a: jax.Array, b: jax.Array) -> jax.Array:
    """General square solve via QR (TPU-safe f64 ``linalg.solve``)."""
    return qr_apply(qr_factor(a), b)
