"""Lightweight restarted GMRES for the projected KKT systems.

Replaces PETSc LGMRES (reference src/tt_ipm.py:101-163) as the iterative
fallback of the local solvers.  Implementation note: ``jax.scipy``'s gmres
builds a large ``custom_linear_solve`` graph that XLA recompiles for every
new operand shape — profiling a dim-3 IPM run showed it responsible for
~30% of total wall time in compilations alone.  This version runs the
Arnoldi loop eagerly on device arrays (matvecs are the only heavy ops),
so no shape-specialised solver graph is ever compiled.

Host-side control flow, device-side math: suitable for the CPU backend
and for small reduced systems; the fused/pallas path will supersede it
for large m on TPU.

``lgmres`` adds the augmentation of Baker, Jessup & Manteuffel (2005) —
the PETSc option the reference enables with ``-ksp_lgmres_augment``
(src/tt_ipm.py:101-163): the last ``k_aug`` restart-cycle corrections
z_j = x_{i} - x_{i-1} join the Krylov directions of the next cycle, which
restores the cross-restart convergence plain GMRES(m) loses on the
ill-conditioned late-IPM systems.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gmres_restarted", "lgmres"]


def _basis_column(V, k):
    """Column k of the basis via dynamic_slice — one compiled kernel for
    every k (a static ``V[:, k]`` bakes the index and recompiles per k)."""
    return jax.lax.dynamic_slice_in_dim(V, jnp.asarray(k), 1, axis=1)[:, 0]


def _set_basis_column(V, k, w):
    return jax.lax.dynamic_update_slice(V, w[:, None], (jnp.asarray(0), jnp.asarray(k)))


def _arnoldi_cycle(matvec, b, x0, restart, atol, aug=()):
    """One (L)GMRES(restart) cycle: blocked CGS2 Arnoldi over a fixed-width,
    zero-padded basis matrix (constant array shapes — every device op in
    the loop hits the same compiled kernel), with a host-side small
    least-squares solve.  The final ``len(aug)`` Krylov slots source from
    the augmentation vectors instead of the latest basis column (Baker et
    al. 2005); the correction then mixes basis and augmentation vectors.
    Returns (x, residual_norm)."""
    r = b - matvec(x0)
    beta = float(jnp.linalg.norm(r))
    if beta <= atol or beta == 0.0:
        return x0, beta
    n = b.size
    restart = min(restart, n)
    aug = tuple(aug)[: max(0, restart - 1)]
    n_kry = restart - len(aug)  # pure-Krylov steps before augmented ones
    aug_used = []
    V = jnp.zeros((n, restart + 1), dtype=b.dtype)
    V = _set_basis_column(V, 0, r / beta)
    H = np.zeros((restart + 1, restart))
    k_used = 0
    for k in range(restart):
        if k < n_kry:
            u = _basis_column(V, k)
        else:
            u = aug[k - n_kry]
            aug_used.append(u)
        w = matvec(u)
        # CGS2 against the full zero-padded basis: padding columns are
        # zero, so they contribute nothing to either pass.
        h1 = V.T @ w
        w = w - V @ h1
        h2 = V.T @ w
        w = w - V @ h2
        h = np.asarray(h1 + h2)
        H[: k + 1, k] = h[: k + 1]
        hk1 = float(jnp.linalg.norm(w))
        H[k + 1, k] = hk1
        k_used = k + 1
        if hk1 <= 1e-14 * beta:
            break
        V = _set_basis_column(V, k + 1, w / hk1)
        # periodic cheap residual estimate via the small LS problem
        if (k + 1) % 5 == 0 or k == restart - 1:
            e1 = np.zeros(k_used + 1)
            e1[0] = beta
            y, *_ = np.linalg.lstsq(H[: k_used + 1, :k_used], e1, rcond=None)
            est = float(np.linalg.norm(H[: k_used + 1, :k_used] @ y - e1))
            if est <= atol:
                break
    e1 = np.zeros(k_used + 1)
    e1[0] = beta
    y, *_ = np.linalg.lstsq(H[: k_used + 1, :k_used], e1, rcond=None)
    n_kry_used = min(k_used, n_kry)
    y_pad = np.zeros(restart + 1)
    y_pad[:n_kry_used] = y[:n_kry_used]
    x = x0 + V @ jnp.asarray(y_pad, dtype=b.dtype)
    for j, z in enumerate(aug_used[: max(0, k_used - n_kry_used)]):
        x = x + float(y[n_kry_used + j]) * z
    res = float(jnp.linalg.norm(b - matvec(x)))
    return x, res


def gmres_restarted(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    rtol: float = 1e-8,
    restart: int = 40,
    maxiter: int = 5,
):
    """Restarted GMRES: solves ``matvec(x) = b`` to relative tolerance.

    Returns (x, info) with info=0 on convergence (scipy-style)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    b_norm = float(jnp.linalg.norm(b))
    if b_norm == 0.0:
        return jnp.zeros_like(b), 0
    atol = rtol * b_norm
    x = x0
    res = np.inf
    for _ in range(maxiter):
        x, res = _arnoldi_cycle(matvec, b, x, restart, atol)
        if res <= atol:
            return x, 0
    return x, 1


def lgmres(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    rtol: float = 1e-8,
    restart: int = 40,
    maxiter: int = 5,
    k_aug: int = 3,
):
    """LGMRES(restart, k_aug): restarted GMRES whose cycles are augmented
    with the last ``k_aug`` normalised restart corrections.  Functional
    slot of the reference's PETSc LGMRES (src/tt_ipm.py:101-163).
    Returns (x, info) with info=0 on convergence."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    b_norm = float(jnp.linalg.norm(b))
    if b_norm == 0.0:
        return jnp.zeros_like(b), 0
    atol = rtol * b_norm
    x = x0
    aug: list = []
    for _ in range(maxiter):
        x_new, res = _arnoldi_cycle(matvec, b, x, restart, atol,
                                    aug=tuple(aug))
        z = x_new - x
        z_norm = float(jnp.linalg.norm(z))
        if z_norm > 0.0 and np.isfinite(z_norm):
            aug.insert(0, z / z_norm)
            del aug[k_aug:]
        x = x_new
        if res <= atol:
            return x, 0
    return x, 1
