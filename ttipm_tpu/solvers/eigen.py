"""TT eigensolvers for the IPM step-size search.

``tt_max_generalised_eigen(A, Delta)`` finds the largest step ``alpha``
with ``A + alpha*Delta ⪰ 0`` by MALS sweeps over 2-core windows: at each
window it computes the smallest eigenpair of the projected operator
``(1/alpha) A + Delta`` and, when that eigenvalue goes negative, shrinks
``alpha`` to ``1/lambda_max(-Delta, A)`` (parity:
/root/reference/src/tt_als.py:931-1283).

``tt_min_eig(A)`` is the plain smallest-eigenvector MALS sweep used for
the inequality step sizes over ``Diag(.)`` operators
(src/tt_als.py:1286-1499).

The reference leans on ARPACK ``eigsh``/``splu``/``lobpcg``; here both the
dense-assembled and matrix-free local problems go through one JAX-native
LOBPCG (standard and generalized), so the entire path stays on device.
"""

from __future__ import annotations

import functools

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ttipm_tpu.ops.jacobi import TINY, safe_eigh, safe_svd

from ttipm_tpu import config
from ttipm_tpu.ops.rounding import (
    add_kick_rank,
    add_kick_rank_rev,
    pad_bond_factors,
    prune_singular_vals,
)
from ttipm_tpu.ops.tt import TT, tt_inner_prod, tt_normalise, tt_ranks
from ttipm_tpu.ops.products import tt_fast_matrix_vec_mul
from ttipm_tpu.solvers.amen import compute_phi_bck_A, compute_phi_fwd_A

__all__ = ["tt_max_generalised_eigen", "tt_min_eig", "lobpcg_smallest", "lobpcg_fused"]


# ---------------------------------------------------------------------------
# JAX-native LOBPCG (k=1, optionally generalized A x = lam B x)
# ---------------------------------------------------------------------------

def _rayleigh_ritz_smallest(W, AW, BW):
    """Smallest Ritz pair over the span of the columns of W."""
    G_a = W.T @ AW
    G_b = W.T @ BW
    # Whiten with G_b^{-1/2} via eigh; drop near-null directions.
    eb, Ub = safe_eigh(0.5 * (G_b + G_b.T))
    keep = eb > 1e-12 * jnp.max(jnp.abs(eb))
    inv_sqrt = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, eb, 1.0)), 0.0)
    T = Ub * inv_sqrt[None, :]
    H = T.T @ (0.5 * (G_a + G_a.T)) @ T
    # Dropped null directions leave exact-zero rows/cols in H — spurious
    # 0-Ritz-values that win the argmin on PSD operators and return the
    # ZERO vector (lam=0, res=0 — false convergence).  Penalise them off
    # the bottom of the spectrum instead.
    penalty = (1.0 - keep.astype(H.dtype)) * (
        2.0 * jnp.max(jnp.abs(G_a)) + 1.0
    )
    H = H + jnp.diag(penalty)
    ev, Uv = safe_eigh(H)
    c = T @ Uv[:, 0]
    return ev[0], W @ c


def lobpcg_smallest(
    matvec: Callable,
    x0: jax.Array,
    tol: float,
    maxiter: int,
    b_matvec: Optional[Callable] = None,
):
    """Smallest eigenpair of a symmetric operator (generalized when
    ``b_matvec`` is given) by LOBPCG with k=1.

    Returns (eigval, eigvec, residual_norm).  Host loop with device math;
    iteration counts follow the reference's caps (src/tt_als.py:907-909).
    """
    n = x0.size
    x = x0.reshape(-1)
    nrm = jnp.linalg.norm(x)
    x = jnp.where(nrm > 0, x / jnp.maximum(nrm, TINY), jnp.ones_like(x) / np.sqrt(n))
    bx = b_matvec(x) if b_matvec is not None else x
    x = x / jnp.sqrt(jnp.abs(jnp.vdot(x, bx)) + TINY)

    p = None
    lam = None
    res_norm = np.inf
    for _ in range(maxiter):
        ax = matvec(x)
        bx = b_matvec(x) if b_matvec is not None else x
        lam = jnp.vdot(x, ax) / jnp.maximum(jnp.vdot(x, bx), TINY)
        r = ax - lam * bx
        res_norm = float(jnp.linalg.norm(r))
        if res_norm < tol:
            break
        cols = [x, r] if p is None else [x, r, p]
        W = jnp.stack(cols, axis=1)
        # Normalize columns for conditioning
        W = W / jnp.maximum(jnp.linalg.norm(W, axis=0, keepdims=True), TINY)
        AW = jnp.stack([matvec(W[:, i]) for i in range(W.shape[1])], axis=1)
        BW = (
            jnp.stack([b_matvec(W[:, i]) for i in range(W.shape[1])], axis=1)
            if b_matvec is not None
            else W
        )
        lam_new, x_new = _rayleigh_ritz_smallest(W, AW, BW)
        p = x_new - x * jnp.vdot(x, x_new)
        pn = jnp.linalg.norm(p)
        p = None if float(pn) < 1e-14 else p / pn
        x = x_new / jnp.maximum(jnp.linalg.norm(x_new), TINY)
        lam = lam_new
    if lam is None:
        ax = matvec(x)
        bx = b_matvec(x) if b_matvec is not None else x
        lam = jnp.vdot(x, ax) / jnp.maximum(jnp.vdot(x, bx), TINY)
        res_norm = float(jnp.linalg.norm(ax - lam * bx))
    return float(lam), x, res_norm


# ---------------------------------------------------------------------------
# Fused LOBPCG: whole iteration loop as one compiled lax.while_loop kernel
# ---------------------------------------------------------------------------
#
# The eager LOBPCG pays ~15 dispatches per iteration x up to 300
# iterations per window solve; this variant compiles once per
# (kind, operand shapes) and runs the loop on device.  ``kind`` selects
# the matvec structure:
#   "w2"  — 2-core window, standard eig of a single operator
#   "w2s" — 2-core window, shifted pencil  M = A/alpha + D
#   "w2g" — 2-core window, generalized     D x = lam (A + 1e-12 I) x
#   "w1", "w1s", "w1g" — single-core versions
# Operands are passed as a flat tuple of arrays; x shape is derived from
# the operand shapes (static under jit).

def _mv2(phi_l, A_k, A_k1, phi_r, v):
    r = phi_l.shape[2]
    n = A_k.shape[2]
    t = A_k1.shape[2]
    R = phi_r.shape[2]
    x = v.reshape(r, n, t, R)
    return jnp.einsum("lsr,smnk,kptS,LSR,rntR->lmpL", phi_l, A_k, A_k1, phi_r, x).reshape(-1)


def _mv1(phi_l, A_k, phi_r, v):
    r = phi_l.shape[2]
    n = A_k.shape[2]
    R = phi_r.shape[2]
    x = v.reshape(r, n, R)
    return jnp.einsum("lsr,smnS,LSR,rnR->lmL", phi_l, A_k, phi_r, x).reshape(-1)


def _make_matvecs(kind, ops, alpha):
    if kind == "w2":
        mv = lambda v: _mv2(*ops[:4], v)
        bmv = None
    elif kind == "w2s":
        mv = lambda v: _mv2(*ops[:4], v) / alpha + _mv2(*ops[4:8], v)
        bmv = None
    elif kind == "w2g":
        mv = lambda v: _mv2(*ops[:4], v)
        bmv = lambda v: _mv2(*ops[4:8], v) + 1e-12 * v
    elif kind == "w1":
        mv = lambda v: _mv1(*ops[:3], v)
        bmv = None
    elif kind == "w1s":
        mv = lambda v: _mv1(*ops[:3], v) / alpha + _mv1(*ops[3:6], v)
        bmv = None
    elif kind == "w1g":
        mv = lambda v: _mv1(*ops[:3], v)
        bmv = lambda v: _mv1(*ops[3:6], v) + 1e-12 * v
    else:
        raise ValueError(kind)
    return mv, (bmv or (lambda v: v))


@functools.partial(jax.jit, static_argnums=(0, 4))
def _lobpcg_fused(kind, ops, x0, tol, maxiter, alpha):
    mv, bmv = _make_matvecs(kind, ops, alpha)
    n = x0.size

    def rr(W, AW, BW):
        # delegate to the shared Rayleigh-Ritz (incl. the dropped-direction
        # penalty that prevents spurious 0-Ritz-values on PSD operators)
        return _rayleigh_ritz_smallest(W, AW, BW)

    x = x0.reshape(-1)
    nrm = jnp.linalg.norm(x)
    x = jnp.where(nrm > 0, x / jnp.maximum(nrm, TINY),
                  jnp.ones_like(x) / np.sqrt(n))
    # k=1 lock-on guard: a warm start that is EXACTLY an interior
    # eigenvector has zero overlap with the extremal one and LOBPCG would
    # terminate on its (tiny) residual at the wrong pair.  Mixing a small
    # deterministic random component guarantees nonzero overlap — the
    # a.s.-convergence argument for random initialisation — at the cost of
    # a few extra iterations on already-converged warm starts.
    noise = jax.random.normal(jax.random.PRNGKey(n), (n,), dtype=x.dtype)
    x = x + 1e-3 * noise / jnp.maximum(jnp.linalg.norm(noise), TINY)
    x = x / jnp.maximum(jnp.linalg.norm(x), TINY)
    bx = bmv(x)
    x = x / jnp.sqrt(jnp.abs(jnp.vdot(x, bx)) + TINY)
    p = jnp.zeros_like(x)

    def cond(state):
        x, p, lam, res, it = state
        return jnp.logical_and(it < maxiter, res > tol)

    def body(state):
        x, p, lam, res, it = state
        ax = mv(x)
        bx = bmv(x)
        lam = jnp.vdot(x, ax) / jnp.maximum(jnp.vdot(x, bx), TINY)
        r = ax - lam * bx
        res = jnp.linalg.norm(r)
        W = jnp.stack([x, r, p], axis=1)
        W = W / jnp.maximum(jnp.linalg.norm(W, axis=0, keepdims=True), TINY)
        AW = jnp.stack([mv(W[:, i]) for i in range(3)], axis=1)
        BW = jnp.stack([bmv(W[:, i]) for i in range(3)], axis=1)
        lam_new, x_new = rr(W, AW, BW)
        p_new = x_new - x * jnp.vdot(x, x_new)
        pn = jnp.linalg.norm(p_new)
        p_new = jnp.where(pn < 1e-14, jnp.zeros_like(p_new), p_new / jnp.maximum(pn, TINY))
        x_new = x_new / jnp.maximum(jnp.linalg.norm(x_new), TINY)
        return (x_new, p_new, lam_new, res, it + 1)

    init = (x, p, jnp.asarray(jnp.inf, dtype=x.dtype),
            jnp.asarray(jnp.inf, dtype=x.dtype), jnp.asarray(0, dtype=jnp.int32))
    x, p, lam, res, it = jax.lax.while_loop(cond, body, init)
    # final Rayleigh quotient + residual of the returned vector
    ax = mv(x)
    bx = bmv(x)
    lam = jnp.vdot(x, ax) / jnp.maximum(jnp.vdot(x, bx), TINY)
    res = jnp.linalg.norm(ax - lam * bx)
    return lam, x, res


def lobpcg_fused(kind, ops, x0, tol, maxiter, alpha=1.0):
    """Host wrapper: returns (float eigval, eigvec, float residual)."""
    lam, x, res = _lobpcg_fused(
        kind, tuple(ops), x0,
        jnp.asarray(tol, dtype=x0.dtype), int(maxiter),
        jnp.asarray(alpha, dtype=x0.dtype),
    )
    return float(lam), x, float(res)


@functools.partial(jax.jit, static_argnums=(0,))
def _dense_smallest(kind, ops, alpha):
    """Dense smallest-eigenpair fallback for small windows: assemble the
    projected operator and eigh it (the reference's dense eigsh path,
    src/tt_als.py:957-994).  Returns (lam, vec)."""
    def asm2(phi_l, A_k, A_k1, phi_r):
        t = jnp.einsum("lsr,smnk,kptS,LSR->lmpLrntR", phi_l, A_k, A_k1, phi_r)
        m = t.shape[0] * t.shape[1] * t.shape[2] * t.shape[3]
        return t.reshape(m, m)

    def asm1(phi_l, A_k, phi_r):
        t = jnp.einsum("lsr,smnS,LSR->lmLrnR", phi_l, A_k, phi_r)
        m = t.shape[0] * t.shape[1] * t.shape[2]
        return t.reshape(m, m)

    if kind == "w2":
        M = asm2(*ops[:4])
        B = None
    elif kind == "w2s":
        M = asm2(*ops[:4]) / alpha + asm2(*ops[4:8])
        B = None
    elif kind == "w2g":
        M = asm2(*ops[:4])
        B = asm2(*ops[4:8])
    elif kind == "w1":
        M = asm1(*ops[:3])
        B = None
    elif kind == "w1s":
        M = asm1(*ops[:3]) / alpha + asm1(*ops[3:6])
        B = None
    elif kind == "w1g":
        M = asm1(*ops[:3])
        B = asm1(*ops[3:6])
    else:
        raise ValueError(kind)
    M = 0.5 * (M + M.T)
    if B is None:
        ev, U = safe_eigh(M)
        return ev[0], U[:, 0]
    B = 0.5 * (B + B.T) + 1e-11 * jnp.eye(B.shape[0], dtype=B.dtype)
    L = jnp.linalg.cholesky(B)
    import jax.scipy.linalg as _jla
    W = _jla.solve_triangular(L, M, lower=True)
    W = _jla.solve_triangular(L, W.T, lower=True)
    ev, U = safe_eigh(0.5 * (W + W.T))
    v = _jla.solve_triangular(L.T, U[:, 0], lower=False)
    return ev[0], v / jnp.linalg.norm(v)


_DENSE_EIG_DIRECT = 256   # assemble+eigh outright (reference size_limit gate)
_DENSE_EIG_LIMIT = 1024   # rescue ceiling when LOBPCG stalls


def lobpcg_window(kind, ops, x0, tol, maxiter, alpha=1.0):
    """Window eigensolve: dense eigh for small windows (mirrors the
    reference's dense-eigsh gate, src/tt_als.py:956-996 — LOBPCG with k=1
    can lock onto a non-extremal eigenpair on near-diagonal operators),
    fused LOBPCG beyond, with a dense rescue when the iteration stalls."""
    m = x0.size
    if m <= _DENSE_EIG_DIRECT:
        lam_d, xd = _dense_smallest(kind, tuple(ops), jnp.asarray(alpha, dtype=x0.dtype))
        if np.isfinite(float(lam_d)):
            return float(lam_d), xd.reshape(x0.shape), 0.0
    lam, x, res = lobpcg_fused(kind, ops, x0, tol, maxiter, alpha=alpha)
    if m <= _DENSE_EIG_LIMIT and (not np.isfinite(res) or res > max(100 * tol, 1e-7)):
        lam_d, xd = _dense_smallest(
            kind, tuple(ops), jnp.asarray(alpha, dtype=x0.dtype)
        )
        if np.isfinite(float(lam_d)) and float(lam_d) <= lam:
            return float(lam_d), xd.reshape(x0.shape), 0.0
    return lam, x, res


def _maxiter_for(m: int) -> int:
    return max(20, min(300, 5 * int(m)))


# ---------------------------------------------------------------------------
# Local window solves for the generalized step-size search
# ---------------------------------------------------------------------------

def _window_matvecs_2core(phiA_l, A_k, A_k1, phiA_r, shape):
    """Matrix-free matvec of a projected 2-core operator window."""

    def mv(vec):
        x = vec.reshape(shape)
        out = jnp.einsum("lsr,smnk,kptS,LSR,rntR->lmpL", phiA_l, A_k, A_k1, phiA_r, x)
        return out.reshape(-1)

    return mv


def _window_matvec_1core(phi_l, A_k, phi_r, shape):
    def mv(vec):
        x = vec.reshape(shape)
        out = jnp.einsum("lsr,smnS,LSR,rnR->lmL", phi_l, A_k, phi_r, x)
        return out.reshape(-1)

    return mv


def _step_size_window_solve(
    sol1, sol2, XAX_l, A_k, A_k1, XAX_r, XDX_l, D_k, D_k1, XDX_r,
    step_size, trunc_tol, eps, max_rank, rng, bwd=True,
):
    """Smallest-eig window solve for ``(1/alpha) A + Delta`` with the
    shrink-on-negative rule (src/tt_als.py:931-1038)."""
    if (not np.isfinite(step_size)) or step_size <= 0:
        return sol1, sol2, 0.0, np.inf, 0.0

    prev = jnp.einsum("rny,ytR->rntR", sol1, sol2)
    shape = prev.shape
    m = int(np.prod(shape))
    prev_vec = prev.reshape(-1)

    mv_A = _window_matvecs_2core(XAX_l, A_k, A_k1, XAX_r, shape)
    mv_D = _window_matvecs_2core(XDX_l, D_k, D_k1, XDX_r, shape)
    ops_AD = (XAX_l, A_k, A_k1, XAX_r, XDX_l, D_k, D_k1, XDX_r)

    lam, x, res = lobpcg_window(
        "w2s", ops_AD, prev_vec, eps, _maxiter_for(min(m, 60)), alpha=step_size
    )
    sol_vec = x
    if lam < 0:
        # alpha too large: largest lambda with -Delta v = lambda A v, i.e.
        # smallest of (Delta, A); alpha <- min(alpha, 1/lambda_max).
        ops_DA = (XDX_l, D_k, D_k1, XDX_r, XAX_l, A_k, A_k1, XAX_r)
        lam_g, xg, res_g = lobpcg_window(
            "w2g", ops_DA, sol_vec, eps, _maxiter_for(min(m, 60))
        )
        lam_max = -lam_g
        if np.isfinite(lam_max) and lam_max > 0:
            step_size = max(0.0, min(step_size, 1.0 / lam_max))
        else:
            step_size *= 1 - eps

    # Residual of the *previous* iterate in the updated operator — this is
    # what the sweep's convergence check uses (src/tt_als.py:995-996).
    denom = step_size if step_size > 0 else 1.0
    Mp = mv_A(prev_vec) / denom + mv_D(prev_vec)
    lam_prev = jnp.vdot(prev_vec, Mp)
    old_res = float(jnp.linalg.norm(Mp - lam_prev * prev_vec))
    # ||M p|| for a unit previous iterate: a cheap lower bound on the
    # window pencil's norm, used by the driver to floor the unconverged-
    # solve penalty tolerance at the dtype's achievable residual (same
    # scale-aware rule as fused_eigen.py; at large d the pencil norms grow
    # with the iterate norms and an absolute tol=1e-8 floor penalises
    # residuals that are already at this dtype's rounding noise).
    scale = float(jnp.linalg.norm(Mp))

    sol_vec = sol_vec / jnp.maximum(jnp.linalg.norm(sol_vec), TINY)
    mat = sol_vec.reshape(int(np.prod(shape[:2])), int(np.prod(shape[2:])))
    if bwd:
        u, s, v_t = safe_svd(mat.T, full_matrices=False)
        v = s[:, None] * v_t
        r = min(prune_singular_vals(np.asarray(s), trunc_tol), max_rank)
        s1, s2, r = add_kick_rank_rev(v[:r].T, u[:, :r].T, 4, rng)
        s1, s2, r = pad_bond_factors(s1, s2, r, orth="right")
        sol2_new = s2.reshape(r, shape[2], shape[3])
        sol1_new = s1.reshape(shape[0], shape[1], r)
    else:
        u, s, v_t = safe_svd(mat, full_matrices=False)
        r = min(prune_singular_vals(np.asarray(s), trunc_tol), max_rank)
        u1 = u[:, :r]
        v2 = s[:r, None] * v_t[:r]
        s1, s2, r = add_kick_rank(u1, v2, 4, rng)
        s1, s2, r = pad_bond_factors(s1, s2, r)
        sol1_new = s1.reshape(shape[0], shape[1], r)
        sol2_new = s2.reshape(r, shape[2], shape[3])
    return sol1_new, sol2_new, float(step_size), old_res, scale


def _step_size_last_solve(prev, XDX_l, D_k, XDX_r, XAX_l, A_k, XAX_r, step_size, eps):
    """Single-core refinement pass (src/tt_als.py:1056-1129)."""
    if (not np.isfinite(step_size)) or step_size <= 0:
        return prev.reshape(-1, 1), 0.0, np.inf
    shape = prev.shape
    m = int(np.prod(shape))
    mv_A = _window_matvec_1core(XAX_l, A_k, XAX_r, shape)
    mv_D = _window_matvec_1core(XDX_l, D_k, XDX_r, shape)

    prev_vec = prev.reshape(-1)
    lam, x, res = lobpcg_window(
        "w1s", (XAX_l, A_k, XAX_r, XDX_l, D_k, XDX_r), prev_vec, eps,
        _maxiter_for(min(m, 60)), alpha=step_size,
    )
    if lam < 0:
        lam_g, xg, _ = lobpcg_window(
            "w1g", (XDX_l, D_k, XDX_r, XAX_l, A_k, XAX_r), x, eps,
            _maxiter_for(min(m, 60)),
        )
        lam_max = -lam_g
        if np.isfinite(lam_max) and lam_max > 0:
            step_size = max(0.0, min(step_size, 1.0 / lam_max))
        else:
            step_size *= 1 - eps
    denom = step_size if step_size > 0 else 1.0
    Mp = mv_A(prev_vec) / denom + mv_D(prev_vec)
    lam_prev = jnp.vdot(prev_vec, Mp)
    old_res = float(jnp.linalg.norm(Mp - lam_prev * prev_vec))
    return x.reshape(-1, 1), float(step_size), old_res


def _eigen_residual_stalled(prev_res, res, tol):
    return (
        np.isfinite(prev_res) and np.isfinite(res)
        and res <= 50 * tol and res >= 0.8 * prev_res
    )


def _eigen_step_stalled(prev_step, step, prev_res, res, tol):
    if prev_step is None:
        return False
    scale = max(abs(step), abs(prev_step), 1.0)
    return (
        abs(step - prev_step) <= max(10 * tol, 1e-12) * scale
        and _eigen_residual_stalled(prev_res, res, tol)
    )


def tt_max_generalised_eigen(
    A: TT, Delta: TT, x0: Optional[TT] = None, nswp: int = 10, tol: float = 1e-8,
    size_limit: int = 256, verbose: bool = False,
):
    """Largest ``alpha`` with ``A + alpha*Delta ⪰ 0`` (step-size search),
    returning (alpha, eigen TT warm start).  Parity: src/tt_als.py:1132-1283.
    """
    from ttipm_tpu.ops.random import tt_random_gaussian

    rng = np.random
    if x0 is None:
        x_cores = tt_random_gaussian([2] * (len(A) - 1), (A[0].shape[2],))
    else:
        x_cores = list(x0)

    d = len(x_cores)
    rx = np.array([1] + tt_ranks(x_cores) + [1])
    N = np.array([c.shape[1] for c in x_cores])
    ones3 = jnp.ones((1, 1, 1), dtype=config.dtype())
    XAX = [ones3] + [None] * (d - 1) + [ones3]
    XDX = [ones3] + [None] * (d - 1) + [ones3]

    step_size = 1.0
    local_res = np.inf * np.ones((2, max(d - 1, 1)))
    # per-window pencil scale ||M p||, tracked NEXT TO each residual so the
    # unconverged-solve penalty compares each window's residual against its
    # OWN scale (a transiently large pencil norm in one window must not
    # inflate the floor for residuals measured in smaller-norm windows)
    local_scale = np.zeros((2, max(d - 1, 1)))
    max_rank = int(np.floor(2 ** (d / 2)))
    trunc_tol = tol / np.sqrt(d)
    prev_sweep_step = None
    prev_sweep_res = np.inf

    def finish_fwd():
        nonlocal step_size
        for k in range(d):
            prev = x_cores[k]
            sol, step_size_n, _ = _step_size_last_solve(
                prev, XDX[k], Delta[k], XDX[k + 1], XAX[k], A[k], XAX[k + 1],
                step_size, tol,
            )
            step_size = step_size_n
            sol = jnp.reshape(sol, (rx[k] * N[k], rx[k + 1]))
            if k < d - 1:
                u, s, v_t = safe_svd(sol, full_matrices=False)
                v = s[:, None] * v_t
                r = min(prune_singular_vals(np.asarray(s), trunc_tol), max_rank)
                x_cores[k] = u[:, :r].reshape(rx[k], N[k], r)
                x_cores[k + 1] = jnp.einsum("ij,jkl->ikl", v[:r], x_cores[k + 1]).reshape(
                    r, N[k + 1], rx[k + 2]
                )
                rx[k + 1] = r
                XAX[k + 1] = compute_phi_fwd_A(XAX[k], x_cores[k], A[k], x_cores[k])
                XDX[k + 1] = compute_phi_fwd_A(XDX[k], x_cores[k], Delta[k], x_cores[k])
            else:
                x_cores[k] = jnp.reshape(sol, (rx[k], N[k], rx[k + 1]))

    def finish_bck():
        nonlocal step_size
        for k in range(d - 1, -1, -1):
            prev = x_cores[k]
            sol, step_size_n, _ = _step_size_last_solve(
                prev, XDX[k], Delta[k], XDX[k + 1], XAX[k], A[k], XAX[k + 1],
                step_size, tol,
            )
            step_size = step_size_n
            sol = jnp.reshape(sol, (rx[k], N[k] * rx[k + 1])).T
            if k > 0:
                u, s, v_t = safe_svd(sol, full_matrices=False)
                v = s[:, None] * v_t
                r = min(prune_singular_vals(np.asarray(s), trunc_tol), max_rank)
                x_cores[k] = jnp.reshape(u[:, :r].T, (r, N[k], rx[k + 1]))
                x_cores[k - 1] = jnp.einsum("rdc,cR->rdR", x_cores[k - 1], v[:r].T)
                rx[k] = r
                XAX[k] = compute_phi_bck_A(XAX[k + 1], x_cores[k], A[k], x_cores[k])
                XDX[k] = compute_phi_bck_A(XDX[k + 1], x_cores[k], Delta[k], x_cores[k])
            else:
                x_cores[k] = jnp.reshape(sol, (rx[k], N[k], rx[k + 1]))

    swp = 0
    for swp in range(nswp):
        config.maybe_relieve_map_pressure()  # ragged shapes, see amen.py
        zero_step = False
        # Backward half sweep over 2-core windows
        for k in range(d - 1, 0, -1):
            if swp > 0:
                x_cores[k - 1], x_cores[k], step_size, res, scl = (
                    _step_size_window_solve(
                        x_cores[k - 1], x_cores[k],
                        XAX[k - 1], A[k - 1], A[k], XAX[k + 1],
                        XDX[k - 1], Delta[k - 1], Delta[k], XDX[k + 1],
                        step_size, trunc_tol, tol, max_rank, rng, bwd=True,
                    )
                )
                local_res[0, k - 1] = res
                local_scale[0, k - 1] = scl
                if step_size <= 0:
                    zero_step = True
                    break
            else:
                sol = jnp.reshape(x_cores[k], (rx[k], N[k] * rx[k + 1])).T
                u, s, v_t = safe_svd(sol, full_matrices=False)
                v = s[:, None] * v_t
                r = min(prune_singular_vals(np.asarray(s), trunc_tol), max_rank)
                x_cores[k] = jnp.reshape(u[:, :r].T, (r, N[k], rx[k + 1]))
                x_cores[k - 1] = jnp.einsum("rdc,cR->rdR", x_cores[k - 1], v[:r].T)
            rx[k] = int(x_cores[k].shape[0])
            XAX[k] = compute_phi_bck_A(XAX[k + 1], x_cores[k], A[k], x_cores[k])
            XDX[k] = compute_phi_bck_A(XDX[k + 1], x_cores[k], Delta[k], x_cores[k])

        if zero_step:
            break
        if np.max(local_res) < tol or swp == nswp - 1:
            finish_fwd()
            break

        # Forward half sweep
        for k in range(d - 1):
            x_cores[k], x_cores[k + 1], step_size, res, scl = (
                _step_size_window_solve(
                    x_cores[k], x_cores[k + 1],
                    XAX[k], A[k], A[k + 1], XAX[k + 2],
                    XDX[k], Delta[k], Delta[k + 1], XDX[k + 2],
                    step_size, trunc_tol, tol, max_rank, rng, bwd=False,
                )
            )
            local_res[1, k] = res
            local_scale[1, k] = scl
            if step_size <= 0:
                zero_step = True
                break
            rx[k + 1] = int(x_cores[k + 1].shape[0])
            XAX[k + 1] = compute_phi_fwd_A(XAX[k], x_cores[k], A[k], x_cores[k])
            XDX[k + 1] = compute_phi_fwd_A(XDX[k], x_cores[k], Delta[k], x_cores[k])

        if zero_step:
            break
        if np.max(local_res) < tol:
            finish_bck()
            break

        sweep_res = float(np.max(local_res))
        if swp >= 2 and _eigen_step_stalled(prev_sweep_step, step_size, prev_sweep_res, sweep_res, tol):
            break
        prev_sweep_step = step_size
        prev_sweep_res = sweep_res

    max_res = float(np.max(local_res))
    x_cores = tt_normalise(x_cores)
    # Unconverged-eigensolve penalty (reference src/tt_als.py:1280-1283):
    # conservative step shrink by tol/res.  The tolerance must be floored
    # at the dtype's achievable residual: under the f32 profile the sweeps
    # converge to res ~ 5e-8 (input-representation floor) while the
    # callers pass the reference's f64-calibrated tol=1e-8, and the
    # penalty silently crushed CORRECT step sizes 4-16x per iteration
    # (measured 2026-08-19: step 1.0 -> 0.23 at maxcut d3 iteration 0,
    # stalling the IPM at slackness 1e-2).
    # Scale-aware floor (same rule as fused_eigen.py): a residual at
    # 4*eps*||M|| is this dtype's rounding noise for the window pencils —
    # at large d the pencil norms grow with the iterate norms and the
    # reference's absolute tol=1e-8 would penalise converged solves
    # (measured at maxcut d11: pencil scales ~1e2, achievable residual
    # above 1e-8, steps crushed every iteration).
    eps_dt = float(jnp.finfo(config.dtype()).eps)
    if A and hasattr(A[0], "dtype"):
        eps_dt = max(eps_dt, float(jnp.finfo(A[0].dtype).eps))
    # Per-window floors: window k's achievable residual is set by ITS pencil
    # scale (advisor round-3: a global max_scale let a transiently large
    # window inflate the floor for residuals measured in smaller-norm
    # windows, silently skipping the penalty — most likely under f32).
    floors = np.maximum(max(tol, 30.0 * eps_dt), 4.0 * eps_dt * local_scale)
    with np.errstate(invalid="ignore"):
        ratios = local_res / floors
    ratios = ratios[np.isfinite(ratios)]
    worst = float(np.max(ratios)) if ratios.size else 0.0
    if worst > 1.0 and np.isfinite(max_res) and max_res > 0:
        step_size /= worst
    return step_size, x_cores


# ---------------------------------------------------------------------------
# Plain smallest-eigenvector sweeps (inequality step sizes)
# ---------------------------------------------------------------------------

def _eigen_window_solve(sol1, sol2, XAX_l, A_k, A_k1, XAX_r, trunc_tol, eps,
                        max_rank, rng, bwd=True):
    prev = jnp.einsum("rny,ytR->rntR", sol1, sol2)
    shape = prev.shape
    m = int(np.prod(shape))
    mv = _window_matvecs_2core(XAX_l, A_k, A_k1, XAX_r, shape)
    lam, x, _ = lobpcg_window(
        "w2", (XAX_l, A_k, A_k1, XAX_r), prev.reshape(-1), eps,
        _maxiter_for(min(m, 60)),
    )
    prev_vec = prev.reshape(-1)
    Ap = mv(prev_vec)
    lam_prev = jnp.vdot(prev_vec, Ap)
    old_res = float(jnp.linalg.norm(lam_prev * prev_vec - Ap))
    mat = x.reshape(int(np.prod(shape[:2])), int(np.prod(shape[2:])))
    if bwd:
        u, s, v_t = safe_svd(mat.T, full_matrices=False)
        v = s[:, None] * v_t
        r = min(prune_singular_vals(np.asarray(s), trunc_tol), max_rank)
        s1, s2, r = add_kick_rank_rev(v[:r].T, u[:, :r].T, 4, rng)
        s1, s2, r = pad_bond_factors(s1, s2, r, orth="right")
        sol2_new = s2.reshape(r, shape[2], shape[3])
        sol1_new = s1.reshape(shape[0], shape[1], r)
    else:
        u, s, v_t = safe_svd(mat, full_matrices=False)
        r = min(prune_singular_vals(np.asarray(s), trunc_tol), max_rank)
        s1, s2, r = add_kick_rank(u[:, :r], s[:r, None] * v_t[:r], 4, rng)
        s1, s2, r = pad_bond_factors(s1, s2, r)
        sol1_new = s1.reshape(shape[0], shape[1], r)
        sol2_new = s2.reshape(r, shape[2], shape[3])
    return sol1_new, sol2_new, old_res


def tt_min_eig(
    A: TT, x0: Optional[TT] = None, nswp: int = 10, tol: float = 1e-8,
    size_limit: int = 64, return_eig_val: bool = False, verbose: bool = False,
):
    """Smallest eigenvector of a symmetric TT operator
    (src/tt_als.py:1392-1499)."""
    from ttipm_tpu.ops.random import tt_random_gaussian

    rng = np.random
    if x0 is None:
        x_cores = tt_random_gaussian([2] * (len(A) - 1), (A[0].shape[2],))
    else:
        x_cores = list(x0)
    d = len(x_cores)
    rx = np.array([1] + tt_ranks(x_cores) + [1])
    N = np.array([c.shape[1] for c in x_cores])
    ones3 = jnp.ones((1, 1, 1), dtype=config.dtype())
    XAX = [ones3] + [None] * (d - 1) + [ones3]

    max_rank = int(np.floor(2 ** (d / 2)))
    trunc_tol = 0.1 * tol / np.sqrt(d)
    prev_sweep_res = np.inf
    max_res = 0.0

    def finish(direction):
        ks = range(d) if direction > 0 else range(d - 1, -1, -1)
        for k in ks:
            prev = x_cores[k]
            shape = prev.shape
            _, x, _ = lobpcg_window(
                "w1", (XAX[k], A[k], XAX[k + 1]), prev.reshape(-1), tol,
                _maxiter_for(min(int(np.prod(shape)), 60)),
            )
            if direction > 0 and k < d - 1:
                sol = x.reshape(rx[k] * N[k], rx[k + 1])
                u, s, v_t = safe_svd(sol, full_matrices=False)
                v = s[:, None] * v_t
                r = min(prune_singular_vals(np.asarray(s), trunc_tol), max_rank)
                x_cores[k] = u[:, :r].reshape(rx[k], N[k], r)
                x_cores[k + 1] = jnp.einsum("ij,jkl->ikl", v[:r], x_cores[k + 1]).reshape(
                    r, N[k + 1], rx[k + 2]
                )
                rx[k + 1] = r
                XAX[k + 1] = compute_phi_fwd_A(XAX[k], x_cores[k], A[k], x_cores[k])
            elif direction < 0 and k > 0:
                sol = x.reshape(rx[k], N[k] * rx[k + 1]).T
                u, s, v_t = safe_svd(sol, full_matrices=False)
                v = s[:, None] * v_t
                r = min(prune_singular_vals(np.asarray(s), trunc_tol), max_rank)
                x_cores[k] = jnp.reshape(u[:, :r].T, (r, N[k], rx[k + 1]))
                x_cores[k - 1] = jnp.einsum("rdc,cR->rdR", x_cores[k - 1], v[:r].T)
                rx[k] = r
                XAX[k] = compute_phi_bck_A(XAX[k + 1], x_cores[k], A[k], x_cores[k])
            else:
                x_cores[k] = x.reshape(rx[k], N[k], rx[k + 1])

    swp = 0
    for swp in range(nswp):
        config.maybe_relieve_map_pressure()  # ragged shapes, see amen.py
        max_res = np.inf if swp == 0 else 0.0
        for k in range(d - 1, 0, -1):
            if swp > 0:
                x_cores[k - 1], x_cores[k], res = _eigen_window_solve(
                    x_cores[k - 1], x_cores[k], XAX[k - 1], A[k - 1], A[k], XAX[k + 1],
                    trunc_tol, tol, max_rank, rng, bwd=True,
                )
                max_res = max(max_res, res)
            else:
                sol = jnp.reshape(x_cores[k], (rx[k], N[k] * rx[k + 1])).T
                u, s, v_t = safe_svd(sol, full_matrices=False)
                v = s[:, None] * v_t
                r = min(prune_singular_vals(np.asarray(s), trunc_tol), max_rank)
                x_cores[k] = jnp.reshape(u[:, :r].T, (r, N[k], rx[k + 1]))
                x_cores[k - 1] = jnp.einsum("rdc,cR->rdR", x_cores[k - 1], v[:r].T)
            rx[k] = int(x_cores[k].shape[0])
            XAX[k] = compute_phi_bck_A(XAX[k + 1], x_cores[k], A[k], x_cores[k])

        if max_res < tol or swp == nswp - 1:
            finish(+1)
            break

        max_res = 0.0
        for k in range(d - 1):
            x_cores[k], x_cores[k + 1], res = _eigen_window_solve(
                x_cores[k], x_cores[k + 1], XAX[k], A[k], A[k + 1], XAX[k + 2],
                trunc_tol, tol, max_rank, rng, bwd=False,
            )
            max_res = max(max_res, res)
            rx[k + 1] = int(x_cores[k + 1].shape[0])
            XAX[k + 1] = compute_phi_fwd_A(XAX[k], x_cores[k], A[k], x_cores[k])

        if max_res < tol:
            finish(-1)
            break
        if swp >= 2 and _eigen_residual_stalled(prev_sweep_res, max_res, tol):
            break
        prev_sweep_res = max_res

    x_cores = tt_normalise(x_cores)
    min_eig_value = None
    if return_eig_val:
        min_eig_value = tt_inner_prod(
            x_cores, tt_fast_matrix_vec_mul(A, x_cores, 1e-12)
        )
    return x_cores, min_eig_value
