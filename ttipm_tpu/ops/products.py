"""TT products: exact (rank-product) forms, interleaved-truncation forms,
ALS-fitted approximate forms, and the rank-dispatched user-facing wrappers.

The reference computes "fast" products by a cascade of adjacent-core swaps
with interleaved SVD truncation (cy_src/tt_ops_cy.pyx:393-502, after
arXiv:2410.19747).  That algorithm is O(d^2) small SVDs — a poor fit for
XLA.  Here the small-rank regime uses the exact rank-product contraction
(one fused einsum per core, MXU-shaped) followed by a single rounding
sweep, which achieves the same eps-bounded error with O(d) panels; the
large-rank regime keeps the reference's ALS fixed-point fit
(src/tt_als.py:1502-1762) with kick-rank growth and norm rebalancing.

Dispatch thresholds mirror src/tt_als.py:1631-1634 and :1765-1768
(rank-product <= 40 for mat-mat, <= 80 for mat-vec).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ttipm_tpu.ops.jacobi import safe_svd

from ttipm_tpu import config
from ttipm_tpu.ops.rounding import (
    _svd_econ,
    add_kick_rank,
    pad_bond_factors,
    prune_singular_vals,
    tt_rank_reduce,
)
from ttipm_tpu.ops.host_einsum import host_einsum
from ttipm_tpu.ops.tt import TT, symmetric_powers_of_two, tt_ranks

__all__ = [
    "tt_mat_vec_exact",
    "tt_mat_mat_exact",
    "tt_hadamard_exact",
    "tt_fast_matrix_vec_mul",
    "tt_fast_mat_mat_mul",
    "tt_fast_hadamard",
    "tt_approx_mat_mat_mul",
    "tt_approx_mat_vec_mul",
    "tt_mat_mat_mul",
    "tt_mat_vec_mul",
    "tt_skew_zero_op",
]


# ---------------------------------------------------------------------------
# Exact rank-product contractions (one einsum per core)
# ---------------------------------------------------------------------------

def tt_mat_vec_exact(matrix_tt: TT, vec_tt: TT) -> TT:
    """Exact TT matrix @ TT vector; bond ranks multiply."""
    if config.on_host(*matrix_tt, *vec_tt):
        out: TT = []
        for a, x in zip(matrix_tt, vec_tt):
            a, x = np.asarray(a), np.asarray(x)
            c = host_einsum("rmnR,anB->ramRB", a, x)
            out.append(
                c.reshape(
                    a.shape[0] * x.shape[0], a.shape[1],
                    a.shape[-1] * x.shape[-1],
                )
            )
        return out
    return _tt_mat_vec_exact_jit(matrix_tt, vec_tt)


@jax.jit
def _tt_mat_vec_exact_jit(matrix_tt: TT, vec_tt: TT) -> TT:
    out: TT = []
    for a, x in zip(matrix_tt, vec_tt):
        c = jnp.einsum("rmnR,anB->ramRB", a, x)
        out.append(
            c.reshape(a.shape[0] * x.shape[0], a.shape[1], a.shape[-1] * x.shape[-1])
        )
    return out


def tt_mat_mat_exact(matrix_tt_1: TT, matrix_tt_2: TT) -> TT:
    """Exact TT matrix @ TT matrix; bond ranks multiply."""
    if config.on_host(*matrix_tt_1, *matrix_tt_2):
        out: TT = []
        for a, b in zip(matrix_tt_1, matrix_tt_2):
            a, b = np.asarray(a), np.asarray(b)
            c = host_einsum("rmkR,aknB->ramnRB", a, b)
            out.append(
                c.reshape(
                    a.shape[0] * b.shape[0], a.shape[1], b.shape[2],
                    a.shape[-1] * b.shape[-1],
                )
            )
        return out
    return _tt_mat_mat_exact_jit(matrix_tt_1, matrix_tt_2)


@jax.jit
def _tt_mat_mat_exact_jit(matrix_tt_1: TT, matrix_tt_2: TT) -> TT:
    out: TT = []
    for a, b in zip(matrix_tt_1, matrix_tt_2):
        c = jnp.einsum("rmkR,aknB->ramnRB", a, b)
        out.append(
            c.reshape(
                a.shape[0] * b.shape[0], a.shape[1], b.shape[2],
                a.shape[-1] * b.shape[-1],
            )
        )
    return out


def tt_hadamard_exact(train_tt_1: TT, train_tt_2: TT) -> TT:
    """Exact entrywise (Hadamard) product; bond ranks multiply."""
    if config.on_host(*train_tt_1, *train_tt_2):
        out: TT = []
        for a, b in zip(train_tt_1, train_tt_2):
            a, b = np.asarray(a), np.asarray(b)
            if a.ndim == 4:
                c = host_einsum("rmnR,amnB->ramnRB", a, b)
                out.append(
                    c.reshape(
                        a.shape[0] * b.shape[0], a.shape[1], a.shape[2],
                        a.shape[-1] * b.shape[-1],
                    )
                )
            else:
                c = host_einsum("rnR,anB->ranRB", a, b)
                out.append(
                    c.reshape(
                        a.shape[0] * b.shape[0], a.shape[1],
                        a.shape[-1] * b.shape[-1],
                    )
                )
        return out
    return _tt_hadamard_exact_jit(train_tt_1, train_tt_2)


@jax.jit
def _tt_hadamard_exact_jit(train_tt_1: TT, train_tt_2: TT) -> TT:
    out: TT = []
    for a, b in zip(train_tt_1, train_tt_2):
        if a.ndim == 4:
            c = jnp.einsum("rmnR,amnB->ramnRB", a, b)
            out.append(
                c.reshape(
                    a.shape[0] * b.shape[0], a.shape[1], a.shape[2],
                    a.shape[-1] * b.shape[-1],
                )
            )
        else:
            c = jnp.einsum("rnR,anB->ranRB", a, b)
            out.append(
                c.reshape(a.shape[0] * b.shape[0], a.shape[1], a.shape[-1] * b.shape[-1])
            )
    return out


# "Fast" = exact product + one eps-budget rounding sweep.  Same error
# contract as the reference's interleaved-truncation cascade
# (cy_src/tt_ops_cy.pyx:430-502) with O(d) instead of O(d^2) panels.

def tt_fast_matrix_vec_mul(matrix_tt: TT, vec_tt: TT, eps: float = 1e-18) -> TT:
    return tt_rank_reduce(tt_mat_vec_exact(matrix_tt, vec_tt), eps)


def tt_fast_mat_mat_mul(matrix_tt_1: TT, matrix_tt_2: TT, eps: float = 1e-18) -> TT:
    return tt_rank_reduce(tt_mat_mat_exact(matrix_tt_1, matrix_tt_2), eps)


def tt_fast_hadamard(train_tt_1: TT, train_tt_2: TT, eps: float = 1e-18) -> TT:
    return tt_rank_reduce(tt_hadamard_exact(train_tt_1, train_tt_2), eps)


def tt_skew_zero_op(op_tt: TT, eps: float) -> TT:
    """Symmetrise an operator TT in the vec'd index: 0.5*(Op + P Op) with P
    the (2,2)-transposition permutation (src/tt_ops.py:354-357)."""
    from ttipm_tpu.ops.tt import tt_add, tt_scale

    perm = jnp.asarray(np.eye(4)[[0, 2, 1, 3]], dtype=config.dtype()).reshape(1, 4, 4, 1)
    op_t = tt_fast_mat_mat_mul(op_tt, [perm] * len(op_tt), eps)
    return tt_rank_reduce(tt_scale(0.5, tt_add(op_tt, op_t)), eps)


# ---------------------------------------------------------------------------
# ALS approximate products (large-rank regime)
# ---------------------------------------------------------------------------

def _als_product_sweeps(
    contraction_fwd,
    contraction_solution,
    x_cores: TT,
    phys_shape,
    kick_rank: np.ndarray,
    nswp: int,
    tol: float,
) -> TT:
    """Shared alternating-sweep driver for the ALS mat-mat / mat-vec fits.

    ``contraction_solution(phi_l, k, phi_r)`` produces the locally optimal
    core; ``contraction_fwd(phi, k, core, reverse)`` updates the interface
    ("phi") tensor after the core is orthogonalised.  Norm rebalancing via
    ``nrmsc`` follows src/tt_als.py:1553-1566.
    """
    d = len(x_cores)
    host = config.on_host(*x_cores)
    xp = np if host else jnp
    if host:
        x_cores = [np.asarray(c) for c in x_cores]
    rx = np.array([1] + tt_ranks(x_cores) + [1])
    phi = [xp.ones((1, 1, 1), dtype=config.dtype())] + [None] * (d - 1) + [
        xp.ones((1, 1, 1), dtype=config.dtype())
    ]
    norm_phi = np.ones(d - 1)
    normx = np.ones(d - 1)
    nrmsc = 1.0
    tol_bond = tol / np.sqrt(d)

    last = False
    prev_res = np.inf
    stagnant = 0
    for swp in range(nswp):
        max_res = np.inf if swp == 0 else 0.0
        # Backward sweep
        for k in range(d - 1, -1, -1):
            if swp > 0:
                prev = x_cores[k]
                sol = contraction_solution(phi[k], k, phi[k + 1]) * nrmsc
                res = float(
                    xp.linalg.norm(sol - prev)
                    / max(float(xp.linalg.norm(sol)), 1e-8)
                )
                max_res = max(max_res, res)
                mat = sol.reshape(rx[k], -1).T
            else:
                mat = x_cores[k].reshape(rx[k], -1).T
            if k > 0:
                u, s, v_t = _svd_econ(mat)
                v = s[:, None] * v_t
                r = prune_singular_vals(np.asarray(s), tol_bond)
                if not last:
                    u, v, r = add_kick_rank(u[:, :r], v[:r], int(kick_rank[k - 1]))
                else:
                    u, v = u[:, :r], v[:r]
                u, v, r = pad_bond_factors(u, v, r)
                nrmsc *= normx[k - 1] / norm_phi[k - 1]
                x_cores[k] = u.T.reshape(r, *phys_shape(k), rx[k + 1])
                x_cores[k - 1] = xp.tensordot(x_cores[k - 1], v.T, axes=([-1], [0]))
                norm_now = float(xp.linalg.norm(x_cores[k - 1]))
                normx[k - 1] *= norm_now
                x_cores[k - 1] = x_cores[k - 1] / norm_now
                rx[k] = r
                phi[k] = contraction_fwd(phi[k + 1], k, x_cores[k], True)
                nrm = float(xp.linalg.norm(phi[k])) or 1.0
                phi[k] = phi[k] / nrm
                norm_phi[k - 1] = nrm
                nrmsc *= norm_phi[k - 1] / normx[k - 1]
            else:
                x_cores[k] = mat.T.reshape(rx[k], *phys_shape(k), rx[k + 1])
        if last:
            break
        if max_res < tol or swp == nswp - 1:
            last = True
        # Forward sweep
        max_res = 0.0
        for k in range(d):
            prev = x_cores[k]
            sol = contraction_solution(phi[k], k, phi[k + 1]) * nrmsc
            res = float(
                xp.linalg.norm(sol - prev) / max(float(xp.linalg.norm(sol)), 1e-8)
            )
            max_res = max(max_res, res)
            mat = sol.reshape(-1, rx[k + 1])
            if k < d - 1:
                nrmsc *= normx[k] / norm_phi[k]
                u, s, v_t = _svd_econ(mat)
                v = s[:, None] * v_t
                r = prune_singular_vals(np.asarray(s), tol_bond)
                if not last:
                    u, v, r = add_kick_rank(u[:, :r], v[:r, :], int(kick_rank[k]))
                else:
                    u, v = u[:, :r], v[:r, :]
                u, v, r = pad_bond_factors(u, v, r)
                x_cores[k] = u.reshape(rx[k], *phys_shape(k), r)
                x_cores[k + 1] = xp.tensordot(v, x_cores[k + 1], axes=([1], [0]))
                norm_now = float(xp.linalg.norm(x_cores[k + 1]))
                normx[k] *= norm_now
                x_cores[k + 1] = x_cores[k + 1] / norm_now
                rx[k + 1] = r
                phi[k + 1] = contraction_fwd(phi[k], k, x_cores[k], False)
                nrm = float(xp.linalg.norm(phi[k + 1])) or 1.0
                phi[k + 1] = phi[k + 1] / nrm
                norm_phi[k] = nrm
                nrmsc *= norm_phi[k] / normx[k]
            else:
                x_cores[k] = mat.reshape(rx[k], *phys_shape(k), rx[k + 1])
        if last:
            break
        if max_res < tol:
            last = True
        # Stagnation early-stop: the fit runs at a BOUNDED rank, so a
        # tolerance below the best bounded-rank approximation error is
        # unreachable and the loop would burn all ``nswp`` sweeps making
        # no progress (measured: a refine-path product at operator rank
        # ~169 cost minutes per call this way).  Near tol (<=10x) two
        # sweeps without a 5% improvement = converged-at-this-rank; far
        # above tol a steadily-but-slowly converging fit (e.g. ~4%/sweep)
        # must keep going, so the exit there needs three consecutive
        # sweeps at <2% improvement (a genuine bounded-rank plateau).
        near_tol = max_res <= 10.0 * tol
        factor, need = (1.05, 2) if near_tol else (1.02, 3)
        if np.isfinite(prev_res) and max_res > prev_res / factor:
            stagnant += 1
            if stagnant >= need:
                last = True
        else:
            stagnant = 0
        prev_res = max_res

    norm_total = float(np.exp(np.sum(np.log(normx)) / d))
    return [norm_total * core for core in x_cores]


def tt_approx_mat_mat_mul(
    A: TT, D: TT, x0: Optional[TT] = None, kick_rank=None, nswp: int = 50,
    tol: float = 1e-6, verbose: bool = False,
) -> TT:
    """ALS fixed-point fit of the TT matrix product A @ D at bounded rank
    (src/tt_als.py:1502-1628)."""
    from ttipm_tpu.ops.random import tt_random_gaussian

    if x0 is None:
        max_ranks = np.maximum(
            (np.array(tt_ranks(A)) + np.array(tt_ranks(D))) / 2, 2
        ).astype(int)
        x_cores = tt_random_gaussian(list(max_ranks), tuple(A[0].shape[1:-1]))
    else:
        x_cores = list(x0)
        max_ranks = np.array(tt_ranks(x0))
    if kick_rank is None:
        kick_rank = np.maximum(
            (symmetric_powers_of_two(len(A) - 1) - max_ranks) / (nswp / 2), 2
        ).astype(int)

    if config.on_host(*A, *D):
        A = [np.asarray(c) for c in A]
        D = [np.asarray(c) for c in D]
        es = host_einsum
    else:
        es = jnp.einsum

    def phys_shape(k):
        return (A[k].shape[1], D[k].shape[2])

    def solution(phi_l, k, phi_r):
        return es("rab,amkA,bknB,RAB->rmnR", phi_l, A[k], D[k], phi_r)

    def fwd(phi, k, core, reverse):
        if reverse:
            return es("RAB,amkA,bknB,rmnR->rab", phi, A[k], D[k], core)
        return es("rab,amkA,bknB,rmnR->RAB", phi, A[k], D[k], core)

    return _als_product_sweeps(fwd, solution, x_cores, phys_shape, kick_rank, nswp, tol)


def tt_approx_mat_vec_mul(
    A: TT, d_vec: TT, x0: Optional[TT] = None, kick_rank=None, nswp: int = 50,
    tol: float = 1e-6, verbose: bool = False,
) -> TT:
    """ALS fixed-point fit of the TT mat-vec A @ d (src/tt_als.py:1637-1762)."""
    from ttipm_tpu.ops.random import tt_random_gaussian

    if x0 is None:
        max_ranks = np.maximum(
            (np.array(tt_ranks(A)) + np.array(tt_ranks(d_vec))) / 2, 2
        ).astype(int)
        x_cores = tt_random_gaussian(list(max_ranks), (A[0].shape[2],))
    else:
        x_cores = list(x0)
        max_ranks = np.array(tt_ranks(x0))
    if kick_rank is None:
        kick_rank = np.maximum(
            (symmetric_powers_of_two(len(A) - 1) - max_ranks) / (nswp / 2), 2
        ).astype(int)

    if config.on_host(*A, *d_vec):
        A = [np.asarray(c) for c in A]
        d_vec = [np.asarray(c) for c in d_vec]
        es = host_einsum
    else:
        es = jnp.einsum

    def phys_shape(k):
        return (A[k].shape[1],)

    def solution(phi_l, k, phi_r):
        return es("rab,amkA,bkB,RAB->rmR", phi_l, A[k], d_vec[k], phi_r)

    def fwd(phi, k, core, reverse):
        if reverse:
            return es("RAB,amkA,bkB,rmR->rab", phi, A[k], d_vec[k], core)
        return es("rab,amkA,bkB,rmR->RAB", phi, A[k], d_vec[k], core)

    return _als_product_sweeps(fwd, solution, x_cores, phys_shape, kick_rank, nswp, tol)


# ---------------------------------------------------------------------------
# Rank-dispatched wrappers (src/tt_als.py:1631-1634, :1765-1768)
# ---------------------------------------------------------------------------

def tt_mat_mat_mul(mat1: TT, mat2: TT, op_tol: float, eps: float,
                   verbose: bool = False, x0: Optional[TT] = None) -> TT:
    rank_prod = np.array(tt_ranks(mat1)) * np.array(tt_ranks(mat2))
    if rank_prod.size == 0 or rank_prod.max() <= 40:
        return tt_rank_reduce(tt_mat_mat_exact(mat1, mat2), eps=op_tol)
    return tt_approx_mat_mat_mul(mat1, mat2, x0=x0, tol=op_tol,
                                 verbose=verbose)


def tt_mat_vec_mul(mat: TT, vec: TT, op_tol: float, eps: float,
                   verbose: bool = False, x0: Optional[TT] = None) -> TT:
    """``x0``: warm start for the ALS path only (the exact path ignores
    it).  The IPM's refine rounds fit the same high-rank product against
    a slightly-perturbed input every round — warm-starting from the
    previous round's fit turns a full ALS ramp into 1-2 sweeps."""
    rank_prod = np.array(tt_ranks(mat)) * np.array(tt_ranks(vec))
    if rank_prod.size == 0 or rank_prod.max() <= 80:
        return tt_rank_reduce(tt_mat_vec_exact(mat, vec), op_tol)
    return tt_approx_mat_vec_mul(mat, vec, x0=x0, tol=op_tol,
                                 verbose=verbose)
