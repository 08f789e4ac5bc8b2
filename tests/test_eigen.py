"""Eigensolver tests: LOBPCG, step-size search, min-eig sweeps."""

import numpy as np
import jax.numpy as jnp

from ttipm_tpu.ops.rounding import tt_rank_reduce
from ttipm_tpu.ops.random import tt_random_gaussian
from ttipm_tpu.ops.tt import (
    tt_add,
    tt_diag_op,
    tt_identity,
    tt_matrix_to_matrix,
    tt_matrix_svd,
    tt_scale,
    tt_vec_to_vec,
    tt_reshape,
)
from ttipm_tpu.solvers.eigen import lobpcg_smallest, tt_max_generalised_eigen, tt_min_eig


def test_lobpcg_standard():
    n = 60
    Q = np.linalg.qr(np.random.randn(n, n))[0]
    eigs = np.linspace(-2.0, 5.0, n)
    A = jnp.asarray(Q @ np.diag(eigs) @ Q.T)
    lam, x, res = lobpcg_smallest(
        lambda v: A @ v, jnp.asarray(np.random.randn(n)), tol=1e-9, maxiter=200
    )
    assert abs(lam - eigs.min()) < 1e-6


def test_lobpcg_generalized():
    n = 40
    Q = np.linalg.qr(np.random.randn(n, n))[0]
    A = jnp.asarray(Q @ np.diag(np.linspace(-1.0, 3.0, n)) @ Q.T)
    Bm = np.random.randn(n, n)
    B = jnp.asarray(Bm @ Bm.T + n * np.eye(n))
    lam, x, res = lobpcg_smallest(
        lambda v: A @ v, jnp.asarray(np.random.randn(n)), tol=1e-9, maxiter=300,
        b_matvec=lambda v: B @ v,
    )
    import scipy.linalg as sla

    true = sla.eigh(np.asarray(A), np.asarray(B), eigvals_only=True)[0]
    assert abs(lam - true) < 1e-5


def psd_tt(dim, rank, shift=0.5):
    from ttipm_tpu.ops.products import tt_mat_mat_exact
    from ttipm_tpu.ops.tt import tt_transpose

    A = tt_random_gaussian([rank] * (dim - 1), (2, 2))
    AtA = tt_mat_mat_exact(tt_transpose(A), A)
    return tt_rank_reduce(tt_add(AtA, tt_scale(shift, tt_identity(dim))), 1e-12)


def sym_tt(dim, rank):
    from ttipm_tpu.ops.tt import tt_transpose

    A = tt_random_gaussian([rank] * (dim - 1), (2, 2))
    return tt_rank_reduce(tt_scale(0.5, tt_add(A, tt_transpose(A))), 1e-12)


def test_max_generalised_eigen_matches_dense():
    """alpha* = max step with A + alpha*Delta PSD; dense oracle via
    generalized eigenvalues."""
    dim = 4
    A = psd_tt(dim, 2, shift=1.0)
    D = sym_tt(dim, 2)
    Ad = np.asarray(tt_matrix_to_matrix(A))
    Dd = np.asarray(tt_matrix_to_matrix(D))
    Ad = 0.5 * (Ad + Ad.T)
    Dd = 0.5 * (Dd + Dd.T)
    import scipy.linalg as sla

    # max alpha s.t. A + alpha D >= 0  <=>  1/alpha >= lambda_max(-D, A)
    lams = sla.eigh(-Dd, Ad, eigvals_only=True)
    lam_max = lams.max()
    alpha_true = 1.0 / lam_max if lam_max > 0 else 1.0
    alpha_true = min(alpha_true, 1.0)

    alpha, _ = tt_max_generalised_eigen(A, D, tol=1e-8)
    # step must be safe (not overshoot the cone) and not tiny
    eigs = np.linalg.eigvalsh(Ad + alpha * Dd)
    assert eigs.min() >= -1e-6
    assert alpha >= 0.3 * alpha_true


def test_min_eig_diag_operator():
    """Smallest eigenvector of Diag(M): localises on the minimum entry."""
    dim = 4
    M = sym_tt(dim, 2)
    Op = tt_diag_op(M, 1e-12)
    x, val = tt_min_eig(Op, tol=1e-9, return_eig_val=True)
    Md = np.asarray(tt_matrix_to_matrix(M))
    true_min = Md.min()
    assert abs(val - true_min) < 1e-5


def test_lobpcg_window_adversarial_near_diagonal_gate_boundary():
    """Adversarial k=1 lock-on at the dense-gate boundary (m=512, above
    _DENSE_EIG_DIRECT=256, below the rescue ceiling): a NEAR-DIAGONAL
    projected operator and a warm start that is EXACTLY an interior
    eigenvector.  Without the random-mixing guard LOBPCG terminates
    immediately on the interior pair's tiny residual; the window solve
    must still return the extremal eigenvalue."""
    from ttipm_tpu.solvers.eigen import _DENSE_EIG_DIRECT, lobpcg_window

    rng = np.random.RandomState(7)
    l = L = 8
    nm = 8
    m = l * nm * L
    assert m > _DENSE_EIG_DIRECT

    # phi_l = phi_r = identity interfaces; A_k near-diagonal with one
    # well-separated smallest eigenvalue and a tiny symmetric coupling.
    eye = np.zeros((l, 1, l))
    eye[:, 0, :] = np.eye(l)
    diag = np.linspace(1.0, 2.0, nm)
    diag[3] = 0.1  # extremal, interior position
    A_k = np.zeros((1, nm, nm, 1))
    A_k[0, :, :, 0] = np.diag(diag)
    coup = rng.randn(nm, nm) * 1e-9
    A_k[0, :, :, 0] += coup + coup.T

    ops = (jnp.asarray(eye), jnp.asarray(A_k), jnp.asarray(eye))

    # warm start: exactly the eigenvector of an interior eigenvalue
    x0 = np.zeros((l, nm, L))
    x0[0, 5, 0] = 1.0

    lam, x, res = lobpcg_window("w1", ops, jnp.asarray(x0), tol=1e-8,
                                maxiter=600)
    assert abs(lam - 0.1) < 1e-4, f"locked onto non-extremal pair: {lam}"
