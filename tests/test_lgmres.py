"""LGMRES augmentation: must beat plain restarted GMRES at equal matvec
budget on ill-conditioned systems (the reference's -ksp_lgmres_augment
rationale, src/tt_ipm.py:101-163)."""

import numpy as np
import jax.numpy as jnp

from ttipm_tpu.solvers.lgmres import gmres_restarted, lgmres


def _ill_system(n=150, seed=7):
    """Clustered spectrum + small outliers: restarted GMRES loses the
    outlier eigencomponents at every restart; the augmentation carries
    them across cycles (Baker et al. 2005, sec. 4)."""
    rng = np.random.RandomState(seed)
    evals = np.r_[np.logspace(-4, -2, 10),
                  np.ones(n - 10) + 0.01 * rng.randn(n - 10)]
    q, _ = np.linalg.qr(rng.randn(n, n))
    A = (q * evals) @ q.T
    b = rng.randn(n)
    return jnp.asarray(A), jnp.asarray(b)


def _count_res(solver, A, b, **kw):
    calls = [0]

    def mv(x):
        calls[0] += 1
        return A @ x

    x, info = solver(mv, b, **kw)
    res = float(np.linalg.norm(np.asarray(A @ x - b)) / np.linalg.norm(np.asarray(b)))
    return res, calls[0]


def test_lgmres_beats_gmres_at_equal_budget():
    A, b = _ill_system()
    kw = dict(rtol=1e-12, restart=8, maxiter=15)
    res_g, n_g = _count_res(gmres_restarted, A, b, **kw)
    res_l, n_l = _count_res(lgmres, A, b, k_aug=3, **kw)
    assert n_l <= n_g + 2  # same budget (cycle-final residual checks vary)
    assert res_l < 0.1 * res_g, (res_l, res_g)


def test_lgmres_exact_on_easy_system():
    rng = np.random.RandomState(0)
    n = 40
    A = jnp.asarray(np.eye(n) + 0.1 * rng.randn(n, n))
    b = jnp.asarray(rng.randn(n))
    x, info = lgmres(lambda v: A @ v, b, rtol=1e-12, restart=45, maxiter=2)
    assert info == 0
    assert np.linalg.norm(np.asarray(A @ x - b)) < 1e-10
