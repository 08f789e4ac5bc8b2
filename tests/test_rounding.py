"""Rounding-suite property tests: error bounds, PSD/mask preservation,
rank monotonicity (the properties the reference's stale tests specify,
SURVEY.md §4 / tests/test_tt_rounding.py in the reference)."""

import numpy as np
import pytest

from ttipm_tpu.ops.rounding import (
    add_kick_rank,
    add_kick_rank_rev,
    prune_singular_vals,
    tt_mask_rank_reduce,
    tt_psd_rank_reduce,
    tt_rank_reduce,
    tt_rank_retraction,
    tt_rl_orthogonalise,
)
from ttipm_tpu.ops.tt import (
    tt_add,
    tt_identity,
    tt_l2_dist,
    tt_matrix_to_matrix,
    tt_norm,
    tt_ranks,
    tt_scale,
)
from ttipm_tpu.ops.random import tt_random_gaussian, tt_random_graph
from ttipm_tpu.ops.products import tt_hadamard_exact
import jax.numpy as jnp


def noisy_low_rank_tt(dim, rank, noise=1e-8):
    """A TT that is 'rank' plus small-magnitude rank inflation."""
    base = tt_random_gaussian([rank] * (dim - 1), (2, 2))
    noise_tt = tt_scale(noise, tt_random_gaussian([2] * (dim - 1), (2, 2)))
    return tt_add(base, noise_tt)


def test_prune_singular_vals():
    s = np.array([1.0, 0.5, 1e-9, 1e-10])
    assert prune_singular_vals(s, 1e-6) == 2
    assert prune_singular_vals(s, 1e-12) == 4
    assert prune_singular_vals(np.zeros(3), 1e-6) == 1
    # always keeps at least one
    assert prune_singular_vals(np.array([1e-20]), 1e-6) == 1


def test_rl_orthogonalise_preserves_value():
    A = noisy_low_rank_tt(5, 3)
    Ad = np.asarray(tt_matrix_to_matrix(A))
    Q = tt_rl_orthogonalise(A)
    np.testing.assert_allclose(np.asarray(tt_matrix_to_matrix(Q)), Ad, atol=1e-10)
    # all cores but the first should be row-orthonormal in the right unfolding
    for core in Q[1:]:
        mat = np.asarray(core).reshape(core.shape[0], -1)
        np.testing.assert_allclose(mat @ mat.T, np.eye(mat.shape[0]), atol=1e-10)


def test_rank_reduce_error_bound_and_ranks():
    A = noisy_low_rank_tt(5, 3, noise=1e-9)
    eps = 1e-6
    R = tt_rank_reduce(A, eps)
    assert tt_l2_dist(A, R) <= eps
    assert max(tt_ranks(R)) <= max(tt_ranks(A))
    # the noise ranks got pruned
    assert max(tt_ranks(R)) <= 3 * 2  # far below the inflated rank bound
    # strict eps keeps value
    exact = tt_rank_reduce(A, 1e-15)
    np.testing.assert_allclose(
        np.asarray(tt_matrix_to_matrix(exact)), np.asarray(tt_matrix_to_matrix(A)), atol=1e-10
    )


def test_psd_rank_reduce_stays_psd():
    dim = 4
    # PSD input: G^T G in TT form via dense construction
    B = tt_random_gaussian([3] * (dim - 1), (2, 2))
    Bd = np.asarray(tt_matrix_to_matrix(B))
    Pd = Bd.T @ Bd + 1e-8 * np.eye(Bd.shape[0])
    from ttipm_tpu.ops.tt import tt_matrix_svd

    P = tt_matrix_svd(Pd)
    eps = 1e-3
    R = tt_psd_rank_reduce(P, eps)
    Rd = np.asarray(tt_matrix_to_matrix(R))
    eigs = np.linalg.eigvalsh(0.5 * (Rd + Rd.T))
    assert eigs.min() >= -1e-8
    # error stays within eps plus the identity compensation
    assert np.linalg.norm(Rd - Pd) <= eps * np.sqrt(2 * Pd.shape[0])


def test_mask_rank_reduce_supported_on_mask():
    dim = 4
    mask = tt_random_graph(dim, 2)
    noise = tt_scale(1e-7, tt_random_gaussian([2] * (dim - 1), (2, 2)))
    T = tt_add(tt_hadamard_exact(mask, tt_random_gaussian([2] * (dim - 1), (2, 2))),
               tt_hadamard_exact(mask, noise))
    R = tt_mask_rank_reduce(T, mask, 1e-4)
    Rd = np.asarray(tt_matrix_to_matrix(R))
    maskd = np.asarray(tt_matrix_to_matrix(mask))
    # off-mask entries stay (approximately) zero: compensation adds along mask
    off = Rd * (1 - maskd)
    assert np.abs(off).max() <= 1e-4


def test_rank_retraction_caps():
    A = tt_random_gaussian([6] * 4, (2, 2))
    R = tt_rank_retraction(A, [3] * 4)
    assert max(tt_ranks(R)) <= 3


def test_kick_ranks():
    u = jnp.asarray(np.linalg.qr(np.random.randn(12, 3))[0])
    v = jnp.asarray(np.random.randn(3, 7))
    u2, v2, r2 = add_kick_rank(u, v, 2)
    assert r2 == 5
    np.testing.assert_allclose(np.asarray(u2 @ v2), np.asarray(u @ v), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(u2.T @ u2), np.eye(5), atol=1e-10
    )

    u = jnp.asarray(np.random.randn(7, 3))
    v = jnp.asarray(np.random.randn(3, 12))
    u2, v2, r2 = add_kick_rank_rev(u, v, 2)
    assert r2 == 5
    np.testing.assert_allclose(np.asarray(u2 @ v2), np.asarray(u @ v), atol=1e-10)
    np.testing.assert_allclose(np.asarray(v2 @ v2.T), np.eye(5), atol=1e-10)
