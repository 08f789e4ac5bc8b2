"""TT product tests against dense oracles (exact, rounded, ALS, dispatch)."""

import numpy as np

from ttipm_tpu.ops.products import (
    tt_approx_mat_mat_mul,
    tt_approx_mat_vec_mul,
    tt_fast_hadamard,
    tt_fast_mat_mat_mul,
    tt_fast_matrix_vec_mul,
    tt_hadamard_exact,
    tt_mat_mat_exact,
    tt_mat_mat_mul,
    tt_mat_vec_exact,
    tt_mat_vec_mul,
    tt_skew_zero_op,
)
from ttipm_tpu.ops.random import tt_random_gaussian
from ttipm_tpu.ops.tt import (
    tt_matrix_to_matrix,
    tt_ranks,
    tt_reshape,
    tt_transpose,
    tt_vec_to_vec,
)


def rand_mat(dim, rank):
    return tt_random_gaussian([rank] * (dim - 1), (2, 2))


def rand_vec(dim, rank):
    return tt_random_gaussian([rank] * (dim - 1), (2,))


def test_mat_vec_exact_and_fast():
    d = 4
    A, x = rand_mat(d, 3), rand_vec(d, 2)
    Ad = np.asarray(tt_matrix_to_matrix(A))
    xd = np.asarray(tt_vec_to_vec(x)).ravel()
    out = tt_mat_vec_exact(A, x)
    np.testing.assert_allclose(np.asarray(tt_vec_to_vec(out)).ravel(), Ad @ xd, atol=1e-10)
    out_f = tt_fast_matrix_vec_mul(A, x, 1e-10)
    np.testing.assert_allclose(np.asarray(tt_vec_to_vec(out_f)).ravel(), Ad @ xd, atol=1e-8)
    assert max(tt_ranks(out_f)) <= max(tt_ranks(out))


def test_mat_mat_exact_and_fast():
    d = 4
    A, B = rand_mat(d, 3), rand_mat(d, 2)
    Ad = np.asarray(tt_matrix_to_matrix(A))
    Bd = np.asarray(tt_matrix_to_matrix(B))
    np.testing.assert_allclose(
        np.asarray(tt_matrix_to_matrix(tt_mat_mat_exact(A, B))), Ad @ Bd, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(tt_matrix_to_matrix(tt_fast_mat_mat_mul(A, B, 1e-10))), Ad @ Bd, atol=1e-8
    )


def test_hadamard():
    d = 4
    A, B = rand_mat(d, 2), rand_mat(d, 2)
    Ad = np.asarray(tt_matrix_to_matrix(A))
    Bd = np.asarray(tt_matrix_to_matrix(B))
    np.testing.assert_allclose(
        np.asarray(tt_matrix_to_matrix(tt_hadamard_exact(A, B))), Ad * Bd, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(tt_matrix_to_matrix(tt_fast_hadamard(A, B, 1e-10))), Ad * Bd, atol=1e-8
    )
    # vector hadamard
    x, y = rand_vec(d, 2), rand_vec(d, 3)
    xd = np.asarray(tt_vec_to_vec(x)).ravel()
    yd = np.asarray(tt_vec_to_vec(y)).ravel()
    np.testing.assert_allclose(
        np.asarray(tt_vec_to_vec(tt_hadamard_exact(x, y))).ravel(), xd * yd, atol=1e-10
    )


def test_als_products():
    d = 4
    A, B = rand_mat(d, 3), rand_mat(d, 3)
    Ad = np.asarray(tt_matrix_to_matrix(A))
    Bd = np.asarray(tt_matrix_to_matrix(B))
    out = tt_approx_mat_mat_mul(A, B, tol=1e-8, nswp=30)
    np.testing.assert_allclose(np.asarray(tt_matrix_to_matrix(out)), Ad @ Bd, atol=5e-6)

    x = rand_vec(d, 3)
    xd = np.asarray(tt_vec_to_vec(x)).ravel()
    out_v = tt_approx_mat_vec_mul(A, x, tol=1e-8, nswp=30)
    np.testing.assert_allclose(np.asarray(tt_vec_to_vec(out_v)).ravel(), Ad @ xd, atol=5e-6)


def test_dispatchers():
    d = 4
    A, B = rand_mat(d, 2), rand_mat(d, 2)
    Ad = np.asarray(tt_matrix_to_matrix(A))
    Bd = np.asarray(tt_matrix_to_matrix(B))
    np.testing.assert_allclose(
        np.asarray(tt_matrix_to_matrix(tt_mat_mat_mul(A, B, 1e-8, 1e-10))), Ad @ Bd, atol=1e-6
    )
    x = rand_vec(d, 2)
    xd = np.asarray(tt_vec_to_vec(x)).ravel()
    np.testing.assert_allclose(
        np.asarray(tt_vec_to_vec(tt_mat_vec_mul(A, x, 1e-8, 1e-10))).ravel(), Ad @ xd, atol=1e-6
    )
    # large-rank route goes through ALS
    A9, B9 = rand_mat(d, 9), rand_mat(d, 9)
    Ad9 = np.asarray(tt_matrix_to_matrix(A9))
    Bd9 = np.asarray(tt_matrix_to_matrix(B9))
    np.testing.assert_allclose(
        np.asarray(tt_matrix_to_matrix(tt_mat_mat_mul(A9, B9, 1e-7, 1e-10))),
        Ad9 @ Bd9,
        atol=5e-5,
    )


def test_skew_zero_op():
    d = 3
    # The vec'd transpose-permutation op: Op + P.Op symmetrised acts like
    # symmetrising the output matrix of the underlying operator.
    from ttipm_tpu.ops.tt import tt_IkronM

    M = rand_mat(d, 2)
    Op = tt_IkronM(M)
    S = tt_skew_zero_op(Op, 1e-12)
    X = rand_mat(d, 2)
    from ttipm_tpu.ops.products import tt_mat_vec_exact

    Md = np.asarray(tt_matrix_to_matrix(M))
    Xd = np.asarray(tt_matrix_to_matrix(X))
    out = np.asarray(
        tt_matrix_to_matrix(tt_reshape(tt_mat_vec_exact(S, tt_reshape(X, (4,))), (2, 2)))
    )
    # IkronM: vec(W) -> vec(W M^T); Op @ P first transposes the input, so
    # S vec(X) = 0.5 (X + X^T) M^T.
    expect = 0.5 * (Xd + Xd.T) @ Md.T
    np.testing.assert_allclose(out, expect, atol=1e-8)
