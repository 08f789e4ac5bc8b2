"""Property tests for the TT algebra against dense oracles.

Every TT op is checked by densifying operands with ``tt_matrix_to_matrix`` /
``tt_vec_to_vec`` and comparing against the plain numpy computation — the
test strategy SURVEY.md §4 prescribes for the TPU rebuild.
"""

import numpy as np
import pytest

import ttipm_tpu as tt
from ttipm_tpu.ops.tt import (
    E,
    tt_add,
    tt_diag,
    tt_diag_op,
    tt_diagonal,
    tt_entry,
    tt_entrywise_sum,
    tt_identity,
    tt_IkronM,
    tt_inner_prod,
    tt_matrix_svd,
    tt_matrix_to_matrix,
    tt_merge_bonds,
    tt_MkronI,
    tt_norm,
    tt_normalise,
    tt_one_matrix,
    tt_ranks,
    tt_reshape,
    tt_scale,
    tt_split_bonds,
    tt_sub,
    tt_trace,
    tt_transpose,
    tt_tril_one_matrix,
    tt_triu_one_matrix,
    tt_vec_to_vec,
    tt_zero_matrix,
    symmetric_powers_of_two,
)
from ttipm_tpu.ops.random import tt_random_gaussian, tt_random_graph


def random_matrix_tt(dim, rank):
    """Random matrix TT with internal ranks == rank."""
    return tt_random_gaussian([rank] * (dim - 1), (2, 2))


def test_constructors_dense():
    d = 4
    np.testing.assert_allclose(tt_matrix_to_matrix(tt_identity(d)), np.eye(16))
    np.testing.assert_allclose(tt_matrix_to_matrix(tt_zero_matrix(d)), np.zeros((16, 16)))
    np.testing.assert_allclose(tt_matrix_to_matrix(tt_one_matrix(d)), np.ones((16, 16)))


def test_tril_triu():
    d = 3
    n = 2**d
    np.testing.assert_allclose(tt_matrix_to_matrix(tt_tril_one_matrix(d)), np.tril(np.ones((n, n))))
    np.testing.assert_allclose(tt_matrix_to_matrix(tt_triu_one_matrix(d)), np.triu(np.ones((n, n))))
    np.testing.assert_allclose(tt_matrix_to_matrix(tt_tril_one_matrix(1)), np.tril(np.ones((2, 2))))


def test_add_sub_scale_transpose():
    d = 4
    A = random_matrix_tt(d, 3)
    B = random_matrix_tt(d, 2)
    Ad, Bd = tt_matrix_to_matrix(A), tt_matrix_to_matrix(B)
    np.testing.assert_allclose(tt_matrix_to_matrix(tt_add(A, B)), Ad + Bd, atol=1e-12)
    np.testing.assert_allclose(tt_matrix_to_matrix(tt_sub(A, B)), Ad - Bd, atol=1e-12)
    np.testing.assert_allclose(tt_matrix_to_matrix(tt_scale(-2.5, A)), -2.5 * Ad, atol=1e-12)
    np.testing.assert_allclose(tt_matrix_to_matrix(tt_transpose(A)), Ad.T, atol=1e-12)


def test_inner_norm_trace():
    d = 4
    A = random_matrix_tt(d, 3)
    B = random_matrix_tt(d, 2)
    Ad, Bd = np.asarray(tt_matrix_to_matrix(A)), np.asarray(tt_matrix_to_matrix(B))
    assert tt_inner_prod(A, B) == pytest.approx(np.sum(Ad * Bd), rel=1e-10)
    assert tt_norm(A) == pytest.approx(np.linalg.norm(Ad), rel=1e-10)
    assert tt_trace(A) == pytest.approx(np.trace(Ad), rel=1e-8, abs=1e-12)
    assert tt_entrywise_sum(A) == pytest.approx(Ad.sum(), rel=1e-8, abs=1e-12)
    C = tt_normalise(A, radius=3.0)
    assert tt_norm(C) == pytest.approx(3.0, rel=1e-10)


def test_entry():
    d = 3
    A = random_matrix_tt(d, 2)
    # For matrix cores tt_entry(A, [i1..id]) picks the diagonal entry
    # (i_k, i_k) of each core, i.e. A[(i1..id), (i1..id)].
    tens = np.asarray(tt_matrix_to_matrix(A)).reshape([2] * (2 * d))
    val = tt_entry(A, [0, 1, 1])
    expect = tens[0, 1, 1, 0, 1, 1]
    assert val == pytest.approx(float(expect), abs=1e-12)


def test_diag_and_diag_op():
    d = 3
    v = tt_random_gaussian([2] * (d - 1), (2,))
    vd = np.asarray(tt_vec_to_vec(v)).ravel()
    D = tt_diag(v)
    np.testing.assert_allclose(tt_matrix_to_matrix(D), np.diag(vd), atol=1e-12)
    back = tt_diagonal(D)
    np.testing.assert_allclose(np.asarray(tt_vec_to_vec(back)).ravel(), vd, atol=1e-12)

    # Diag operator acting on vec'd matrices
    M = random_matrix_tt(d, 2)
    Md = np.asarray(tt_matrix_to_matrix(M))
    Op = tt_diag_op(M)
    X = random_matrix_tt(d, 2)
    from ttipm_tpu.ops.products import tt_mat_vec_exact

    out = tt_mat_vec_exact(Op, tt_reshape(X, (4,)))
    out_dense = np.asarray(tt_vec_to_vec(out)).ravel()
    # vec'd TT layout interleaves (row,col) bits per core; emulate by the
    # same reshape on the dense side.
    x_vec = np.asarray(tt_vec_to_vec(tt_reshape(X, (4,)))).ravel()
    m_vec = np.asarray(tt_vec_to_vec(tt_reshape(M, (4,)))).ravel()
    np.testing.assert_allclose(out_dense, m_vec * x_vec, atol=1e-10)


def test_reshape_roundtrip():
    d = 4
    A = random_matrix_tt(d, 3)
    v = tt_reshape(A, (4,))
    B = tt_reshape(v, (2, 2))
    np.testing.assert_allclose(
        np.asarray(tt_matrix_to_matrix(A)), np.asarray(tt_matrix_to_matrix(B)), atol=1e-12
    )


def test_split_merge_bonds():
    d = 3
    A = random_matrix_tt(d, 2)
    split = tt_split_bonds(A)
    assert len(split) == 2 * d
    merged = tt_merge_bonds(split)
    np.testing.assert_allclose(
        np.asarray(tt_matrix_to_matrix(A)), np.asarray(tt_matrix_to_matrix(merged)), atol=1e-10
    )


def test_kron_lifts():
    d = 3
    M = random_matrix_tt(d, 2)
    Md = np.asarray(tt_matrix_to_matrix(M))
    n = Md.shape[0]
    # I (x) M acting per-core means: on the vec'd (row,col)-interleaved
    # space, (I kron M) vec_tt(X) == vec_tt(M X^T?) — verify through action.
    from ttipm_tpu.ops.products import tt_mat_vec_exact

    X = random_matrix_tt(d, 2)
    Xd = np.asarray(tt_matrix_to_matrix(X))
    vX = tt_reshape(X, (4,))

    outI = tt_mat_vec_exact(tt_IkronM(M), vX)
    outI_mat = np.asarray(tt_matrix_to_matrix(tt_reshape(outI, (2, 2))))
    outM = tt_mat_vec_exact(tt_MkronI(M), vX)
    outM_mat = np.asarray(tt_matrix_to_matrix(tt_reshape(outM, (2, 2))))

    # Per-core kron with identity on the first/second physical index:
    # IkronM multiplies column index contributions: X @ M^T ; MkronI: M @ X.
    np.testing.assert_allclose(outI_mat, Xd @ Md.T, atol=1e-10)
    np.testing.assert_allclose(outM_mat, Md @ Xd, atol=1e-10)


def test_matrix_svd_roundtrip():
    d = 3
    A = np.random.randn(2**d, 2**d)
    Att = tt_matrix_svd(A)
    np.testing.assert_allclose(np.asarray(tt_matrix_to_matrix(Att)), A, atol=1e-9)


def test_symmetric_powers_of_two():
    np.testing.assert_array_equal(symmetric_powers_of_two(4), [2, 4, 4, 2])
    np.testing.assert_array_equal(symmetric_powers_of_two(5), [2, 4, 8, 4, 2])
    assert symmetric_powers_of_two(0).size == 0


def test_random_graph_properties():
    d, r = 4, 2
    G = tt_random_graph(d, r)
    Gd = np.asarray(tt_matrix_to_matrix(G))
    np.testing.assert_allclose(Gd, Gd.T, atol=1e-8)
    # entries approximately binary
    assert np.all((np.abs(Gd) < 1e-6) | (np.abs(Gd - 1) < 1e-6))
    assert max(tt_ranks(G)) <= r
