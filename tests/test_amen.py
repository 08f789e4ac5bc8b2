"""Block AMEn solver tests against densified block systems."""

import numpy as np
import jax.numpy as jnp

from ttipm_tpu.ops.random import tt_random_gaussian
from ttipm_tpu.ops.products import tt_mat_vec_exact
from ttipm_tpu.ops.rounding import tt_rank_reduce
from ttipm_tpu.ops.tt import (
    tt_add,
    tt_identity,
    tt_matrix_to_matrix,
    tt_reshape,
    tt_scale,
    tt_transpose,
    tt_vec_to_vec,
)
from ttipm_tpu.solvers.amen import tt_block_amen, tt_restarted_block_amen
from ttipm_tpu.solvers.blocks import TTBlockMatrix, TTBlockVector, tt_get_block


def spd_operator_tt(dim, rank, shift=2.0):
    """A symmetric positive definite TT operator: A^T A + shift*I."""
    from ttipm_tpu.ops.products import tt_mat_mat_exact

    A = tt_random_gaussian([rank] * (dim - 1), (2, 2))
    AtA = tt_mat_mat_exact(tt_transpose(A), A)
    spd = tt_add(AtA, tt_scale(shift, tt_identity(dim)))
    return tt_rank_reduce(spd, 1e-12)


def test_single_block_amen_matches_dense():
    dim = 4
    A = spd_operator_tt(dim, 2)
    x_true = tt_random_gaussian([2] * (dim - 1), (2,))
    b = tt_mat_vec_exact(A, x_true)

    block_A = TTBlockMatrix()
    block_A[0, 0] = A
    block_b = TTBlockVector()
    block_b[0] = b

    x_sol, res = tt_block_amen(block_A, block_b, term_tol=1e-8, nswp=10, amen=True)
    assert res < 1e-6
    x0 = tt_get_block(0, x_sol)
    Ad = np.asarray(tt_matrix_to_matrix(A))
    xd = np.asarray(tt_vec_to_vec(x0)).ravel()
    bd = np.asarray(tt_vec_to_vec(b)).ravel()
    np.testing.assert_allclose(Ad @ xd, bd, atol=1e-6)


def test_two_block_amen_with_transpose_alias():
    """[[A, B],[B^T, A2]] block system with the (1,0) block stored as a
    transpose alias of (0,1) — the KKT storage pattern."""
    dim = 3
    A = spd_operator_tt(dim, 2, shift=3.0)
    A2 = spd_operator_tt(dim, 2, shift=3.0)
    B = tt_rank_reduce(
        tt_scale(0.2, tt_random_gaussian([2] * (dim - 1), (2, 2))), 1e-12
    )

    x0_true = tt_random_gaussian([2] * (dim - 1), (2,))
    x1_true = tt_random_gaussian([2] * (dim - 1), (2,))
    b0 = tt_rank_reduce(
        tt_add(tt_mat_vec_exact(A, x0_true), tt_mat_vec_exact(B, x1_true)), 1e-12
    )
    b1 = tt_rank_reduce(
        tt_add(tt_mat_vec_exact(tt_transpose(B), x0_true), tt_mat_vec_exact(A2, x1_true)),
        1e-12,
    )

    block_A = TTBlockMatrix()
    block_A[0, 0] = A
    block_A[0, 1] = B
    block_A.add_alias((0, 1), (1, 0), is_transpose=True)
    block_A[1, 1] = A2
    block_b = TTBlockVector()
    block_b[0] = b0
    block_b[1] = b1

    x_sol, res = tt_block_amen(block_A, block_b, term_tol=1e-8, nswp=12, amen=True)
    assert res < 1e-5

    for idx, x_true in [(0, x0_true), (1, x1_true)]:
        xd = np.asarray(tt_vec_to_vec(tt_get_block(idx, x_sol))).ravel()
        xt = np.asarray(tt_vec_to_vec(x_true)).ravel()
        np.testing.assert_allclose(xd, xt, atol=1e-4)


def test_restarted_amen():
    dim = 3
    A = spd_operator_tt(dim, 2)
    x_true = tt_random_gaussian([2] * (dim - 1), (2,))
    b = tt_mat_vec_exact(A, x_true)
    block_A = TTBlockMatrix()
    block_A[0, 0] = A
    block_b = TTBlockVector()
    block_b[0] = b
    x_sol, res = tt_restarted_block_amen(
        block_A, block_b, rank_restriction=10, op_tol=1e-8, termination_tol=1e-7,
        inner_m=10,
    )
    xd = np.asarray(tt_vec_to_vec(tt_get_block(0, x_sol))).ravel()
    xt = np.asarray(tt_vec_to_vec(x_true)).ravel()
    np.testing.assert_allclose(xd, xt, atol=1e-5)


def test_restarted_amen_refinement():
    """refine_target on the ragged restart loop: a loosely-terminated
    solve must be driven to a substantially smaller true residual by the
    residual-equation rounds (solvers/amen.py::refined)."""
    dim = 3
    A = spd_operator_tt(dim, 2)
    x_true = tt_random_gaussian([2] * (dim - 1), (2,))
    b = tt_mat_vec_exact(A, x_true)
    block_A = TTBlockMatrix()
    block_A[0, 0] = A
    block_b = TTBlockVector()
    block_b[0] = b

    def true_res(x_sol):
        return (block_b - block_A.block_product(x_sol, 1e-12)).norm

    x_loose, _ = tt_restarted_block_amen(
        block_A, block_b, rank_restriction=10, op_tol=1e-8,
        termination_tol=1e-2, inner_m=4,
    )
    x_ref, _ = tt_restarted_block_amen(
        block_A, block_b, rank_restriction=10, op_tol=1e-8,
        termination_tol=1e-2, inner_m=4,
        refine_target=1e-10 * block_b.norm,
    )
    assert true_res(x_ref) < max(0.05 * true_res(x_loose), 1e-10)


def test_block_product_matches_dense():
    dim = 3
    A = spd_operator_tt(dim, 2)
    B = tt_rank_reduce(tt_scale(0.5, tt_random_gaussian([2] * (dim - 1), (2, 2))), 1e-12)
    block_A = TTBlockMatrix()
    block_A[0, 0] = A
    block_A[0, 1] = B
    block_A.add_alias((0, 1), (1, 0), is_transpose=True)

    # block solution train: block core at the end
    x0 = tt_random_gaussian([2] * (dim - 1), (2,))
    x1 = tt_random_gaussian([2] * (dim - 1), (2,))
    # build a block train by stacking into one block core is cumbersome;
    # instead validate block_product against per-block dense products.
    x_cores = [c for c in x0[:-1]]
    last = jnp.stack([x0[-1], x1[-1]], axis=1)  # (r, block=2, n, 1)

    # make ranks match: x1 must share the leading cores for this stacking,
    # so use x1 = x0 with a different last core.
    x1 = x0[:-1] + [x1[-1] * 0 + jnp.asarray(np.random.randn(*x0[-1].shape))]
    last = jnp.stack([x0[-1], x1[-1]], axis=1)
    x_block = x_cores + [last]

    out = block_A.block_product(x_block, 1e-10)
    Ad = np.asarray(tt_matrix_to_matrix(A))
    Bd = np.asarray(tt_matrix_to_matrix(B))
    x0d = np.asarray(tt_vec_to_vec(x0)).ravel()
    x1d = np.asarray(tt_vec_to_vec(x1)).ravel()
    np.testing.assert_allclose(
        np.asarray(tt_vec_to_vec(out.get_row(0))).ravel(), Ad @ x0d + Bd @ x1d, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(tt_vec_to_vec(out.get_row(1))).ravel(), Bd.T @ x0d, atol=1e-8
    )
