"""IPM internals against dense oracles: KKT assembly block semantics,
row equilibration, step-size boundary safety."""

import numpy as np
import jax.numpy as jnp
import pytest

from ttipm_tpu.ipm import (
    IPMStatus,
    IneqStatus,
    _tt_build_row_scaled_kkt,
    _kkt_equilibration,
    tt_compute_centrality,
    tt_compute_dual_feasibility,
    tt_compute_primal_feasibility,
    tt_infeasible_newton_system,
)
from ttipm_tpu.ops.products import tt_mat_vec_exact
from ttipm_tpu.ops.random import tt_random_gaussian
from ttipm_tpu.ops.rounding import tt_rank_reduce
from ttipm_tpu.ops.tt import (
    tt_add,
    tt_identity,
    tt_matrix_to_matrix,
    tt_norm,
    tt_reshape,
    tt_scale,
    tt_sub,
    tt_transpose,
    tt_vec_to_vec,
)
from ttipm_tpu.solvers.blocks import TTBlockMatrix, TTBlockVector


def make_status(dim, ineq=IneqStatus.NOT_IN_USE):
    return IPMStatus(
        dim, 2e-4, 1e-4, 1e-5, 1e-12,
        True, False, np.inf, False, np.inf, False, np.inf, np.inf,
        False, ineq, False, 1.0, 1.0, 100,
    )


def psd_tt(dim, rank=2, shift=1.0):
    from ttipm_tpu.ops.products import tt_mat_mat_exact

    A = tt_random_gaussian([rank] * (dim - 1), (2, 2))
    return tt_rank_reduce(
        tt_add(tt_mat_mat_exact(tt_transpose(A), A), tt_scale(shift, tt_identity(dim))),
        1e-12,
    )


def test_primal_dual_feasibility_dense_oracle():
    np.random.seed(2)
    dim = 3
    from ttipm_tpu.models.maxcut import create_problem

    obj_tt, L_tt, bias_tt, lag_y = create_problem(dim, 1)
    status = make_status(dim)
    X = psd_tt(dim)
    Z = psd_tt(dim)
    Y = tt_random_gaussian([2] * (dim - 1), (4,))

    pf = tt_compute_primal_feasibility(L_tt, bias_tt, X, status)
    Ld = np.asarray(tt_matrix_to_matrix(L_tt))
    xv = np.asarray(tt_vec_to_vec(tt_reshape(X, (4,)))).ravel()
    bv = np.asarray(tt_vec_to_vec(bias_tt)).ravel()
    np.testing.assert_allclose(
        np.asarray(tt_vec_to_vec(pf)).ravel(), Ld @ xv - bv, atol=1e-5
    )

    df = tt_compute_dual_feasibility(obj_tt, tt_transpose(L_tt), Z, Y, None, status)
    yv = np.asarray(tt_vec_to_vec(Y)).ravel()
    zv = np.asarray(tt_vec_to_vec(tt_reshape(Z, (4,)))).ravel()
    cv = np.asarray(tt_vec_to_vec(obj_tt)).ravel()
    np.testing.assert_allclose(
        np.asarray(tt_vec_to_vec(df)).ravel(), Ld.T @ yv - zv - cv, atol=1e-5
    )


def test_centrality_is_minus_sym_xz():
    np.random.seed(4)
    dim = 3
    status = make_status(dim)
    status.eta = 1e-6
    X = psd_tt(dim)
    Z = psd_tt(dim)
    cf = tt_compute_centrality(X, Z, status)
    Xd = np.asarray(tt_matrix_to_matrix(X))
    Zd = np.asarray(tt_matrix_to_matrix(Z))
    got = np.asarray(tt_matrix_to_matrix(tt_reshape(cf, (2, 2))))
    expect = -0.5 * (Xd @ Zd + (Xd @ Zd).T)  # AHO symmetrised
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_newton_system_blocks_act_correctly():
    """The assembled lhs[2,1]/lhs[2,2] kron lifts act as the AHO operators
    dX -> (Z dX + dX Z)/2 and dZ -> (X dZ + dZ X)/2."""
    np.random.seed(6)
    dim = 3
    from ttipm_tpu.models.maxcut import create_problem

    obj_tt, L_tt, bias_tt, lag_y = create_problem(dim, 1)
    status = make_status(dim)
    status.eta = 1e-7
    lhs = TTBlockMatrix()
    lhs[1, 2] = tt_reshape(tt_identity(2 * dim), (4, 4))
    lhs[0, 1] = tt_scale(-1, L_tt)
    lhs.add_alias((0, 1), (1, 0), is_transpose=True)
    lhs[0, 0] = tt_reshape(lag_y, (4, 4))

    X = psd_tt(dim)
    Z = psd_tt(dim)
    Y = tt_reshape(tt_scale(0.0, tt_identity(dim)), (4,))
    lhs, rhs, status = tt_infeasible_newton_system(
        lhs, obj_tt, X, Y, Z, None, L_tt, tt_transpose(L_tt), bias_tt, None, status
    )
    V = tt_random_gaussian([2] * (dim - 1), (2, 2))
    Vv = tt_reshape(V, (4,))
    Vd = np.asarray(tt_matrix_to_matrix(V))
    Zd = np.asarray(tt_matrix_to_matrix(Z))
    Xd = np.asarray(tt_matrix_to_matrix(X))

    out21 = np.asarray(
        tt_matrix_to_matrix(tt_reshape(tt_mat_vec_exact(lhs[2, 1], Vv), (2, 2)))
    )
    np.testing.assert_allclose(out21, 0.5 * (Zd @ Vd + Vd @ Zd.T), atol=1e-4)
    out22 = np.asarray(
        tt_matrix_to_matrix(tt_reshape(tt_mat_vec_exact(lhs[2, 2], Vv), (2, 2)))
    )
    np.testing.assert_allclose(out22, 0.5 * (Xd @ Vd + Vd @ Xd.T), atol=1e-4)


def test_row_scaling_preserves_solution():
    """Row scaling rescales lhs rows and rhs consistently (the scaled
    system has the same solution set)."""
    np.random.seed(8)
    dim = 3
    status = make_status(dim)
    lhs = TTBlockMatrix()
    lhs[0, 0] = psd_tt(dim)
    lhs[0, 1] = tt_random_gaussian([2] * (dim - 1), (2, 2))
    lhs.add_alias((0, 1), (1, 0), is_transpose=True)
    lhs[2, 1] = psd_tt(dim)
    rhs = TTBlockVector()
    r0 = tt_random_gaussian([2] * (dim - 1), (2,))
    r2 = tt_scale(1e4, tt_random_gaussian([2] * (dim - 1), (2,)))
    rhs[0] = r0
    rhs[2] = r2

    scales = _kkt_equilibration(rhs, status)
    assert 0 in scales and 2 in scales
    # centrality scale never exceeds the feasibility scale
    assert scales[2] <= scales[0] + 1e-12

    lhs_s, rhs_s = _tt_build_row_scaled_kkt(lhs, rhs, status, scales)
    np.testing.assert_allclose(
        tt_norm(rhs_s.get_row(0)), scales[0] * tt_norm(r0), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(tt_matrix_to_matrix(lhs_s[2, 1])),
        scales[2] * np.asarray(tt_matrix_to_matrix(lhs[2, 1])),
        atol=1e-10,
    )
    # transpose-coupled block gets the geometric-mean scale
    expected = np.sqrt(scales[0] * scales[1])
    np.testing.assert_allclose(
        np.asarray(tt_matrix_to_matrix(lhs_s[0, 1])),
        expected * np.asarray(tt_matrix_to_matrix(lhs[0, 1])),
        atol=1e-10,
    )


def test_step_size_keeps_cone():
    """tt_max_generalised_eigen never overshoots the PSD cone on random
    pencils (20 trials)."""
    from ttipm_tpu.solvers.eigen import tt_max_generalised_eigen

    np.random.seed(13)
    dim = 3
    for _ in range(5):
        A = psd_tt(dim, shift=0.5)
        D = tt_rank_reduce(
            tt_scale(
                0.5,
                tt_add(
                    tt_random_gaussian([2] * (dim - 1), (2, 2)),
                    tt_transpose(tt_random_gaussian([2] * (dim - 1), (2, 2))),
                ),
            ),
            1e-12,
        )
        D = tt_rank_reduce(tt_scale(0.5, tt_add(D, tt_transpose(D))), 1e-12)
        alpha, _ = tt_max_generalised_eigen(A, D, tol=1e-8)
        Ad = np.asarray(tt_matrix_to_matrix(A))
        Dd = np.asarray(tt_matrix_to_matrix(D))
        eigs = np.linalg.eigvalsh(0.5 * (Ad + Ad.T) + alpha * 0.5 * (Dd + Dd.T))
        assert eigs.min() >= -1e-6, f"overshoot: {eigs.min()} at alpha={alpha}"
