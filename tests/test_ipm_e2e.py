"""End-to-end IPM tests: solve small instances of each problem family and
check the convergence metrics of BASELINE.md (slackness + feasibility),
cross-validating MaxCut against a dense eigen-bound oracle."""

import numpy as np
import pytest

from ttipm_tpu.ipm import IneqStatus, tt_ipm
from ttipm_tpu.ops.products import tt_fast_matrix_vec_mul
from ttipm_tpu.ops.rounding import tt_rank_reduce
from ttipm_tpu.ops.tt import (
    tt_add,
    tt_inner_prod,
    tt_matrix_to_matrix,
    tt_reshape,
    tt_sub,
    tt_transpose,
)


def solve_metrics(X, Y, T, Z, obj_tt, L_tt, bias_tt, ineq_active=False):
    slack = abs(tt_inner_prod(X, Z))
    pr = tt_rank_reduce(
        tt_sub(tt_fast_matrix_vec_mul(L_tt, tt_reshape(X, (4,))), bias_tt), eps=1e-12
    )
    feas = tt_inner_prod(pr, pr)
    dr = tt_rank_reduce(
        tt_sub(
            tt_fast_matrix_vec_mul(tt_transpose(L_tt), tt_reshape(Y, (4,)), eps=1e-12),
            tt_rank_reduce(tt_add(tt_reshape(Z, (4,)), obj_tt), eps=1e-12),
        ),
        eps=1e-12,
    )
    if ineq_active:
        dr = tt_rank_reduce(tt_sub(dr, tt_reshape(T, (4,))), eps=1e-12)
    dfeas = tt_inner_prod(dr, dr)
    return slack, feas, dfeas


@pytest.mark.slow
def test_maxcut_end_to_end():
    np.random.seed(319)
    from ttipm_tpu.models.maxcut import create_problem

    dim = 3
    obj_tt, L_tt, bias_tt, lag_y = create_problem(dim, 1)
    lag_maps = {"y": tt_reshape(lag_y, (4, 4))}
    X, Y, T, Z, info = tt_ipm(
        lag_maps, obj_tt, L_tt, bias_tt,
        max_iter=22, gap_tol=3e-4, op_tol=1e-4, abs_tol=1e-3,
        warm_up=3, aho_direction=False, mals_restarts=2, max_refinement=5,
        lambdaStar=1.0,
    )
    slack, feas, dfeas = solve_metrics(X, Y, T, Z, obj_tt, L_tt, bias_tt)
    assert slack < 1e-3
    assert feas < 1e-3
    assert dfeas < 1e-3

    # Cross-check optimality against the dense SDP solved via projected
    # gradient on the simplex of diagonally-constrained PSD matrices: the
    # primal objective <C, X*> must dominate any feasible rank-1 cut
    # vector (MaxCut SDP upper bound property).
    C = np.asarray(tt_matrix_to_matrix(tt_reshape(obj_tt, (2, 2))))
    Xd = np.asarray(tt_matrix_to_matrix(X))
    n = C.shape[0]
    primal_obj = float(np.sum(C * Xd))
    rng = np.random.RandomState(0)
    best_cut = -np.inf
    for _ in range(200):
        s = np.sign(rng.randn(n))
        best_cut = max(best_cut, float(s @ C @ s))
    # SDP relaxation upper-bounds the +/-1 quadratic maximization (note
    # diag(X)=scale/sqrt(n) after normalisation, so compare against the
    # rescaled cut value).
    diag_val = Xd[0, 0]
    assert primal_obj >= best_cut * diag_val - 1e-3
    # PSD-ness of the primal solution
    eigs = np.linalg.eigvalsh(0.5 * (Xd + Xd.T))
    assert eigs.min() >= -1e-6


@pytest.mark.slow
def test_max_stable_set_end_to_end():
    np.random.seed(3)
    from ttipm_tpu.models.max_stable_set import create_problem

    dim = 3
    obj_tt, L_tt, bias_tt, lag_y = create_problem(dim, 1)
    lag_maps = {"y": tt_reshape(lag_y, (4, 4))}
    X, Y, T, Z, info = tt_ipm(
        lag_maps, obj_tt, L_tt, bias_tt,
        max_iter=22, gap_tol=3e-4, op_tol=1e-4, abs_tol=1e-3,
        warm_up=3, aho_direction=False, mals_restarts=2, max_refinement=5,
        lambdaStar=1.0,
    )
    slack, feas, dfeas = solve_metrics(X, Y, T, Z, obj_tt, L_tt, bias_tt)
    assert slack < 1e-3
    assert feas < 1e-3


def test_problem_generators_structure():
    """All four generators produce consistent TT shapes."""
    np.random.seed(0)
    from ttipm_tpu.models import corr_clust, graphm, max_stable_set, maxcut

    dim = 3
    for mod, has_ineq in ((maxcut, False), (max_stable_set, False),
                          (corr_clust, True)):
        out = mod.create_problem(dim, 1)
        if has_ineq:
            obj_tt, L_tt, bias_tt, mask, lag_maps = out
            assert set(lag_maps) == {"y", "t"}
            assert len(mask) == dim
        else:
            obj_tt, L_tt, bias_tt, lag_y = out
        assert len(obj_tt) == dim and obj_tt[0].shape[1] == 4
        assert len(L_tt) == dim and L_tt[0].shape[1:3] == (4, 4)
        assert len(bias_tt) == dim and bias_tt[0].shape[1] == 4

    n = 2
    obj_tt, L_tt, bias_tt, mask, lag_maps = graphm.create_problem(n, 1)
    assert len(obj_tt) == 2 * n + 1
    assert len(L_tt) == 2 * n + 1
    assert L_tt[0].shape[1:3] == (4, 4)
    assert set(lag_maps) == {"y", "t"}


def test_baseline_cgal_maxcut():
    """CGAL baseline solves the densified MaxCut SDP and its objective is
    consistent with the TT problem data."""
    np.random.seed(5)
    from ttipm_tpu.models.maxcut import create_problem
    from ttipm_tpu.models.baselines import cgal

    dim = 3
    obj_tt, L_tt, bias_tt, lag_y = create_problem(dim, 1)
    C = -np.asarray(tt_matrix_to_matrix(tt_reshape(obj_tt, (2, 2))))
    n = C.shape[0]
    # diag(X)=b constraints as n rank-1 constraint matrices
    constraint_matrices = [np.outer(np.eye(n)[i], np.eye(n)[i]) for i in range(n)]
    bias_vec = np.asarray(
        tt_matrix_to_matrix(tt_reshape(bias_tt, (2, 2)))
    ).diagonal().reshape(-1, 1)
    X, gaps, info = cgal(
        C, constraint_matrices, bias_vec, trace_params=(0, float(bias_vec.sum())),
        gap_tol=0.1, num_iter=8000,
    )
    # the full-X CGAL iterate approaches diagonal feasibility
    assert np.abs(np.diag(X) - bias_vec.ravel()).max() < 0.1
    assert np.linalg.eigvalsh(0.5 * (X + X.T)).min() >= -1e-8


def test_ipm_smoke_dim2():
    """Fast default-suite end-to-end check: full IPM machinery on a dim-2
    MaxCut instance (4x4 SDP)."""
    np.random.seed(11)
    from ttipm_tpu.models.maxcut import create_problem

    obj_tt, L_tt, bias_tt, lag_y = create_problem(2, 1)
    lag_maps = {"y": tt_reshape(lag_y, (4, 4))}
    X, Y, T, Z, info = tt_ipm(
        lag_maps, obj_tt, L_tt, bias_tt,
        max_iter=22, gap_tol=3e-4, op_tol=1e-4, abs_tol=1e-3,
        warm_up=3, aho_direction=False, mals_restarts=2, max_refinement=5,
        lambdaStar=1.0,
    )
    slack, feas, dfeas = solve_metrics(X, Y, T, Z, obj_tt, L_tt, bias_tt)
    assert slack < 1e-3
    assert feas < 1e-3


def test_corr_clust_end_to_end_dim3():
    """Default-suite inequality-path e2e: corr_clust d=3 drives the full
    IneqStatus machine (ipm_local_solver_ineq, mask rounding,
    _tt_get_ineq_step_sizes).  Parity:
    /root/reference/psd_system/corr_clust/corr_clust.py:27-38."""
    np.random.seed(291)
    from ttipm_tpu.models.corr_clust import create_problem

    obj_tt, L_tt, bias_tt, ineq_mask, lag_maps = create_problem(3, 1)
    X, Y, T, Z, info = tt_ipm(
        lag_maps, obj_tt, L_tt, bias_tt, ineq_mask=ineq_mask,
        max_iter=22, gap_tol=3e-4, op_tol=1e-4, abs_tol=1e-3,
        warm_up=3, aho_direction=False, mals_restarts=2, max_refinement=5,
        lambdaStar=1.0, lambdaStarIneq=1e-3,
    )
    status = info["status"]
    assert status.ineq_status is not IneqStatus.NOT_IN_USE
    slack, feas, dfeas = solve_metrics(
        X, Y, T, Z, obj_tt, L_tt, bias_tt,
        ineq_active=status.ineq_status is IneqStatus.ACTIVE,
    )
    assert slack < 1e-3
    assert feas < 1e-3
    assert dfeas < 1e-3
    # X must respect the entrywise barrier on the mask support
    Xd = np.asarray(tt_matrix_to_matrix(X))
    mask = np.asarray(tt_matrix_to_matrix(ineq_mask))
    assert (Xd[mask > 0.5]).min() > -1e-2
    if T is not None:
        # T is supported on the inequality mask only
        Td = np.asarray(tt_matrix_to_matrix(T))
        assert np.abs(Td[mask < 0.5]).max() < 1e-6


@pytest.mark.slow
def test_graphm_end_to_end_n2():
    """Graph-matching n=2 (the 5-core lifted QAP) end-to-end — the densest
    inequality stress in the grid.  Parity:
    /root/reference/psd_system/graphm/graphm.py:153-233."""
    np.random.seed(256)
    from ttipm_tpu.models.graphm import create_problem

    obj_tt, L_tt, bias_tt, ineq_mask, lag_maps = create_problem(2, 1)
    # runner contract (utils/runner.py): vec-reshaped objective/bias,
    # matrix-op-reshaped Lagrange maps
    lag_maps = {k: tt_reshape(v, (4, 4)) for k, v in lag_maps.items()}
    X, Y, T, Z, info = tt_ipm(
        lag_maps, tt_reshape(obj_tt, (4,)), L_tt, tt_reshape(bias_tt, (4,)),
        ineq_mask=ineq_mask,
        max_iter=25, gap_tol=5e-4, op_tol=1e-4, abs_tol=1e-3,
        warm_up=3, aho_direction=False, mals_restarts=2, max_refinement=10,
        lambdaStar=2.0, lambdaStarIneq=1e-8,
    )
    slack = abs(tt_inner_prod(X, Z))
    assert slack < 1e-3
