"""Conic encoding tests against dense oracles — no scs/sdpap needed."""

import numpy as np
import pytest

from ttipm_tpu.models import conic


def _rand_sym(n, rng):
    a = rng.randn(n, n)
    return 0.5 * (a + a.T)


def test_svec_roundtrip_and_inner_product():
    rng = np.random.RandomState(0)
    for n in [1, 2, 5, 8]:
        A, B = _rand_sym(n, rng), _rand_sym(n, rng)
        assert np.allclose(conic.smat(conic.svec(A), n), A)
        assert np.isclose(conic.svec(A) @ conic.svec(B), np.sum(A * B))


def test_svec_entries_match_dense():
    rng = np.random.RandomState(1)
    n = 6
    X = _rand_sym(n, rng)
    entries = [(0, 0, 2.0), (3, 1, -1.5), (1, 3, 0.5), (5, 5, 1.0)]
    idx, val = conic.svec_entries(entries, n)
    row = np.zeros(n * (n + 1) // 2)
    row[idx] = val
    assert np.isclose(row @ conic.svec(X),
                      sum(c * X[i, j] for i, j, c in entries))


def test_scs_encode_geometry():
    pytest.importorskip("scipy")
    rng = np.random.RandomState(2)
    n = 5
    prob = conic.ConicSDP(_rand_sym(n, rng))
    prob.add_eq([(i, i, 1.0) for i in range(n)], 3.0)   # trace = 3
    prob.add_eq([(0, 1, 1.0)], 0.25)
    prob.add_ge([(2, 3, 1.0)], -0.5)
    A, b, c, cone = conic.scs_encode(prob)
    assert cone == {"z": 2, "l": 1, "s": [n]}
    X = _rand_sym(n, rng)
    ax = A @ conic.svec(X)
    # eq rows: <A_i, X> == (Ax)_r, rhs in b
    assert np.isclose(ax[0], np.trace(X))
    assert b[0] == 3.0
    assert np.isclose(ax[1], X[0, 1])
    # ineq row encoded as -<G, X> <= -h
    assert np.isclose(ax[2], -X[2, 3])
    assert b[2] == 0.5
    # PSD slack block: s = b - Ax = svec(X)
    assert np.allclose(b[3:] - ax[3:], conic.svec(X))
    # objective: c.svec(X) == -<C, X>
    assert np.isclose(c @ conic.svec(X), -np.sum(prob.C * X))


def test_sdpa_encode_geometry():
    pytest.importorskip("scipy")
    rng = np.random.RandomState(3)
    n = 4
    prob = conic.ConicSDP(_rand_sym(n, rng))
    prob.add_eq([(1, 1, 1.0)], 1.0)
    prob.add_ge([(0, 2, 2.0)], 0.1)
    A, b, c, m_eq, m_ineq = conic.sdpa_encode(prob)
    assert (m_eq, m_ineq) == (1, 1)
    X = _rand_sym(n, rng)
    ax = A @ X.reshape(-1, order="F")
    assert np.isclose(ax[0], X[1, 1])
    assert np.isclose(ax[1], 2.0 * X[0, 2])
    assert np.isclose(c @ X.reshape(-1, order="F"), -np.sum(prob.C * X))


def test_maxcut_and_mss_builders():
    rng = np.random.RandomState(4)
    n = 8
    C = _rand_sym(n, rng)
    prob = conic.maxcut_conic(C)
    X = _rand_sym(n, rng)
    assert np.allclose(prob.eq_residual(X), np.diag(X) - 1.0)

    adj = (rng.rand(n, n) < 0.4).astype(float)
    adj = np.triu(adj, 1) + np.triu(adj, 1).T
    prob = conic.max_stable_set_conic(np.ones((n, n)), adj)
    res = prob.eq_residual(X)
    # last row is the trace constraint
    assert np.isclose(res[-1], np.trace(X) - 1.0)
    # edge rows vanish iff X vanishes on edges
    Xz = X.copy()
    Xz[adj > 0] = 0.0
    assert np.allclose(prob.eq_residual(Xz)[:-1], 0.0)


def test_corr_clust_builder():
    rng = np.random.RandomState(5)
    n = 6
    mask = (rng.rand(n, n) < 0.5).astype(float)
    mask = np.triu(mask, 1) + np.triu(mask, 1).T
    prob = conic.corr_clust_conic(_rand_sym(n, rng), mask, beta=0.25)
    # a matrix with all entries >= -0.25 on the mask violates nothing
    X = np.eye(n)
    assert np.allclose(prob.ineq_violation(X), 0.0)
    # drive one masked entry below -beta
    ii, jj = np.nonzero(np.triu(mask))
    if len(ii):
        X2 = X.copy()
        X2[ii[0], jj[0]] = X2[jj[0], ii[0]] = -1.0
        assert conic.ineq_violation_total(prob, X2) > 0 if hasattr(
            conic, "ineq_violation_total") else (
            np.abs(prob.ineq_violation(X2)).max() > 0)


def test_graphm_builder_permutation_feasible():
    # the lift of any permutation matrix satisfies every graphm constraint
    rng = np.random.RandomState(6)
    n = 3
    P = np.eye(n)[rng.permutation(n)]
    p = P.reshape(-1)  # vec with row-major (i * n + j) indexing
    Q = np.outer(p, p)
    X = np.zeros((n * n + 1, n * n + 1))
    X[: n * n, : n * n] = Q
    X[: n * n, -1] = p
    X[-1, : n * n] = p
    X[-1, -1] = 1.0
    prob = conic.graphm_conic(_rand_sym(n * n + 1, rng), n)
    assert np.abs(prob.eq_residual(X)).max() < 1e-12
    assert np.abs(prob.ineq_violation(X)).max() < 1e-12


def test_splitting_solver_matches_ipm_objective():
    """Cross-solver numerical ground truth (VERDICT r4 item 10): the
    native SCS-class splitting solver (conic.solve_splitting — the same
    ADMM family as the reference's pip-scs axis,
    psd_system/maxcut/maxcut_scs.py:44-110) must reproduce the TT-IPM's
    maxcut d3 objective to 1e-3 relative.  The IPM solves the
    sqrt(d)-normalised problem (models/maxcut.py:45-52), so its iterate
    is diag-rescaled before comparing."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import yaml

    from ttipm_tpu.ipm import tt_ipm
    from ttipm_tpu.models.maxcut import create_problem, tt_obj_matrix
    from ttipm_tpu.ops.tt import tt_matrix_to_matrix, tt_reshape

    with open("configs/maxcut_3.yaml") as fh:
        cfg = yaml.safe_load(fh)
    seed = int(cfg["seeds"][0])
    np.random.seed(seed)
    obj, L, bias, lag_y = create_problem(3, 1)
    X, _, _, Z, info = tt_ipm(
        {"y": tt_reshape(lag_y, (4, 4))}, obj, L, bias,
        max_iter=int(cfg["max_iter"]), warm_up=int(cfg["warm_up"]),
        gap_tol=float(cfg["gap_tol"]), op_tol=float(cfg["op_tol"]),
        abs_tol=float(cfg["abs_tol"]),
        mals_restarts=int(cfg["mals_restarts"]),
        max_refinement=int(cfg["max_refinement"]), aho_direction=False,
        lambdaStar=float(cfg.get("lambdaStar", 1)),
    )
    Xd = np.asarray(tt_matrix_to_matrix(tt_reshape(X, (2, 2))))
    Xd = Xd / np.mean(np.diag(Xd))  # undo the sqrt(d)/|b| normalisation

    np.random.seed(seed)
    C = np.asarray(
        tt_matrix_to_matrix(tt_reshape(tt_obj_matrix(1, 3), (2, 2))),
        dtype=float,
    )
    obj_ipm = float(np.sum(C * Xd))

    out = conic.solve_splitting(conic.maxcut_conic(C), tol=1e-8)
    assert out["primal_res"] < 1e-6
    rel = abs(obj_ipm - out["objective"]) / max(abs(out["objective"]), 1.0)
    assert rel < 1e-3, (obj_ipm, out["objective"])


def test_splitting_solver_ineq_path():
    """Inequality cone handling: corr-clust-style entrywise bounds are
    active at the solution and satisfied to tolerance."""
    rng = np.random.RandomState(11)
    n = 6
    A = rng.randn(n, n)
    C = 0.5 * (A + A.T)
    mask = np.zeros((n, n))
    mask[0, 1] = mask[1, 0] = 1.0
    prob = conic.corr_clust_conic(C, mask, beta=0.1)
    out = conic.solve_splitting(prob, tol=1e-8, max_iter=50000)
    X = out["x_matrix"]
    assert np.abs(np.diag(X) - 1).max() < 1e-5
    assert X[0, 1] >= -0.1 - 1e-5
    assert np.linalg.eigvalsh(X).min() > -1e-7
