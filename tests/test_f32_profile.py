"""Float32 performance profile (TPU MXU-native mode).

The reference is an f64-only CPU code; the f32 profile (config.set_dtype)
is the TPU performance mode: MXU-native matmuls, ~4x smaller HLO than the
f32-pair f64 emulation.  These tests pin the profile's correctness floor:
TT algebra, the fused KKT solve, the eigensolvers, and (slow-marked) a
full IPM solve all run in f32 with rescaled tolerances.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ttipm_tpu import config


@pytest.fixture()
def f32_profile():
    config.set_dtype(jnp.float32)
    yield
    config.set_dtype(jnp.float64)


def test_dtype_profile_and_eps_floor(f32_profile):
    assert config.dtype() == jnp.float32
    assert config.clamp_eps(1e-12) == pytest.approx(1e-7)
    assert config.clamp_eps(1e-3) == pytest.approx(1e-3)


def test_fused_kkt_solve_f32(f32_profile):
    from tests.test_fused import _make_kkt_system
    from ttipm_tpu.solvers.fused import (
        _fused_residual_norm,
        _prep_operator,
        _prep_rhs,
        tt_block_amen_fused,
    )

    rng = np.random.RandomState(1)
    d = 3
    lhs, rhs = _make_kkt_system(d, rng)
    x, _ = tt_block_amen_fused(lhs, rhs, 1e-5, R=12, ineq=False, nswp=12,
                               seed=3)
    assert all(c.dtype == jnp.float32 for c in x)
    A = _prep_operator(lhs, d, ineq=False)
    b = _prep_rhs(rhs, d, ineq=False)
    rn = _fused_residual_norm(A, b, list(x), ineq=False)
    assert rn / rhs.norm < 1e-3  # f32 solver floor


def test_fused_eigen_f32_pencil_branches(f32_profile):
    """The lax.cond in _pencil_solve must trace both branches at f32
    (regression: host-float alpha promoted one branch to f64)."""
    from ttipm_tpu.solvers.fused_eigen import _pencil_solve

    rng = np.random.RandomState(0)
    m = 12
    Q = np.linalg.qr(rng.randn(m, m))[0]
    MA = jnp.asarray(Q @ np.diag(np.linspace(1, 3, m)) @ Q.T,
                     dtype=jnp.float32)
    MD = jnp.asarray(Q @ np.diag(np.linspace(-1, 2, m)) @ Q.T,
                     dtype=jnp.float32)
    prev = jnp.asarray(rng.randn(m) / np.sqrt(m), dtype=jnp.float32)
    # alpha as a host float — the original failure mode
    x, alpha_new, old_res, scale = _pencil_solve(MA, MD, prev, 0.5, 1e-3)
    assert x.dtype == jnp.float32
    assert jnp.isfinite(alpha_new)
    assert float(scale) > 0


def test_f32_ipm_maxcut_d3_converges(f32_profile):
    """End-to-end convergence of the flagship TPU profile (genuinely-f32
    fused solves) — promoted into the default suite so the f32 chain is
    CI-protected (~30 s with a warm persistent cache)."""
    from ttipm_tpu.ipm import tt_ipm
    from ttipm_tpu.models.maxcut import create_problem
    from ttipm_tpu.ops.tt import tt_inner_prod, tt_reshape

    np.random.seed(319)
    obj_tt, L_tt, bias_tt, lag_y = create_problem(3, 1)
    X, Y, T, Z, info = tt_ipm(
        {"y": tt_reshape(lag_y, (4, 4))}, obj_tt, L_tt, bias_tt,
        max_iter=22, gap_tol=3e-4, op_tol=1e-4, abs_tol=1e-3, warm_up=3,
        aho_direction=False, mals_restarts=2, max_refinement=5,
        lambdaStar=1.0,
    )
    assert abs(float(tt_inner_prod(X, Z))) < 1e-3
