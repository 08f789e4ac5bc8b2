"""The fused->ragged solver fallback chain (reference pattern:
direct_solve_failure rerouting, /root/reference/src/tt_ipm.py:224-231).

graphm n=2 exposed Newton systems whose TT solution rank (~52 on the
middle bond) exceeds the fused fixed-rank ladder's dense-factorization
ceiling; the IPM must reroute to the rank-adaptive ragged AMEn instead of
letting AmenRestartsExhausted abort the Newton step, and the failure must
be sticky across iterations.
"""

import numpy as np
import pytest

import ttipm_tpu.solvers.fused as fused_mod
from ttipm_tpu import config
from ttipm_tpu.ops.tt import tt_inner_prod, tt_reshape
from ttipm_tpu.solvers.amen import AmenRestartsExhausted


def test_ipm_survives_fused_exhaustion(monkeypatch):
    from ttipm_tpu.ipm import tt_ipm
    from ttipm_tpu.models.maxcut import create_problem

    calls = {"fused": 0}

    def always_exhausted(*a, **k):
        calls["fused"] += 1
        raise AmenRestartsExhausted("synthetic exhaustion")

    monkeypatch.setattr(
        fused_mod, "tt_restarted_block_amen_fused", always_exhausted
    )
    monkeypatch.setattr(config, "_FUSED_KKT", True)

    np.random.seed(5)
    obj_tt, L_tt, bias_tt, lag_y = create_problem(3, 1)
    X, Y, T, Z, info = tt_ipm(
        {"y": tt_reshape(lag_y, (4, 4))}, obj_tt, L_tt, bias_tt,
        max_iter=8, gap_tol=3e-4, op_tol=1e-4, abs_tol=1e-3, warm_up=3,
        aho_direction=False, mals_restarts=2, max_refinement=3,
        lambdaStar=1.0,
    )
    # The fused ladder fails permanently here; the sticky flag may un-stick
    # while the warm start fits the ladder cap, but the consecutive-failure
    # bound (3) keeps total fused attempts small, the ragged fallback
    # carries every Newton solve, and the IPM still converges.
    assert 1 <= calls["fused"] <= 3
    assert abs(tt_inner_prod(X, Z)) < 1e-3


def test_numerical_tripwire_raises_and_recovers():
    """The tripwire (config.numerical_tripwire, parity src/tt_ipm.py:15-16)
    must promote silent numpy NaN production to an exception, and the
    Newton step's recovery branch must absorb it (zero step, None dirs)."""
    from ttipm_tpu import ipm as ipm_mod

    with pytest.raises(FloatingPointError):
        with config.numerical_tripwire():
            np.float64(1.0) / np.float64(0.0)

    with pytest.raises((FloatingPointError, RuntimeWarning)):
        with config.numerical_tripwire():
            np.sqrt(np.array([-1.0]))

    # route through the real newton step: a solver that poisons the host
    # arithmetic must land in the recovery branch, not corrupt the state
    def poisoned_solver(*a, **k):
        with config.numerical_tripwire():
            return np.log(np.array([-1.0]))

    out = ipm_mod._tt_ipm_newton_step(
        None, None, None, None, None, None, 1.0, 0.0,
        ipm_mod._IPMStatus() if hasattr(ipm_mod, "_IPMStatus") else _status(),
        poisoned_solver,
    )
    x_step, z_step = out[0], out[1]
    assert x_step == 0 and z_step == 0
    assert out[2] is None


def _status():
    from ttipm_tpu.ipm import IneqStatus

    class S:
        ineq_status = IneqStatus.INACTIVE
        is_central = False
        is_last_iter = False
        sigma = 0.0

    return S()
