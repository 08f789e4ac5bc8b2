"""Primal-dual predictor-corrector interior-point method in TT format.

Solves  min <C, X>  s.t.  L(X) = b,  X ⪰ 0  (optionally entrywise
inequality constraints X >= -beta on a mask) with all iterates X, Y, Z, T
held as tensor trains.  Each iteration assembles the block-TT Newton/KKT
system, solves it with restarted block AMEn using the Schur local solvers,
line-searches the PSD cone with the TT generalized eigensolver, and applies
PSD-preserving rounding to the updated iterates.

Parity map (reference /root/reference/src/tt_ipm.py):
  * KKT assembly             — tt_infeasible_newton_system (:429-475)
  * row equilibration        — _tt_kkt_row_scales/_tt_build_row_scaled_kkt
                               (:510-568)
  * predictor-corrector      — _tt_ipm_newton_step (:571-697), Mehrotra
                               sigma = clip((mu_aff/mu)^e), e=max(1,3*min(a)^2)
  * step sizes               — _tt_get_step_sizes (:700-779) with the
                               fraction-to-boundary tau = 0.9+0.05*min(a)
  * outer loop / state       — tt_ipm + IPMStatus (:796-1099): warm-up XZ
                               direction then AHO, adaptive rounding budget
                               eta, stall detection -> finishing phase,
                               refinement countdown with boundary
                               regularisation, inequality activation state
                               machine.
"""

from __future__ import annotations

import sys
import traceback
from dataclasses import dataclass, field
from enum import Enum
from typing import Dict, Optional

import numpy as np

from ttipm_tpu import config
from ttipm_tpu.ops.tt import (
    TT,
    tt_add,
    tt_entrywise_sum,
    tt_identity,
    tt_IkronM,
    tt_inner_prod,
    tt_MkronI,
    tt_norm,
    tt_one_matrix,
    tt_ranks,
    tt_reshape,
    tt_scale,
    tt_sub,
    tt_trace,
    tt_transpose,
    tt_zero_matrix,
)
from ttipm_tpu.ops.rounding import (
    tt_mask_rank_reduce,
    tt_psd_rank_reduce,
    tt_rank_reduce,
)
from ttipm_tpu.ops.products import (
    tt_fast_hadamard,
    tt_fast_matrix_vec_mul,
    tt_mat_mat_mul,
    tt_mat_vec_mul,
)
from ttipm_tpu.ops.tt import tt_diag_op
from ttipm_tpu.solvers.amen import (
    AmenToleranceReached,
    AmenRestartsExhausted,
    tt_restarted_block_amen,
)
from ttipm_tpu.solvers.blocks import TTBlockMatrix, TTBlockVector, tt_get_block
from ttipm_tpu.solvers.eigen import (
    tt_max_generalised_eigen as _tt_max_generalised_eigen_ragged,
    tt_min_eig as _tt_min_eig_ragged,
)


def tt_max_generalised_eigen(*args, **kwargs):
    """Route to the fused fixed-rank eigensolver unless the ragged
    (reference-faithful) path is selected via config.set_fused_kkt(False)."""
    from ttipm_tpu import config as _cfg

    if _cfg.fused_kkt():
        from ttipm_tpu.solvers.fused_eigen import tt_max_generalised_eigen_fused

        kwargs.pop("size_limit", None)
        return tt_max_generalised_eigen_fused(*args, **kwargs)
    return _tt_max_generalised_eigen_ragged(*args, **kwargs)


def tt_min_eig(*args, **kwargs):
    from ttipm_tpu import config as _cfg

    if _cfg.fused_kkt():
        from ttipm_tpu.solvers.fused_eigen import tt_min_eig_fused

        kwargs.pop("size_limit", None)
        return tt_min_eig_fused(*args, **kwargs)
    return _tt_min_eig_ragged(*args, **kwargs)
from ttipm_tpu.solvers.local_kkt import ipm_local_solver, ipm_local_solver_ineq

__all__ = ["tt_ipm", "IPMStatus", "IneqStatus"]


class IneqStatus(Enum):
    """Inequality-constraint activation state machine
    (src/tt_ipm.py:165-176)."""

    ACTIVE = 0
    SETTING_ACTIVE = 1
    SETTING_INACTIVE = 2
    INACTIVE = 3
    NOT_IN_USE = 4

    def __str__(self):
        return self.name.lower().replace("_", " ")


@dataclass
class IPMStatus:
    """Mutable solver state threaded through one IPM run
    (src/tt_ipm.py:796-835)."""

    dim: int
    feasibility_tol: float
    centrality_tol: float
    op_tol: float
    eps: float

    aho_direction: bool
    is_primal_feasible: bool
    primal_error: float
    is_dual_feasible: bool
    dual_error: float
    is_central: bool
    centrality_error: float
    mu: float

    is_last_iter: bool
    ineq_status: IneqStatus
    verbose: bool

    primal_error_normalisation: float
    dual_error_normalisation: float
    mals_rank_restriction: int

    boundary_val: float = 1e-10
    ineq_boundary_val: float = 0.01
    sigma: float = 0.5
    num_ineq_constraints: float = 0
    lag_map_t: Optional[TT] = None
    lag_map_y: Optional[TT] = None
    compl_ineq_mask: Optional[TT] = None
    mals_delta0: Optional[TT] = None
    eigen_x0: Optional[TT] = None
    eigen_z0: Optional[TT] = None
    eigen_xt0: Optional[TT] = None
    eigen_zt0: Optional[TT] = None
    kkt_iterations: int = 7
    centrl_error_normalisation: float = 1.0
    eta: float = 1e-3
    # Absolute Newton-residual target for the solver's residual-equation
    # refinement rounds: direction noise of magnitude rn injects
    # ~rn * tr(X or Z) of complementary slackness through the PSD-rounding
    # compensation shifts, so the target scales as abs_tol / trace.
    refine_target: Optional[float] = None


# ---------------------------------------------------------------------------
# Residuals / KKT assembly
# ---------------------------------------------------------------------------

def tt_compute_primal_feasibility(lin_op_tt, bias_tt, X_tt, status):
    """L(X) - b at the working rounding budget (src/tt_ipm.py:404-407)."""
    budget = 0.01 * status.eta * status.primal_error_normalisation
    return tt_rank_reduce(
        tt_sub(
            tt_mat_vec_mul(lin_op_tt, tt_reshape(X_tt, (4,)), budget, status.eps),
            bias_tt,
        ),
        budget,
    )


def tt_compute_dual_feasibility(obj_tt, lin_op_tt_adj, Z_tt, Y_tt, T_tt, status):
    """L^T(Y) - Z - C [- T] (src/tt_ipm.py:410-417)."""
    budget = 0.01 * status.eta * status.dual_error_normalisation
    inner_eps = (
        status.eps if status.ineq_status is IneqStatus.ACTIVE else budget
    )
    dual_feas = tt_rank_reduce(
        tt_sub(
            tt_fast_matrix_vec_mul(lin_op_tt_adj, Y_tt, status.eps),
            tt_rank_reduce(tt_add(tt_reshape(Z_tt, (4,)), obj_tt), status.eps),
        ),
        inner_eps,
    )
    if status.ineq_status is IneqStatus.ACTIVE and T_tt is not None:
        dual_feas = tt_rank_reduce(
            tt_sub(dual_feas, tt_reshape(T_tt, (4,))), budget
        )
    return dual_feas


def _tt_symmetrise(matrix_tt, err_bound):
    return tt_rank_reduce(
        tt_scale(0.5, tt_add(matrix_tt, tt_transpose(matrix_tt))), eps=err_bound
    )


def _tt_psd_symmetrise(matrix_tt, err_bound, return_shift=False):
    return tt_psd_rank_reduce(
        tt_scale(0.5, tt_add(matrix_tt, tt_transpose(matrix_tt))),
        eps=err_bound, return_shift=return_shift,
    )


def _tt_mask_symmetrise(matrix_tt, mask_tt, err_bound):
    return tt_mask_rank_reduce(
        tt_scale(0.5, tt_add(matrix_tt, tt_transpose(matrix_tt))), mask_tt,
        eps=err_bound,
    )


def tt_compute_centrality(X_tt, Z_tt, status):
    """-(XZ) (symmetrised under AHO) as a vec'd TT
    (src/tt_ipm.py:420-426)."""
    budget = 0.01 * status.eta * status.centrl_error_normalisation
    if status.aho_direction:
        return tt_reshape(
            tt_scale(
                -1,
                _tt_symmetrise(
                    tt_mat_mat_mul(X_tt, Z_tt, budget, status.eps), budget
                ),
            ),
            (4,),
        )
    return tt_reshape(
        tt_scale(-1, tt_mat_mat_mul(Z_tt, X_tt, budget, status.eps)), (4,)
    )


def tt_infeasible_newton_system(
    lhs, obj_tt, X_tt, Y_tt, Z_tt, T_tt, lin_op_tt, lin_op_tt_adj, bias_tt,
    ineq_mask, status,
):
    """Assemble the per-iteration KKT blocks and right-hand side
    (src/tt_ipm.py:429-475)."""
    rhs = TTBlockVector()

    primal_feas = tt_compute_primal_feasibility(lin_op_tt, bias_tt, X_tt, status)
    status.primal_error = tt_norm(primal_feas) / status.primal_error_normalisation
    status.is_primal_feasible = status.primal_error < status.feasibility_tol

    dual_feas = tt_compute_dual_feasibility(obj_tt, lin_op_tt_adj, Z_tt, Y_tt, T_tt, status)
    status.dual_error = tt_norm(dual_feas) / status.dual_error_normalisation
    status.is_dual_feasible = status.dual_error < (
        (1 + (status.ineq_status is IneqStatus.ACTIVE)) * status.feasibility_tol
    )

    status.is_last_iter = status.is_last_iter or (
        status.is_primal_feasible and status.is_dual_feasible and status.is_central
    )

    dual_budget = 0.1 * status.eta * status.dual_error_normalisation
    primal_budget = 0.1 * status.eta * status.primal_error_normalisation
    if status.aho_direction:
        lhs[2, 1] = tt_psd_rank_reduce(
            tt_scale(0.5, tt_add(tt_IkronM(Z_tt), tt_MkronI(Z_tt))), eps=dual_budget
        )
        lhs[2, 2] = tt_psd_rank_reduce(
            tt_scale(0.5, tt_add(tt_MkronI(X_tt), tt_IkronM(X_tt))), eps=primal_budget
        )
    else:
        lhs[2, 1] = tt_psd_rank_reduce(tt_MkronI(Z_tt), eps=dual_budget)
        lhs[2, 2] = tt_psd_rank_reduce(tt_IkronM(X_tt), eps=primal_budget)

    if not status.is_primal_feasible or status.is_last_iter:
        rhs[0] = primal_feas
    if not status.is_dual_feasible or status.is_last_iter:
        rhs[1] = dual_feas
    if not status.is_central or status.is_last_iter:
        rhs[2] = tt_compute_centrality(X_tt, Z_tt, status)

    if status.ineq_status is IneqStatus.ACTIVE:
        lhs[3, 1] = tt_diag_op(T_tt, dual_budget)
        masked_X_tt = tt_rank_reduce(
            tt_add(
                tt_scale(status.ineq_boundary_val, ineq_mask),
                tt_fast_hadamard(ineq_mask, X_tt, status.eps),
            ),
            eps=status.eps,
        )
        lhs[3, 3] = tt_rank_reduce(
            tt_add(status.lag_map_t, tt_diag_op(masked_X_tt, status.eps)),
            eps=dual_budget,
        )
        if not status.is_central or status.is_last_iter:
            rhs[3] = tt_rank_reduce(
                tt_reshape(
                    tt_scale(-1, tt_fast_hadamard(masked_X_tt, T_tt, status.eps)),
                    (4,),
                ),
                eps=0.01 * status.eta * status.centrl_error_normalisation,
            )
    return lhs, rhs, status


# ---------------------------------------------------------------------------
# KKT row equilibration.  Functional contract as the reference
# (src/tt_ipm.py:502-568): balance the feasibility rows (0, 1) against the
# centrality rows (2, 3) by their rhs norms, clipped into [1e-6, 1e6], with
# a geometric-mean compromise for operator blocks whose transpose/alias
# mirror lives in a differently-scaled row.
# ---------------------------------------------------------------------------

_SCALE_FLOOR = 1e-6
_SCALE_CEIL = 1e6
_FEAS_ROWS = (0, 1)
_CENT_ROWS = (2, 3)


def _rhs_group_norm(rhs_vec_tt, rows) -> float:
    worst = 0.0
    for r in rows:
        row_tt = rhs_vec_tt.get_row(r)
        if row_tt is None:
            continue
        n = float(tt_norm(row_tt))
        if np.isfinite(n):
            worst = max(worst, n)
    return worst


def _kkt_equilibration(rhs_vec_tt, status) -> Dict[int, float]:
    """Row -> multiplicative scale, empty when no row needs balancing."""
    tol = max(status.op_tol, 1e-12)
    scales: Dict[int, float] = {}
    feas = _rhs_group_norm(rhs_vec_tt, _FEAS_ROWS)
    if feas > tol:
        s_feas = min(max(1.0 / feas, _SCALE_FLOOR), _SCALE_CEIL)
        scales.update(dict.fromkeys(_FEAS_ROWS, s_feas))
    cent = _rhs_group_norm(rhs_vec_tt, _CENT_ROWS)
    if cent > tol:
        s_cent = min(max(1.0 / cent, _SCALE_FLOOR), _SCALE_CEIL)
        if 0 in scales:
            # never let centrality outweigh feasibility
            s_cent = min(s_cent, scales[0])
        scales.update(dict.fromkeys(_CENT_ROWS, s_cent))
    return scales


def _coupled_block_scale(lhs, key, scales) -> float:
    """Scale for a stored block: its own row's scale, geometrically merged
    with the row scale of every mirror (transpose/alias) it also serves."""
    s = scales.get(key[0], 1.0)
    for coupling in (lhs._transposes, lhs._aliases):
        mirror = coupling.get(key)
        if mirror is not None and mirror[0] in scales:
            s = float(np.sqrt(s * scales[mirror[0]]))
    return s


def _apply_equilibration(lhs, rhs, scales):
    if not scales:
        return lhs, rhs
    lhs_eq = TTBlockMatrix()
    lhs_eq._aliases = dict(lhs._aliases)
    lhs_eq._transposes = dict(lhs._transposes)
    for key, block in lhs._data.items():
        s = _coupled_block_scale(lhs, key, scales)
        lhs_eq[key] = block if np.isclose(s, 1.0) else tt_scale(s, block)
    rhs_eq = TTBlockVector()
    for row in rhs.keys():
        s = scales.get(row, 1.0)
        row_tt = rhs.get_row(row)
        rhs_eq[row] = row_tt if np.isclose(s, 1.0) else tt_scale(s, row_tt)
    return lhs_eq, rhs_eq


def _tt_build_row_scaled_kkt(lhs, rhs, status, row_scales=None):
    if row_scales is None:
        row_scales = _kkt_equilibration(rhs, status)
    return _apply_equilibration(lhs, rhs, row_scales)


# ---------------------------------------------------------------------------
# Newton step (predictor + Mehrotra centering-corrector).  Algorithmic
# contract per src/tt_ipm.py:571-697; decomposed here into one direction
# extractor, a shared bilinear duality-gap expansion, and a composable
# rhs-augmentation helper (each solve is a call into the jitted fused
# sweep programs of solvers/fused.py).
# ---------------------------------------------------------------------------


def _solve_kkt(solver, lhs, rhs, status):
    Delta_tt, _ = solver(
        lhs, rhs, status.mals_delta0,
        status.kkt_iterations + status.is_last_iter,
        status.mals_rank_restriction, status.eta,
        refine_target=status.refine_target,
    )
    # Round the warm start to its EFFECTIVE ranks before storing: the fused
    # solver pads every bond to its solve rank R, and reading the padded
    # shape back as next iteration's starting rank ratchets the ladder to
    # the maximum R ever reached (measured at maxcut d11: every Newton
    # solve ran R=32 dense locals — (R*4*R)^3 cost — for solutions whose
    # true ranks were <= 13, ~15x oversized).  Components below the solve
    # tolerance carry no warm-start information, so rounding at
    # 0.1*eta*||Delta|| is free.
    try:
        eps_ws = 0.1 * status.eta * tt_norm(Delta_tt)
        status.mals_delta0 = tt_rank_reduce(Delta_tt, eps=eps_ws)
    except Exception:
        status.mals_delta0 = Delta_tt
    return Delta_tt


def _extract_directions(Delta_tt, ineq_mask, status):
    """Block order (0=dY, 1=dX, 2=dZ, 3=dT); dX/dZ symmetrised, dT masked."""
    dY = tt_rank_reduce(tt_get_block(0, Delta_tt), eps=status.eps)
    dX = _tt_symmetrise(tt_reshape(tt_get_block(1, Delta_tt), (2, 2)), status.eps)
    dZ = _tt_symmetrise(tt_reshape(tt_get_block(2, Delta_tt), (2, 2)), status.eps)
    dT = None
    if status.ineq_status is IneqStatus.ACTIVE:
        raw = tt_rank_reduce(tt_get_block(3, Delta_tt), eps=status.eps)
        dT = tt_fast_hadamard(ineq_mask, tt_reshape(raw, (2, 2)), status.eps)
    return dY, dX, dZ, dT


def _accumulate_directions(base, extra, status):
    """Predictor + corrector direction sums (rounded per component)."""
    out = []
    for b, e in zip(base, extra):
        if b is None or e is None:
            out.append(b)
        else:
            out.append(tt_rank_reduce(tt_add(b, e), eps=status.eps))
    return tuple(out)


def _affine_gap_estimate(gap0, A_tt, dA, B_tt, dB, a, b):
    """<A + a dA, B + b dB> given gap0 = <A, B> (bilinear expansion)."""
    return (
        gap0
        + a * b * tt_inner_prod(dA, dB)
        + b * tt_inner_prod(A_tt, dB)
        + a * tt_inner_prod(dA, B_tt)
    )


def _mehrotra_sigma(mu_aff, gap, a, b):
    """sigma = clip((mu_aff / gap)^e), e = max(1, 3 min(a, b)^2)."""
    e = max(1, 3 * min(a, b) ** 2)
    return min(0.99, max(mu_aff / gap, 0) ** e)


def _rhs_augment(rhs_vec_tt, row, terms, budget):
    acc = rhs_vec_tt.get_row(row)
    for t in terms:
        acc = tt_add(acc, t)
    rhs_vec_tt[row] = tt_rank_reduce(acc, budget)


def _corrector_rhs(rhs_vec_tt, dX, dZ, DXZ, ineq_mask, status, dim):
    """Fold sigma*mu*I centering and the -dX dZ second-order term into the
    centrality row; mirror the centering onto the inequality row."""
    budget = 0.1 * status.eta * status.centrl_error_normalisation
    centering = status.sigma > 1e-4
    terms = []
    if centering:
        terms.append(
            tt_scale(status.sigma * status.mu, tt_reshape(tt_identity(dim), (4,)))
        )
    if DXZ > 0.1 * status.centrality_tol:
        terms.append(tt_compute_centrality(dX, dZ, status))
    if terms:
        _rhs_augment(rhs_vec_tt, 2, terms, budget)
    if centering and status.ineq_status is IneqStatus.ACTIVE:
        _rhs_augment(
            rhs_vec_tt, 3,
            [tt_scale(status.sigma * status.mu, tt_reshape(ineq_mask, (4,)))],
            budget,
        )


def _tt_ipm_newton_step(
    lhs_matrix_tt, rhs_vec_tt, ineq_mask, X_tt, Z_tt, T_tt, ZX, TX, status, solver,
):
    """Predictor solve -> step sizes -> Mehrotra sigma -> corrector solve.
    Contract of src/tt_ipm.py:571-697."""
    try:
        return _newton_step_inner(
            lhs_matrix_tt, rhs_vec_tt, ineq_mask, X_tt, Z_tt, T_tt, ZX, TX,
            status, solver,
        )
    except Exception as e:
        # Total-function recovery (parity :691-695): AmenToleranceReached,
        # AmenRestartsExhausted and numerical failures all route the outer
        # loop into its PSD-boundary / finishing branch.
        print(f"\n\tAttention: {e}")
        traceback.print_exc(file=sys.stdout)
        return 0, 0, None, None, None, None, status


def _newton_step_inner(
    lhs_matrix_tt, rhs_vec_tt, ineq_mask, X_tt, Z_tt, T_tt, ZX, TX, status, solver,
):
    # Numerical tripwire (parity src/tt_ipm.py:15-16): host-side numpy
    # NaN/overflow production raises here instead of corrupting a sweep,
    # so the recovery branch above fires at the first bad arithmetic.
    with config.numerical_tripwire():
        row_scales = _kkt_equilibration(rhs_vec_tt, status)
        lhs_p, rhs_p = _apply_equilibration(lhs_matrix_tt, rhs_vec_tt, row_scales)
        delta = _solve_kkt(solver, lhs_p, rhs_p, status)
        dY, dX, dZ, dT = _extract_directions(delta, ineq_mask, status)

        x_step, z_step = _tt_get_step_sizes(
            X_tt, Z_tt, T_tt, dX, dZ, dT, ineq_mask, status
        )

        if status.is_central or status.is_last_iter:
            status.sigma = 0
            return x_step, z_step, dX, dY, dZ, dT, status

        # Mehrotra centering parameter from the affine trial point
        DXZ = tt_inner_prod(dX, dZ)
        mu_aff = _affine_gap_estimate(ZX, X_tt, dX, Z_tt, dZ, x_step, z_step)
        gap = ZX
        if status.ineq_status is IneqStatus.ACTIVE:
            mu_aff += _affine_gap_estimate(TX, X_tt, dX, T_tt, dT, x_step, z_step)
            # the barrier shift beta contributes through sum(dT) on the mask
            mu_aff += z_step * status.ineq_boundary_val * tt_entrywise_sum(dT)
            gap = ZX + TX
        status.sigma = _mehrotra_sigma(mu_aff, gap, x_step, z_step)

        _corrector_rhs(rhs_vec_tt, dX, dZ, DXZ, ineq_mask, status, len(X_tt))

        lhs_c, rhs_c = _apply_equilibration(lhs_matrix_tt, rhs_vec_tt, row_scales)
        delta_c = _solve_kkt(solver, lhs_c, rhs_c, status)
        corr = _extract_directions(delta_c, ineq_mask, status)
        dY, dX, dZ, dT = _accumulate_directions((dY, dX, dZ, dT), corr, status)

        x_step, z_step = _tt_get_step_sizes(
            X_tt, Z_tt, T_tt, dX, dZ, dT, ineq_mask, status
        )
    return x_step, z_step, dX, dY, dZ, dT, status


# ---------------------------------------------------------------------------
# Step sizes (contract of src/tt_ipm.py:700-779): largest alpha keeping
# X + alpha dX (and Z, and the masked entries) in the cone, then the
# fraction-to-boundary backoff tau = 0.9 + 0.05 min(alpha).
# ---------------------------------------------------------------------------


def _regularised(A_tt, shift, dim):
    return tt_add(A_tt, tt_scale(shift, tt_identity(dim)))


def _tt_get_step_sizes(
    X_tt, Z_tt, T_tt, Delta_X_tt, Delta_Z_tt, Delta_T_tt, ineq_mask, status
):
    dim = len(X_tt)
    if status.is_last_iter:
        # the refinement phase line-searches against a pushed-out boundary
        X_tt = _regularised(X_tt, status.boundary_val, dim)
        Z_tt = _regularised(Z_tt, status.boundary_val, dim)

    x_step, status.eigen_x0 = tt_max_generalised_eigen(
        X_tt, Delta_X_tt, x0=status.eigen_x0, tol=1e-8, verbose=status.verbose
    )
    z_step, status.eigen_z0 = tt_max_generalised_eigen(
        Z_tt, Delta_Z_tt, x0=status.eigen_z0, tol=1e-8, verbose=status.verbose
    )

    if status.ineq_status is not IneqStatus.NOT_IN_USE:
        if status.is_last_iter:
            shift = status.ineq_boundary_val + status.boundary_val
            X_tt = tt_add(X_tt, tt_scale(shift, ineq_mask))
            T_tt = tt_add(T_tt, tt_scale(shift, ineq_mask))
        x_step, z_step = _tt_get_ineq_step_sizes(
            x_step, z_step, X_tt, T_tt, Delta_X_tt, Delta_T_tt, ineq_mask, status
        )

    tau = 0.9 + 0.05 * min(x_step, z_step)
    if status.verbose:
        print(f"Step sizes: a_p:{x_step:.2e}, a_d:{z_step:.2e}", flush=True)
    return tau * x_step, tau * z_step


def _ineq_step_size(A_tt, Delta_tt, e_tt, status):
    """Largest alpha with (A + alpha Delta) >= 0 entrywise on the mask.
    Runs one min-eig sweep over Diag(A + Delta); when the minimising
    eigenvector localises on a genuine (on-mask) entry, the entry values
    of A and Delta there give the exact boundary ratio
    (src/tt_ipm.py:730-747)."""
    trial = tt_add(A_tt, Delta_tt)
    if status.compl_ineq_mask:
        trial = tt_add(trial, status.compl_ineq_mask)
    trial = tt_rank_reduce(trial, status.eps)
    e_tt, _ = tt_min_eig(
        tt_diag_op(trial, status.eps), x0=e_tt, tol=1e-8, verbose=status.verbose
    )
    e_sq = tt_reshape(e_tt, (2, 2))
    if abs(tt_inner_prod(trial, e_sq)) <= status.eps:
        # minimiser sits on a padded (off-mask) entry: the step is free
        return 1.0, e_tt
    from ttipm_tpu.ops.tt import tt_normalise

    weight = tt_normalise(tt_fast_hadamard(e_sq, e_sq, status.eps))
    here_A = abs(tt_inner_prod(A_tt, weight))
    here_D = tt_inner_prod(Delta_tt, weight)
    if here_D >= -status.eps:
        return 1.0, e_tt
    return float(np.clip(-here_A / here_D, 0, 1)), e_tt


def _tt_get_ineq_step_sizes(
    x_step, z_step, X_tt, T_tt, Delta_X_tt, Delta_T_tt, ineq_mask, status
):
    if x_step > 0:
        masked_X = tt_fast_hadamard(ineq_mask, X_tt, status.eps)
        masked_DX = tt_fast_hadamard(ineq_mask, Delta_X_tt, status.eps)
        x_ineq_step, status.eigen_xt0 = _ineq_step_size(
            tt_add(masked_X, tt_scale(status.ineq_boundary_val, ineq_mask)),
            tt_scale(x_step, masked_DX),
            status.eigen_xt0,
            status,
        )
        if not status.is_last_iter:
            # activation state machine: a full step with a vanished T means
            # the inequality constraints have gone slack
            if 1 - x_ineq_step < status.op_tol and tt_norm(T_tt) < status.op_tol:
                if status.ineq_status is IneqStatus.ACTIVE:
                    status.ineq_status = IneqStatus.SETTING_INACTIVE
            elif status.ineq_status is IneqStatus.INACTIVE:
                status.ineq_status = IneqStatus.SETTING_ACTIVE
        x_step *= x_ineq_step

    if z_step > 0 and status.ineq_status is IneqStatus.ACTIVE:
        t_step, status.eigen_zt0 = _ineq_step_size(
            T_tt, tt_scale(z_step, Delta_T_tt), status.eigen_zt0, status
        )
        z_step *= t_step
    return x_step, z_step


# ---------------------------------------------------------------------------
# Outer loop
# ---------------------------------------------------------------------------

def _initialise(ineq_mask, status, dim, lambdaStar, lambdaStarIneq):
    """X = Z = lambda* I (plus a mask shift keeping X PSD when inequalities
    are active); Y = 0 (src/tt_ipm.py:782-794)."""
    X_tt = tt_scale(lambdaStar, tt_identity(dim))
    Z_tt = tt_scale(lambdaStar, tt_identity(dim))
    Y_tt = tt_reshape(tt_zero_matrix(dim), (4,))
    T_tt = None
    if status.ineq_status is IneqStatus.ACTIVE:
        T_tt = tt_scale(lambdaStarIneq, ineq_mask)
        x_step, _ = tt_max_generalised_eigen(
            X_tt, ineq_mask, tol=1e-7, verbose=status.verbose
        )
        X_tt = tt_rank_reduce(
            tt_add(X_tt, tt_scale(0.1 * x_step, ineq_mask)),
            0.1 * status.eta * status.primal_error_normalisation,
        )
    return X_tt, Y_tt, Z_tt, T_tt


def _ipm_check_for_stalled_progress(prev_errors, status, gap_tol):
    if status.is_last_iter:
        return False
    primal = abs(prev_errors["primal"] - status.primal_error) < 0.04 * gap_tol
    dual = abs(prev_errors["dual"] - status.dual_error) < 0.04 * gap_tol
    central = abs(prev_errors["centrality"] - status.centrality_error) < 0.02 * gap_tol
    return primal and dual and central


def _ipm_check_convergence(status, finishing_steps, ZX, TX, abs_tol,
                           max_refinement, prev_slack=np.inf,
                           can_extend=False):
    if not status.is_last_iter:
        return status, finishing_steps
    slack = abs(ZX) + abs(TX)
    converged = (
        slack < abs_tol
        and status.primal_error < abs_tol
        and status.dual_error < abs_tol
    )
    if converged:
        finishing_steps = 0
    else:
        # Progress-aware countdown: the refinement budget exists to stop a
        # STALLED finishing phase, not a converging one.  Measured at
        # maxcut d11 (results/grid_r4/maxcut11_diag.log): the countdown
        # exhausted at slack 1.09e-2 while the gap was contracting 20x per
        # iteration — one more step would have converged.  While the
        # absolute slack still halves per iteration (and the hard max_iter
        # cap has room, can_extend), hold the countdown at 1 instead of
        # exhausting it.
        rapid = np.isfinite(prev_slack) and slack < 0.5 * prev_slack
        held = finishing_steps == 1 and rapid and can_extend
        if not held:
            finishing_steps -= 1
            if finishing_steps == 1:
                status.kkt_iterations += 1
        status.boundary_val = 0.001 * (
            1 - (max(finishing_steps, 0) / max_refinement)
        )
    return status, finishing_steps


def _ipm_format_output(X_tt, Y_tt, T_tt, Z_tt, iteration, status):
    ranksX = tt_ranks(X_tt)
    ranksZ = tt_ranks(Z_tt)
    ranksY = tt_ranks(Y_tt)
    ranksT = tt_ranks(T_tt) if T_tt else [0] * (status.dim - 1)
    results = {
        "num_iters": iteration,
        "ranksX": ranksX,
        "ranksY": ranksY,
        "ranksZ": ranksZ,
        "ranksT": ranksT,
        "status": status,
    }
    return X_tt, Y_tt, T_tt, Z_tt, results


def _ipm_log_iteration(iteration, status, X_tt, Y_tt, Z_tt, T_tt):
    print(f"\n--- Iteration {iteration - 1} ---")
    print(f"Status: Finishing up={status.is_last_iter}, Ineq={status.ineq_status}")
    print(
        f"Feasibility: Central={status.is_central}, "
        f"Primal={status.is_primal_feasible}, Dual={status.is_dual_feasible}"
    )
    print(f"Direction: {'AHO' if status.aho_direction else 'XZ'}, Sigma: {status.sigma:.2e}")
    print(
        f"Errors: Centrality={status.centrality_error:.4e}, "
        f"Primal={status.primal_error:.4e}, Dual={status.dual_error:.4e}"
    )
    print(
        f"Ranks: X={tt_ranks(X_tt)}, Z={tt_ranks(Z_tt)}, Y={tt_ranks(Y_tt)}, "
        f"T={tt_ranks(T_tt) if T_tt else 'N/A'}",
        flush=True,
    )


def tt_ipm(
    lag_maps,
    obj_tt,
    lin_op_tt,
    bias_tt,
    ineq_mask=None,
    max_iter=100,
    max_refinement=5,
    warm_up=3,
    gap_tol=1e-4,
    aho_direction=True,
    op_tol=1e-5,
    abs_tol=8e-4,
    eps=1e-12,
    mals_restarts=3,
    r_max=1000,
    lambdaStar=1,
    lambdaStarIneq=1,
    checkpoint_path=None,
    checkpoint_every=1,
    resume_from=None,
    verbose=False,
):
    """TT interior-point driver (src/tt_ipm.py:901-1099).

    Returns ``(X_tt, Y_tt, T_tt, Z_tt, results)`` with results carrying the
    iteration count, final TT ranks and the final ``IPMStatus``.

    ``checkpoint_path``/``checkpoint_every`` persist the iterates every N
    iterations; ``resume_from`` restarts from a stored checkpoint (an
    on-disk recovery layer the reference lacks, SURVEY.md §5).
    """
    dim = len(obj_tt)
    centrality_tol = gap_tol / np.sqrt(dim)
    feasibility_tol = 2 * gap_tol
    status = IPMStatus(
        dim, feasibility_tol, centrality_tol, op_tol, eps,
        aho_direction, False, np.inf, False, np.inf, False, np.inf, np.inf,
        False,
        IneqStatus.NOT_IN_USE if ineq_mask is None else IneqStatus.ACTIVE,
        verbose, 1, 1, r_max,
    )
    lag_maps = {k: tt_rank_reduce(v, eps=eps) for k, v in lag_maps.items()}
    obj_tt = tt_rank_reduce(obj_tt, eps=eps)
    lin_op_tt = tt_rank_reduce(lin_op_tt, eps=eps)
    bias_tt = tt_rank_reduce(bias_tt, eps=eps)

    status.primal_error_normalisation = 1 + tt_norm(bias_tt)
    status.dual_error_normalisation = 1 + tt_norm(obj_tt)

    lhs_skeleton = TTBlockMatrix()
    lhs_skeleton[1, 2] = tt_reshape(tt_identity(2 * dim), (4, 4))

    from ttipm_tpu import config as _config

    def make_solver(local, is_ineq):
        if _config.fused_kkt():
            from ttipm_tpu.solvers.fused import tt_restarted_block_amen_fused

            # Sticky failure flag, mirroring the reference's
            # direct_solve_failure threading (src/tt_ipm.py:224-231,
            # src/tt_als.py:306-310): after the fused fixed-rank ladder
            # exhausts once, later Newton solves skip straight to the
            # rank-adaptive ragged sweep instead of re-paying the ladder.
            # The stickiness exists for systems whose solutions genuinely
            # exceed the ladder's rank cap (graphm KKTs need rank ~52);
            # a TRANSIENT failure (a near-singular finishing-phase KKT)
            # must not condemn every later solve to the ragged restart
            # loop, so the flag un-sticks whenever the next warm start's
            # effective ranks fit the ladder cap — with a consecutive-
            # failure bound so a genuinely hard run cannot ping-pong.
            state = {"fused_ok": True, "fails": 0}

            def _warm_fits_ladder(x0, restriction):
                if x0 is None:
                    return False
                d = dim
                r_cap = int(min(restriction, 4 ** ((d + 1) // 2), 32))
                warm_r = max(
                    (int(c.shape[-1]) for c in x0[:-1]), default=4
                )
                return warm_r <= r_cap

            def ragged(lhs, rhs, x0, nwsp, restriction, termination_tol,
                       refine_target=None):
                return tt_restarted_block_amen(
                    lhs, rhs,
                    rank_restriction=restriction,
                    x0=x0,
                    local_solver=local,
                    op_tol=op_tol,
                    termination_tol=termination_tol,
                    num_restarts=mals_restarts,
                    inner_m=nwsp,
                    verbose=verbose,
                    refine_target=refine_target,
                )

            def solver(lhs, rhs, x0, nwsp, restriction, termination_tol,
                       refine_target=None):
                if not state["fused_ok"]:
                    if state["fails"] < 3 and _warm_fits_ladder(x0, restriction):
                        state["fused_ok"] = True
                        if verbose:
                            print("\t[fused] warm start fits ladder cap -> "
                                  "retrying fused (un-stick)")
                    else:
                        return ragged(lhs, rhs, x0, nwsp, restriction,
                                      termination_tol, refine_target)
                try:
                    out = tt_restarted_block_amen_fused(
                        lhs, rhs,
                        rank_restriction=restriction,
                        op_tol=op_tol,
                        ineq=is_ineq,
                        termination_tol=termination_tol,
                        num_restarts=mals_restarts,
                        inner_m=nwsp,
                        x0=x0,
                        verbose=verbose,
                        refine_target=refine_target,
                    )
                    state["fails"] = 0
                    return out
                except AmenRestartsExhausted:
                    state["fused_ok"] = False
                    state["fails"] += 1
                    if verbose:
                        print("\t[fused] restarts exhausted -> ragged AMEn"
                              f" (sticky, fail {state['fails']})")
                    return ragged(lhs, rhs, x0, nwsp, restriction,
                                  termination_tol, refine_target)
            return solver

        def solver(lhs, rhs, x0, nwsp, restriction, termination_tol,
                   refine_target=None):
            return tt_restarted_block_amen(
                lhs, rhs,
                rank_restriction=restriction,
                x0=x0,
                local_solver=local,
                op_tol=op_tol,
                termination_tol=termination_tol,
                num_restarts=mals_restarts,
                inner_m=nwsp,
                verbose=verbose,
                refine_target=refine_target,
            )
        return solver

    solver_eq = make_solver(ipm_local_solver, False)
    solver_ineq = make_solver(ipm_local_solver_ineq, True)

    if status.ineq_status is IneqStatus.ACTIVE:
        solver = solver_ineq
        status.num_ineq_constraints = tt_inner_prod(ineq_mask, ineq_mask)
        status.compl_ineq_mask = tt_rank_reduce(
            tt_sub(tt_one_matrix(dim), ineq_mask), eps=eps
        )
        status.lag_map_t = lag_maps["t"]
        lhs_skeleton.add_alias((1, 2), (1, 3))
    else:
        solver = solver_eq
        status.num_ineq_constraints = 0

    lin_op_tt_adj = tt_transpose(lin_op_tt)
    lhs_skeleton[0, 1] = tt_scale(-1, lin_op_tt)
    lhs_skeleton.add_alias((0, 1), (1, 0), is_transpose=True)
    lhs_skeleton[0, 0] = lag_maps["y"]
    status.lag_map_y = lag_maps["y"]

    X_tt, Y_tt, Z_tt, T_tt = _initialise(ineq_mask, status, dim, lambdaStar, lambdaStarIneq)

    iteration = 0
    if resume_from is not None:
        from ttipm_tpu.utils.checkpoint import load_ipm_checkpoint

        ckpt = load_ipm_checkpoint(resume_from)
        X_tt = ckpt["X"] or X_tt
        Y_tt = ckpt["Y"] or Y_tt
        Z_tt = ckpt["Z"] or Z_tt
        T_tt = ckpt["T"] if ckpt["T"] is not None else T_tt
        iteration = int(ckpt["iteration"])
        status.eta = float(ckpt["scalars"].get("eta", status.eta))
        if verbose:
            print(f"resumed from {resume_from} at iteration {iteration}")

    finishing_steps = max_refinement
    prev_errors = {"primal": np.inf, "dual": np.inf, "centrality": np.inf}
    lhs = lhs_skeleton

    while finishing_steps > 0:
        iteration += 1
        # The shape stream leaks LLVM-ORC mmaps per compiled program; on
        # long runs this crosses vm.max_map_count and segfaults (observed
        # on graphm n=2).  Drop stale executables under pressure — with the
        # persistent compile cache, re-JITs are ~9ms disk loads.
        if _config.maybe_relieve_map_pressure() and verbose:
            print("\t[map-pressure] cleared jit caches")
        status.aho_direction = iteration > warm_up
        if max_iter - max_refinement == iteration - 1 and not status.is_last_iter:
            if verbose:
                print("=== maximum iterations reached: entering finishing phase ===")
            status.is_last_iter = True
        ZX = tt_inner_prod(Z_tt, X_tt)
        TX = (
            tt_inner_prod(X_tt, T_tt)
            + status.ineq_boundary_val * tt_entrywise_sum(T_tt)
            if status.ineq_status is IneqStatus.ACTIVE
            else 0
        )
        status.mu = (abs(ZX) + abs(TX)) / (
            2**dim
            + (status.ineq_status is IneqStatus.ACTIVE) * status.num_ineq_constraints
        )
        status.centrl_error_normalisation = 1 + abs(
            tt_inner_prod(obj_tt, tt_reshape(X_tt, (4,)))
        )
        status.centrality_error = status.mu / status.centrl_error_normalisation
        status.is_central = status.centrality_error < centrality_tol
        status.eta = max(min(status.eta, 2 * status.mu), status.op_tol)
        # Newton-residual refinement target: keep the per-iteration slack
        # injection of the PSD compensation shifts (~ rn * trace) an order
        # below abs_tol (config.py::newton_refine rationale).  The target
        # is mu-aware: injections while the current absolute slack is still
        # far above abs_tol get shrunk along with everything else by the
        # subsequent IPM contraction — only the final stretch's injections
        # are permanent.  Gating on the current slack keeps the early
        # iterations from paying refinement solves they don't need
        # (advisor round-3: refine fired twice at iteration 1 of maxcut d6
        # to hit a 1.6e-6 target while mu was ~1e-2).
        if _config.newton_refine():
            tr_scale = max(
                1.0, abs(float(tt_trace(X_tt))), abs(float(tt_trace(Z_tt)))
            )
            slack_now = abs(ZX) + abs(TX)
            status.refine_target = (
                max(0.1 * abs_tol, 1e-3 * slack_now) / tr_scale
            )
        else:
            status.refine_target = None

        lhs_matrix_tt, rhs_vec_tt, status = tt_infeasible_newton_system(
            lhs, obj_tt, X_tt, Y_tt, Z_tt, T_tt, lin_op_tt, lin_op_tt_adj,
            bias_tt, ineq_mask, status,
        )

        if verbose:
            _ipm_log_iteration(iteration, status, X_tt, Y_tt, Z_tt, T_tt)

        status, finishing_steps = _ipm_check_convergence(
            status, finishing_steps, ZX, TX, abs_tol, max_refinement,
            prev_slack=prev_errors.get("slack", np.inf),
            can_extend=iteration < max_iter,
        )
        prev_errors["slack"] = abs(ZX) + abs(TX)
        if finishing_steps == 0:
            iteration -= 1
            break

        x_step, z_step, Delta_X_tt, Delta_Y_tt, Delta_Z_tt, Delta_T_tt, status = (
            _tt_ipm_newton_step(
                lhs_matrix_tt, rhs_vec_tt, ineq_mask, X_tt, Z_tt, T_tt, ZX, TX,
                status, solver,
            )
        )

        if (Delta_X_tt is None and Delta_Z_tt is None) or (
            x_step < 1e-5 and z_step < 1e-5
        ):
            if status.is_last_iter:
                break
            if verbose:
                print("=== hit PSD boundary: entering finishing phase ===")
            status.is_last_iter = True
        else:
            primal_budget = 0.1 * status.eta * status.primal_error_normalisation
            dual_budget = 0.1 * status.eta * status.dual_error_normalisation
            if finishing_steps <= 1:
                X_tt = _tt_symmetrise(
                    tt_add(X_tt, tt_scale(x_step, Delta_X_tt)), primal_budget
                )
                Z_tt = _tt_symmetrise(
                    tt_add(Z_tt, tt_scale(z_step, Delta_Z_tt)), dual_budget
                )
            else:
                X_tt, shift_x = _tt_psd_symmetrise(
                    tt_add(X_tt, tt_scale(x_step, Delta_X_tt)), primal_budget,
                    return_shift=True,
                )
                Z_tt, shift_z = _tt_psd_symmetrise(
                    tt_add(Z_tt, tt_scale(z_step, Delta_Z_tt)), dual_budget,
                    return_shift=True,
                )
                if verbose and (shift_x > 0 or shift_z > 0):
                    # Diagnostic for the large-d slackness floor: the PSD
                    # compensation shifts inject ~shift_x*tr(Z)+shift_z*tr(X)
                    # of absolute slackness per iteration.
                    inj = shift_x * float(tt_trace(Z_tt)) + shift_z * float(
                        tt_trace(X_tt)
                    )
                    print(
                        f"\tPSD-shift: X {shift_x:.2e}, Z {shift_z:.2e}, "
                        f"slack injection ~{inj:.2e}"
                    )

            Y_tt = tt_rank_reduce(tt_add(Y_tt, tt_scale(z_step, Delta_Y_tt)), status.eps)
            Y_tt = tt_reshape(
                _tt_symmetrise(
                    tt_reshape(
                        tt_sub(
                            Y_tt,
                            tt_fast_matrix_vec_mul(status.lag_map_y, Y_tt, status.eps),
                        ),
                        (2, 2),
                    ),
                    dual_budget,
                ),
                (4,),
            )

            if status.ineq_status is IneqStatus.ACTIVE:
                if finishing_steps <= 1:
                    T_tt = _tt_symmetrise(
                        tt_add(T_tt, tt_scale(z_step, Delta_T_tt)), dual_budget
                    )
                else:
                    T_tt = _tt_mask_symmetrise(
                        tt_add(T_tt, tt_scale(z_step, Delta_T_tt)), ineq_mask,
                        dual_budget,
                    )
            elif status.ineq_status is IneqStatus.SETTING_INACTIVE:
                solver = solver_eq
                lhs = lhs_skeleton.get_submatrix(2, 2)
                status.mals_delta0 = None
                status.ineq_status = IneqStatus.INACTIVE
            elif status.ineq_status is IneqStatus.SETTING_ACTIVE:
                solver = solver_ineq
                lhs = lhs_skeleton
                status.mals_delta0 = None
                status.ineq_status = IneqStatus.ACTIVE

        if _ipm_check_for_stalled_progress(prev_errors, status, gap_tol):
            if verbose:
                print("=== progress stalled: entering finishing phase ===")
            status.is_last_iter = True

        prev_errors["primal"] = status.primal_error
        prev_errors["dual"] = status.dual_error
        prev_errors["centrality"] = status.centrality_error

        if checkpoint_path is not None and iteration % max(checkpoint_every, 1) == 0:
            from ttipm_tpu.utils.checkpoint import save_ipm_checkpoint

            save_ipm_checkpoint(
                checkpoint_path, X_tt, Y_tt, Z_tt, T_tt, iteration=iteration,
                scalars={
                    "eta": status.eta,
                    "mu": status.mu,
                    "primal_error": status.primal_error,
                    "dual_error": status.dual_error,
                },
            )

    if verbose:
        print(f"--- terminated after {iteration} iterations ---")
    return _ipm_format_output(X_tt, Y_tt, T_tt, Z_tt, iteration, status)
