"""numpy engine for the fused fixed-rank block-AMEn sweep.

Same algorithm as the jitted sweep programs of ``solvers/fused.py`` —
fixed bond rank R, Schur-elimination local KKT solves with the in-kernel
never-regress guard, AMEn z-train enrichment folded into the fixed basis,
Petrov-Galerkin phi updates — executed with numpy/LAPACK on the host.

Why this exists (round-4 profile, results/profile_d3.txt): at small d the
local panels are tiny (m = R*4*R <= a few hundred) and a warm-cache CPU
solve still spent >90% of wall clock in XLA trace/lower/compile/dispatch
of the per-signature sweep programs — the arithmetic is microseconds.
The reference's Cython engine has zero such overhead, and beating its
wall clock on CPU requires the same property.  On TPU runs the jitted
device programs of fused.py remain the engine (config.offload_device()
selects them); this module is the host-side twin, dispatched by
``tt_block_amen_fused`` when host-algebra mode is active
(config.py::host_algebra rationale).

Parity: the numerical semantics mirror fused.py line-for-line (same
guards, scalings, enrichment ranks); reference algorithm
/root/reference/src/tt_als.py:277-741 + src/tt_ipm.py:183-401.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import scipy.linalg as sla

from ttipm_tpu import config

TINY = 1e-300


# Shared cached-plan einsum (ops/host_einsum.py — the reference's
# cached_einsum pattern, src/tt_ops.py:22-28).
from ttipm_tpu.ops.host_einsum import host_einsum as _es


def _keys(ineq: bool):
    return ("00", "01", "12", "21", "22", "31", "33") if ineq else (
        "00", "01", "12", "21", "22"
    )


def _nrows(ineq: bool) -> int:
    return 4 if ineq else 3


def _svd(mat: np.ndarray):
    try:
        return np.linalg.svd(mat, full_matrices=False)
    except np.linalg.LinAlgError:
        return sla.svd(mat, full_matrices=False, lapack_driver="gesvd")


# ---------------------------------------------------------------------------
# Block algebra — single-sourced from solvers/fused_algebra.py (shared
# with the jitted device engine; cached-plan numpy einsum backend here)
# ---------------------------------------------------------------------------

from ttipm_tpu.solvers import fused_algebra as _fa

_ALG = _fa.make_algebra(_es, np, _keys, _nrows)
_apply = _ALG.apply
_apply_T = _ALG.apply_T
_proj = _ALG.proj
_local_product = _ALG.local_product
_z_product = _ALG.z_product
_mixed_product = _ALG.mixed_product
_project_rhs = _ALG.project_rhs
_den_clamp = _ALG.den_clamp
_tikhonov = _ALG.tikhonov
_column_scales = _ALG.column_scales
_unit_fro = _ALG.unit_fro
_phis_bck = _ALG.phis_bck
_phis_fwd = _ALG.phis_fwd
_virtual_term_cores = _ALG.virtual_term_cores


def _chol_solve(L, b):
    y = sla.solve_triangular(L, b, lower=True, check_finite=False)
    return sla.solve_triangular(L.T, y, lower=False, check_finite=False)




def _cholesky(S):
    try:
        return np.linalg.cholesky(S)
    except np.linalg.LinAlgError:
        # same effect as the XLA path (which returns NaN and trips the
        # never-regress guard): poison the factors so the candidate is
        # rejected and the previous core kept
        return np.full_like(S, np.nan)


def _qr_factor(a):
    """General square factorization for the Schur systems.  The jitted
    engine uses Householder QR because TPU XLA has no f64 LU; on the host
    LAPACK getrf is ~3x cheaper at the same (Tikhonov-regularised)
    conditioning, and a singular system surfaces as a huge-norm candidate
    that the magnitude-sanity guard rejects (measured round 4: QR of the
    m~1024 Schur matrices was 97 of 417 profiled seconds at maxcut d6
    seed 54)."""
    return sla.lu_factor(a, check_finite=False)


def _qr_apply(lu, b):
    return sla.lu_solve(lu, b, check_finite=False)


def _dense_factor(pl, A, pr, inv_I, ineq: bool):
    L_L_Z = _cholesky(_tikhonov(_proj(pl["21"], A["21"], pr["21"])))
    mL_eq = _proj(pl["01"], A["01"], pr["01"])
    if not np.all(np.isfinite(L_L_Z)):
        raise FloatingPointError("cholesky failed")
    if not ineq:
        L_X_I_inv = _proj(pl["22"], A["22"], pr["22"]) * inv_I.reshape(1, -1)
        S = _chol_solve(L_L_Z, L_X_I_inv)
        S = mL_eq @ (S @ mL_eq.T)
        S = _tikhonov(S + _proj(pl["00"], A["00"], pr["00"]))
        return (L_L_Z, mL_eq, L_X_I_inv, _qr_factor(S))

    Lz_inv_Lx = _chol_solve(L_L_Z, _proj(pl["22"], A["22"], pr["22"]))
    T_op = _proj(pl["31"], A["31"], pr["31"])
    Lz_inv_Lx_scaled = Lz_inv_Lx * inv_I.reshape(1, -1)
    S = _proj(pl["00"], A["00"], pr["00"])
    S = S + mL_eq @ (Lz_inv_Lx_scaled @ mL_eq.T)
    D = _proj(pl["33"], A["33"], pr["33"])
    D = _tikhonov(D + T_op @ Lz_inv_Lx)
    TY = (T_op @ Lz_inv_Lx_scaled) @ mL_eq.T
    YT = mL_eq @ Lz_inv_Lx
    d_qr = _qr_factor(D)
    lhs_y = _tikhonov(S - YT @ _qr_apply(d_qr, TY))
    return (L_L_Z, mL_eq, Lz_inv_Lx_scaled, T_op, TY, YT, d_qr,
            _qr_factor(lhs_y))


def _dense_apply(fac, pl, A, pr, inv_I, rhs, ineq: bool):
    r, _, n, R = rhs.shape
    m = r * n * R
    mR_p = rhs[:, 0].reshape(m, 1)
    mR_d = rhs[:, 1].reshape(m, 1)
    mR_c = rhs[:, 2].reshape(m, 1)
    if not ineq:
        L_L_Z, mL_eq, L_X_I_inv, s_qr = fac
        b_vec = mR_p - mL_eq @ _chol_solve(L_L_Z, mR_c - L_X_I_inv @ mR_d)
        y = _qr_apply(s_qr, b_vec)
        y3 = y.reshape(r, n, R)
        z = inv_I * (rhs[:, 1] - _apply_T(pl["01"], A["01"], pr["01"], y3))
        x = _chol_solve(
            L_L_Z, mR_c - _apply(pl["22"], A["22"], pr["22"], z).reshape(m, 1)
        )
        return np.stack([y3, x.reshape(r, n, R), z], axis=1)

    (L_L_Z, mL_eq, Lz_inv_Lx_scaled, T_op, TY, YT, d_qr, y_qr) = fac
    mR_t = rhs[:, 3].reshape(m, 1)
    Lz_inv_Rc = _chol_solve(L_L_Z, mR_c)
    u = mR_p - mL_eq @ (Lz_inv_Rc - Lz_inv_Lx_scaled @ mR_d)
    v = mR_t - T_op @ (Lz_inv_Rc - Lz_inv_Lx_scaled @ mR_d)
    rhs_y = u - YT @ _qr_apply(d_qr, v)
    y = _qr_apply(y_qr, rhs_y)
    t = _qr_apply(d_qr, v - TY @ y)
    y3 = y.reshape(r, n, R)
    t3 = t.reshape(r, n, R)
    z3 = (
        inv_I * (rhs[:, 1] - _apply_T(pl["01"], A["01"], pr["01"], y3)) - t3
    )
    x = _chol_solve(
        L_L_Z, mR_c - _apply(pl["22"], A["22"], pr["22"], z3).reshape(m, 1)
    )
    return np.stack([y3, x.reshape(r, n, R), z3, t3], axis=1)


def _hi_tree(t):
    if isinstance(t, dict):
        return {k: v.astype(np.float64) for k, v in t.items()}
    return [v.astype(np.float64) for v in t]


def _solve_local(pl, A, pr, bl, b, br, prev, ineq: bool):
    """Local KKT solve with never-regress guard; mirrors
    fused.py::_solve_local including the f32 mixed-precision modes."""
    mode = config.mixed_local() if prev.dtype == np.float32 else "off"
    if mode != "off":
        pl_h, A_h, pr_h = _hi_tree(pl), _hi_tree(A), _hi_tree(pr)
        prev_h = prev.astype(np.float64)
        rhs_h = _project_rhs(_hi_tree(bl), _hi_tree(b), _hi_tree(br), ineq)
        inv_I_h = 1.0 / _den_clamp(_es(
            "lsr,smnS,LSR->lmL", pl_h["12"], A_h["12"], pr_h["12"]
        ))
        inv_I = inv_I_h.astype(prev.dtype)
        rhs = rhs_h.astype(prev.dtype)
    else:
        pl_h, A_h, pr_h = pl, A, pr
        prev_h = prev
        rhs_h = _project_rhs(bl, b, br, ineq)
        inv_I_h = 1.0 / _den_clamp(_es(
            "lsr,smnS,LSR->lmL", pl["12"], A["12"], pr["12"]
        ))
        inv_I = inv_I_h
        rhs = rhs_h
    norm_rhs = max(float(np.linalg.norm(rhs_h)), 1e-10)
    res_old = float(np.linalg.norm(
        _local_product(pl_h, A_h, pr_h, prev_h, ineq) - rhs_h
    )) / norm_rhs
    try:
        if mode == "f64":
            fac = _dense_factor(pl_h, A_h, pr_h, inv_I_h, ineq)
            cand = _dense_apply(
                fac, pl_h, A_h, pr_h, inv_I_h, rhs_h, ineq
            ).astype(prev.dtype)
        else:
            fac = _dense_factor(pl, A, pr, inv_I, ineq)
            cand = _dense_apply(fac, pl, A, pr, inv_I, rhs, ineq)
        if mode == "refine":
            for _ in range(2):
                r_h = rhs_h - _local_product(
                    pl_h, A_h, pr_h, cand.astype(np.float64), ineq
                )
                d = _dense_apply(
                    fac, pl, A, pr, inv_I, r_h.astype(prev.dtype), ineq
                )
                cand = cand + d
    except (FloatingPointError, np.linalg.LinAlgError):
        dx = 0.0
        return prev, rhs, res_old, res_old, dx
    res_new = float(np.linalg.norm(
        _local_product(pl_h, A_h, pr_h,
                       cand.astype(rhs_h.dtype), ineq) - rhs_h
    )) / norm_rhs
    sane = np.linalg.norm(cand) < 1e8 * (1.0 + np.linalg.norm(prev))
    good = np.isfinite(res_new) and (res_new <= res_old) and sane
    sol = cand if good else prev
    res_min = res_new if good else res_old
    dx = float(np.linalg.norm(sol - prev)) / max(
        float(np.linalg.norm(sol)), TINY
    )
    return sol, rhs, res_old, res_min, dx


_STEPS = _fa.make_sweep_steps(
    _ALG, _es, np, lambda *a: _solve_local(*a), _svd,
    lambda a: np.linalg.qr(a, mode="reduced"), np.ascontiguousarray,
    lambda ref: 0.0,
)
_trunc_svd = _STEPS.trunc_svd
_bck_split_step = _STEPS.bck_split_step
_bck_write_step = _STEPS.bck_write_step
_fwd_split_step = _STEPS.fwd_split_step
_fwd_write_step = _STEPS.fwd_write_step


# ---------------------------------------------------------------------------
# Whole-sweep driver (twin of fused.py::_sweep_program)
# ---------------------------------------------------------------------------

def host_sweep(A, b, x_cores, z_cores, XAX, Xb, ZAX, Zb,
               ineq: bool, caps, kick: int, solve: bool, direction: int):
    """One full sweep in numpy; mutates the passed lists in place and
    returns (res, dx) maxima."""
    d = len(x_cores)
    bs = _nrows(ineq)
    res_vals = []
    dx_vals = []
    if direction > 0:  # backward
        for k in range(d - 1, -1, -1):
            A_k = {key: A[key][k] for key in _keys(ineq)}
            b_k = [b[i][k] for i in range(bs)]
            if k > 0:
                (u_core, x_prev, z_core, z_prev, pl_new, bl_new, zl_new,
                 zbl_new, r_old, r_min, dx) = _bck_split_step(
                    XAX[k], A_k, XAX[k + 1], Xb[k], b_k, Xb[k + 1],
                    ZAX[k], ZAX[k + 1], Zb[k], Zb[k + 1],
                    x_cores[k], x_cores[k - 1], z_cores[k], z_cores[k - 1],
                    ineq, caps[k - 1], kick, solve,
                )
                x_cores[k] = u_core
                x_cores[k - 1] = x_prev
                z_cores[k] = z_core
                z_cores[k - 1] = z_prev
                XAX[k] = pl_new
                Xb[k] = bl_new
                ZAX[k] = zl_new
                Zb[k] = zbl_new
            else:
                x_new, z_new, r_old, r_min, dx = _bck_write_step(
                    XAX[k], A_k, XAX[k + 1], Xb[k], b_k, Xb[k + 1],
                    ZAX[k], ZAX[k + 1], Zb[k], Zb[k + 1],
                    x_cores[k], z_cores[k], ineq, solve,
                )
                x_cores[k] = x_new
                z_cores[k] = z_new
            res_vals.append(r_old)
            dx_vals.append(dx)
    else:  # forward
        for k in range(d):
            A_k = {key: A[key][k] for key in _keys(ineq)}
            b_k = [b[i][k] for i in range(bs)]
            if k < d - 1:
                (u_core, x_next, z_core, z_next, pr_new, br_new, zr_new,
                 zbr_new, r_old, r_min, dx) = _fwd_split_step(
                    XAX[k], A_k, XAX[k + 1], Xb[k], b_k, Xb[k + 1],
                    ZAX[k], ZAX[k + 1], Zb[k], Zb[k + 1],
                    x_cores[k], x_cores[k + 1], z_cores[k], z_cores[k + 1],
                    ineq, caps[k], kick, solve,
                )
                x_cores[k] = u_core
                x_cores[k + 1] = x_next
                z_cores[k] = z_core
                z_cores[k + 1] = z_next
                XAX[k + 1] = pr_new
                Xb[k + 1] = br_new
                ZAX[k + 1] = zr_new
                Zb[k + 1] = zbr_new
            else:
                x_new, z_new, r_old, r_min, dx = _fwd_write_step(
                    XAX[k], A_k, XAX[k + 1], Xb[k], b_k, Xb[k + 1],
                    ZAX[k], ZAX[k + 1], Zb[k], Zb[k + 1],
                    x_cores[k], z_cores[k], ineq, solve,
                )
                x_cores[k] = x_new
                z_cores[k] = z_new
            res_vals.append(r_old)
            dx_vals.append(dx)
    return float(np.max(res_vals)), float(np.max(dx_vals))


# ---------------------------------------------------------------------------
# Global residual (twin of fused.py::_fused_residual_norm, f64 accumulation)
# ---------------------------------------------------------------------------

_ROW_TERMS_EQ = _fa.ROW_TERMS_EQ
_ROW_TERMS_INEQ = _fa.ROW_TERMS_INEQ


def _train_dot(tr1, tr2):
    rho = np.ones((1, 1), dtype=np.float64)
    for c1, c2 in zip(tr1, tr2):
        rho = _es(
            "ab,amA,bmB->AB", rho, c1.astype(np.float64),
            c2.astype(np.float64),
        )
    return float(rho[0, 0])


def host_residual_norm(A, b, x_cores, ineq: bool) -> float:
    block_pos = int(np.argmax([c.ndim for c in x_cores]))
    bs = _nrows(ineq)
    x_shared = [c for i, c in enumerate(x_cores) if i != block_pos]
    x_cols = []
    for j in range(bs):
        cores = list(x_shared)
        cores.insert(block_pos, x_cores[block_pos][:, j])
        x_cols.append(cores)
    terms_tbl = _ROW_TERMS_INEQ if ineq else _ROW_TERMS_EQ
    res_sq = 0.0
    for i, terms in enumerate(terms_tbl):
        bb = _train_dot(b[i], b[i])
        acc = bb
        vts = [
            _virtual_term_cores(A, x_cols, key, col, tr)
            for (key, col, tr) in terms
        ]
        for t in vts:
            acc = acc - 2.0 * _train_dot(b[i], t)
        for p, t1 in enumerate(vts):
            acc = acc + _train_dot(t1, t1)
            for t2 in vts[p + 1:]:
                acc = acc + 2.0 * _train_dot(t1, t2)
        res_sq = res_sq + acc
    return float(np.sqrt(max(res_sq, 0.0)))
