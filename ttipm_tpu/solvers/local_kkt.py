"""Per-core Newton/KKT local solvers injected into the block-AMEn sweeps.

Block layout of the projected KKT system at one core (variables
[dY, dX, dZ] and, with inequalities, dT; rows [primal feas, dual feas,
centrality, ineq complementarity]):

    [ Ky   -L    0    0  ] [dY]   [R_p]
    [-L^T   0    I    I  ] [dX] = [R_d]      (I-block only couples dZ/dT)
    [ 0    Lz    Lx   0  ] [dZ]   [R_c]
    [ 0    D_T   0    D  ] [dT]   [R_t]

The dense path eliminates dZ through the diagonal of the projected
identity block (``inv_I``), Cholesky-factors the SPD ``Lz`` block, and
solves the Y-Schur complement; the reconstruction recovers dZ and dX.
Parity: /root/reference/src/tt_ipm.py:183-401 (the reference implements
this as Cython BLAS pipelines + PETSc LGMRES; here each branch is a chain
of fused einsums/factorizations on device, with a JAX GMRES fallback on
the reduced 2- or 3-block operator replacing PETSc).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jla
from ttipm_tpu.solvers.lgmres import lgmres
import numpy as np

from ttipm_tpu import config
from ttipm_tpu.solvers.fused import _tikhonov
from ttipm_tpu.ops.linalg import qr_apply, qr_factor, qr_solve

__all__ = ["ipm_local_solver", "ipm_local_solver_ineq"]


def _proj_block(XAX_k, A_k, XAX_k1, m):
    """Dense m x m matrix of one projected block."""
    return jnp.einsum("lsr,smnS,LSR->lmLrnR", XAX_k, A_k, XAX_k1).reshape(m, m)


def _apply_block(XAX_k, A_k, XAX_k1, v):
    return jnp.einsum("lsr,smnS,LSR,rnR->lmL", XAX_k, A_k, XAX_k1, v)


def _apply_block_T(XAX_k, A_k, XAX_k1, v):
    return jnp.einsum("lsr,smnS,LSR,lmL->rnR", XAX_k, A_k, XAX_k1, v)


def _chol_solve(L, b):
    y = jla.solve_triangular(L, b, lower=True)
    return jla.solve_triangular(L.T, y, lower=False)


def _finite(x) -> bool:
    return bool(jnp.all(jnp.isfinite(x)))


# --- fused jitted kernels (cached per operand-shape signature) -------------

@jax.jit
def _dense_eq_kernel(p00l, a00, p00r, p01l, a01, p01r, p21l, a21, p21r,
                     p22l, a22, p22r, inv_I, rhs):
    """Whole equality Schur chain as one compiled kernel."""
    r, _, n, R = rhs.shape
    m = r * n * R
    mR_p = rhs[:, 0].reshape(m, 1)
    mR_d = rhs[:, 1].reshape(m, 1)
    mR_c = rhs[:, 2].reshape(m, 1)
    L_X_I_inv = jnp.einsum("lsr,smnS,LSR->lmLrnR", p22l, a22, p22r).reshape(m, m)
    L_X_I_inv = L_X_I_inv * inv_I.reshape(1, -1)
    mL_eq = jnp.einsum("lsr,smnS,LSR->lmLrnR", p01l, a01, p01r).reshape(m, m)
    L_L_Z = jnp.linalg.cholesky(
        jnp.einsum("lsr,smnS,LSR->lmLrnR", p21l, a21, p21r).reshape(m, m)
    )
    b = mR_p - mL_eq @ _chol_solve(L_L_Z, mR_c - L_X_I_inv @ mR_d)
    A = _chol_solve(L_L_Z, L_X_I_inv)
    A = mL_eq @ (A @ mL_eq.T)
    A = A + jnp.einsum("lsr,smnS,LSR->lmLrnR", p00l, a00, p00r).reshape(m, m)
    A = _tikhonov(A)
    y = qr_solve(A, b)
    y3 = y.reshape(r, n, R)
    z = inv_I * (
        rhs[:, 1] - jnp.einsum("lsr,smnS,LSR,lmL->rnR", p01l, a01, p01r, y3)
    )
    x = _chol_solve(
        L_L_Z,
        mR_c - jnp.einsum("lsr,smnS,LSR,rnR->lmL", p22l, a22, p22r, z).reshape(m, 1),
    )
    return jnp.stack([y3, x.reshape(r, n, R), z], axis=1)


@jax.jit
def _reduced_matvec_eq_kernel(p00l, a00, p00r, p01l, a01, p01r, p21l, a21,
                              p21r, p22l, a22, p22r, inv_I, vec):
    r, _, n = p00l.shape[0], 0, a00.shape[1]
    R = p00r.shape[0]
    yx = vec.reshape(2, r, n, R)
    dy, dx = yx[0], yx[1]
    out0 = jnp.einsum("lsr,smnS,LSR,rnR->lmL", p00l, a00, p00r, dy)
    out0 = out0 + jnp.einsum("lsr,smnS,LSR,rnR->lmL", p01l, a01, p01r, dx)
    dz = -inv_I * jnp.einsum("lsr,smnS,LSR,lmL->rnR", p01l, a01, p01r, dy)
    out1 = jnp.einsum("lsr,smnS,LSR,rnR->lmL", p21l, a21, p21r, dx)
    out1 = out1 + jnp.einsum("lsr,smnS,LSR,rnR->lmL", p22l, a22, p22r, dz)
    return jnp.stack([out0, out1]).reshape(-1)


@jax.jit
def _dense_ineq_kernel(p00l, a00, p00r, p01l, a01, p01r, p21l, a21, p21r,
                       p22l, a22, p22r, p31l, a31, p31r, p33l, a33, p33r,
                       inv_I, rhs):
    """Whole inequality two-level Schur chain as one compiled kernel."""
    r, _, n, R = rhs.shape
    m = r * n * R
    L_L_Z = jnp.linalg.cholesky(
        jnp.einsum("lsr,smnS,LSR->lmLrnR", p21l, a21, p21r).reshape(m, m)
    )
    mR_p = rhs[:, 0].reshape(m, 1)
    mR_d = rhs[:, 1].reshape(m, 1)
    mR_c = rhs[:, 2].reshape(m, 1)
    mR_t = rhs[:, 3].reshape(m, 1)
    Lz_inv_Rc = _chol_solve(L_L_Z, mR_c)
    Lz_inv_Lx = _chol_solve(
        L_L_Z, jnp.einsum("lsr,smnS,LSR->lmLrnR", p22l, a22, p22r).reshape(m, m)
    )
    mL_eq = jnp.einsum("lsr,smnS,LSR->lmLrnR", p01l, a01, p01r).reshape(m, m)
    T_op = jnp.einsum("lsr,smnS,LSR->lmLrnR", p31l, a31, p31r).reshape(m, m)
    Lz_inv_Lx_scaled = Lz_inv_Lx * inv_I.reshape(1, -1)
    u = mR_p - mL_eq @ (Lz_inv_Rc - Lz_inv_Lx_scaled @ mR_d)
    v = mR_t - T_op @ (Lz_inv_Rc - Lz_inv_Lx_scaled @ mR_d)
    A = jnp.einsum("lsr,smnS,LSR->lmLrnR", p00l, a00, p00r).reshape(m, m)
    A = A + mL_eq @ (Lz_inv_Lx_scaled @ mL_eq.T)
    D = jnp.einsum("lsr,smnS,LSR->lmLrnR", p33l, a33, p33r).reshape(m, m)
    D = D + T_op @ Lz_inv_Lx
    D = _tikhonov(D)
    TY = (T_op @ Lz_inv_Lx_scaled) @ mL_eq.T
    YT = mL_eq @ Lz_inv_Lx
    d_qr = qr_factor(D)
    rhs_y = u - YT @ qr_apply(d_qr, v)
    lhs_y = A - YT @ qr_apply(d_qr, TY)
    y = qr_solve(lhs_y, rhs_y)
    t = qr_apply(d_qr, v - TY @ y)
    y3 = y.reshape(r, n, R)
    t3 = t.reshape(r, n, R)
    z3 = (
        inv_I * (rhs[:, 1] - jnp.einsum("lsr,smnS,LSR,lmL->rnR", p01l, a01, p01r, y3))
        - t3
    )
    x = _chol_solve(
        L_L_Z,
        mR_c - jnp.einsum("lsr,smnS,LSR,rnR->lmL", p22l, a22, p22r, z3).reshape(m, 1),
    )
    return jnp.stack([y3, x.reshape(r, n, R), z3, t3], axis=1)


@jax.jit
def _reduced_matvec_ineq_kernel(p00l, a00, p00r, p01l, a01, p01r, p21l, a21,
                                p21r, p22l, a22, p22r, p31l, a31, p31r,
                                p33l, a33, p33r, inv_I, vec):
    r = p00l.shape[0]
    n = a00.shape[1]
    R = p00r.shape[0]
    yxt = vec.reshape(3, r, n, R)
    dy, dx, dt = yxt[0], yxt[1], yxt[2]
    out0 = jnp.einsum("lsr,smnS,LSR,rnR->lmL", p00l, a00, p00r, dy)
    out0 = out0 + jnp.einsum("lsr,smnS,LSR,rnR->lmL", p01l, a01, p01r, dx)
    dz = -inv_I * jnp.einsum("lsr,smnS,LSR,lmL->rnR", p01l, a01, p01r, dy) - dt
    out1 = jnp.einsum("lsr,smnS,LSR,rnR->lmL", p21l, a21, p21r, dx)
    out1 = out1 + jnp.einsum("lsr,smnS,LSR,rnR->lmL", p22l, a22, p22r, dz)
    out2 = jnp.einsum("lsr,smnS,LSR,rnR->lmL", p31l, a31, p31r, dx)
    out2 = out2 + jnp.einsum("lsr,smnS,LSR,rnR->lmL", p33l, a33, p33r, dt)
    return jnp.stack([out0, out1, out2]).reshape(-1)


def _eq_operands(XAX_k, block_A_k, XAX_k1):
    return (
        XAX_k[0, 0], block_A_k[0, 0], XAX_k1[0, 0],
        XAX_k[0, 1], block_A_k[0, 1], XAX_k1[0, 1],
        XAX_k[2, 1], block_A_k[2, 1], XAX_k1[2, 1],
        XAX_k[2, 2], block_A_k[2, 2], XAX_k1[2, 2],
    )


def _ineq_operands(XAX_k, block_A_k, XAX_k1):
    return _eq_operands(XAX_k, block_A_k, XAX_k1) + (
        XAX_k[3, 1], block_A_k[3, 1], XAX_k1[3, 1],
        XAX_k[3, 3], block_A_k[3, 3], XAX_k1[3, 3],
    )


def _local_rhs(Xb_k, block_b_k, Xb_k1, x_shape, rows):
    zero = jnp.zeros((x_shape[0], x_shape[2], x_shape[3]), dtype=config.dtype())
    cols = [
        jnp.einsum("br,bmB,BR->rmR", Xb_k[i], block_b_k[i], Xb_k1[i])
        if i in block_b_k
        else zero
        for i in rows
    ]
    return jnp.stack(cols, axis=1)


def ipm_local_solver(
    XAX_k, block_A_k, XAX_k1, Xb_k, block_b_k, Xb_k1,
    previous_solution, size_limit, dense_solve=True, rtol=1e-5,
):
    """Equality-only local KKT solve (src/tt_ipm.py:183-282)."""
    x_shape = previous_solution.shape
    m = x_shape[0] * x_shape[2] * x_shape[3]
    rhs = _local_rhs(Xb_k, block_b_k, Xb_k1, x_shape, (0, 1, 2))
    norm_rhs = max(float(jnp.linalg.norm(rhs)), 1e-10)
    inv_I = 1.0 / jnp.einsum(
        "lsr,smnS,LSR->lmL", XAX_k[1, 2], block_A_k[1, 2], XAX_k1[1, 2]
    )
    block_res_old = float(
        jnp.linalg.norm(
            block_A_k.block_local_product(XAX_k, XAX_k1, previous_solution) - rhs
        )
    ) / norm_rhs

    # Dense gate: the reference limits dense Schur to sqrt(r0*r1) <= 3d
    # (conservative for its scipy spsolve); our fused compiled chain
    # stays faster than unpreconditioned GMRES well beyond that, so the
    # gate is floored (m = r0*4*r1 <= ~2300 still factors in seconds).
    dense = (
        (np.sqrt(x_shape[0] * x_shape[3]) <= max(size_limit, 24))
        and dense_solve
        and (block_res_old >= rtol)
    )
    direct_solve_failure = not dense
    solution_now = None

    if dense:
        # Schur elimination: dZ out via inv_I, chol(Lz), then the Y-Schur
        # system (src/tt_ipm.py:196-223) — one fused compiled kernel.
        cand = _dense_eq_kernel(*_eq_operands(XAX_k, block_A_k, XAX_k1),
                                inv_I, rhs)
        if _finite(cand):
            solution_now = cand
        else:
            direct_solve_failure = True

    if solution_now is None:
        solution_now = _iterative_eq(
            XAX_k, block_A_k, XAX_k1, rhs, inv_I, previous_solution, x_shape, m, rtol
        )

    block_res_new = float(
        jnp.linalg.norm(
            block_A_k.block_local_product(XAX_k, XAX_k1, solution_now) - rhs
        )
    ) / norm_rhs
    if block_res_old < block_res_new:
        solution_now = previous_solution

    return (solution_now, block_res_old, min(block_res_old, block_res_new),
            rhs, norm_rhs, direct_solve_failure)


def _iterative_eq(XAX_k, block_A_k, XAX_k1, rhs, inv_I, previous_solution,
                  x_shape, m, rtol):
    """GMRES on the dZ-eliminated 2-block operator (replaces the Cython
    ``MatVecWrapper`` + PETSc LGMRES of cy_src/lgmres_cy.pyx:203-377)."""
    shape3 = (x_shape[0], x_shape[2], x_shape[3])
    operands = _eq_operands(XAX_k, block_A_k, XAX_k1)

    def reduced_matvec(vec):
        return _reduced_matvec_eq_kernel(*operands, inv_I, vec)

    local_rhs = jnp.stack(
        [
            rhs[:, 0],
            rhs[:, 2]
            - _apply_block(
                XAX_k[2, 2], block_A_k[2, 2], XAX_k1[2, 2], inv_I * rhs[:, 1]
            ),
        ]
    )
    rhs_vec = local_rhs.reshape(-1)
    prev_vec = jnp.stack([previous_solution[:, 0], previous_solution[:, 1]]).reshape(-1)
    prev_image = reduced_matvec(prev_vec)
    use_prev = float(jnp.linalg.norm(rhs_vec - prev_image)) < float(
        jnp.linalg.norm(rhs_vec)
    )
    target = rhs_vec - prev_image if use_prev else rhs_vec
    sol, _ = lgmres(
        reduced_matvec, target, rtol=rtol, restart=min(2 * m, 100), maxiter=5
    )
    if use_prev:
        sol = sol + prev_vec
    yx = sol.reshape(2, *shape3)
    dz = inv_I * (
        rhs[:, 1]
        - _apply_block_T(XAX_k[0, 1], block_A_k[0, 1], XAX_k1[0, 1], yx[0])
    )
    return jnp.stack([yx[0], yx[1], dz], axis=1)


def ipm_local_solver_ineq(
    XAX_k, block_A_k, XAX_k1, Xb_k, block_b_k, Xb_k1,
    previous_solution, size_limit, dense_solve=True, rtol=1e-5,
):
    """Inequality-path local KKT solve with the extra dT row
    (src/tt_ipm.py:284-401)."""
    x_shape = previous_solution.shape
    m = x_shape[0] * x_shape[2] * x_shape[3]
    rhs = _local_rhs(Xb_k, block_b_k, Xb_k1, x_shape, (0, 1, 2, 3))
    inv_I = 1.0 / jnp.einsum(
        "lsr,smnS,LSR->lmL", XAX_k[1, 2], block_A_k[1, 2], XAX_k1[1, 2]
    )
    norm_rhs = max(float(jnp.linalg.norm(rhs)), 1e-10)
    block_res_old = float(
        jnp.linalg.norm(
            block_A_k.block_local_product(XAX_k, XAX_k1, previous_solution) - rhs
        )
    ) / norm_rhs
    dense = (
        (np.sqrt(x_shape[0] * x_shape[3]) <= max(0.95 * size_limit, 24))
        and dense_solve
        and (block_res_old >= rtol)
    )
    direct_solve_failure = not dense
    solution_now = None

    if dense:
        # Two-level Schur: eliminate dZ (inv_I) and dX (chol Lz), then the
        # coupled (dY, dT) system via LU of D (src/tt_ipm.py:298-334) —
        # one fused compiled kernel.
        cand = _dense_ineq_kernel(*_ineq_operands(XAX_k, block_A_k, XAX_k1),
                                  inv_I, rhs)
        if _finite(cand):
            solution_now = cand
        else:
            direct_solve_failure = True

    if solution_now is None:
        solution_now = _iterative_ineq(
            XAX_k, block_A_k, XAX_k1, rhs, inv_I, previous_solution, x_shape, m, rtol
        )

    block_res_new = float(
        jnp.linalg.norm(
            block_A_k.block_local_product(XAX_k, XAX_k1, solution_now) - rhs
        )
    ) / norm_rhs
    if block_res_old < block_res_new:
        solution_now = previous_solution

    return (solution_now, block_res_old, min(block_res_old, block_res_new),
            rhs, norm_rhs, direct_solve_failure)


def _iterative_ineq(XAX_k, block_A_k, XAX_k1, rhs, inv_I, previous_solution,
                    x_shape, m, rtol):
    """GMRES on the dZ-eliminated 3-block (dY, dX, dT) operator (replaces
    ``IneqMatVecWrapper``, cy_src/lgmres_cy.pyx:379-510)."""
    shape3 = (x_shape[0], x_shape[2], x_shape[3])
    operands = _ineq_operands(XAX_k, block_A_k, XAX_k1)

    def reduced_matvec(vec):
        return _reduced_matvec_ineq_kernel(*operands, inv_I, vec)

    local_rhs = jnp.stack(
        [
            rhs[:, 0],
            rhs[:, 2]
            - _apply_block(
                XAX_k[2, 2], block_A_k[2, 2], XAX_k1[2, 2], inv_I * rhs[:, 1]
            ),
            rhs[:, 3],
        ]
    )
    rhs_vec = local_rhs.reshape(-1)
    prev_vec = jnp.stack(
        [previous_solution[:, 0], previous_solution[:, 1], previous_solution[:, 3]]
    ).reshape(-1)
    prev_image = reduced_matvec(prev_vec)
    use_prev = float(jnp.linalg.norm(rhs_vec - prev_image)) < float(
        jnp.linalg.norm(rhs_vec)
    )
    target = rhs_vec - prev_image if use_prev else rhs_vec
    sol, _ = lgmres(
        reduced_matvec, target, rtol=rtol, restart=min(3 * m, 100), maxiter=5
    )
    if use_prev:
        sol = sol + prev_vec
    yxt = sol.reshape(3, *shape3)
    dz = (
        inv_I
        * (
            rhs[:, 1]
            - _apply_block_T(XAX_k[0, 1], block_A_k[0, 1], XAX_k1[0, 1], yxt[0])
        )
        - yxt[2]
    )
    return jnp.stack([yxt[0], yxt[1], dz, yxt[2]], axis=1)
