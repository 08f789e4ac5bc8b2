"""Fused fixed-rank TT eigensolvers for the IPM step-size search.

Fixed-rank re-architecture of solvers/eigen.py (reference parity:
/root/reference/src/tt_als.py:931-1499) following the same design as
solvers/fused.py: the eigenvector train runs at a static bond rank
(capped by the dimension product), operator trains are zero-padded to one
uniform rank, and each MALS window step — dense assembly, smallest
eigenpair, the shrink-on-negative step-size rule, the fixed-rank SVD
re-split and both interface updates — is ONE jitted program.

At the fixed eigen rank (<= 8) every 2-core window is at most
4*8*8 = 256-dimensional, so the window eigenproblem is solved by dense
``eigh`` outright — the regime where the reference itself prefers dense
``eigsh`` over LOBPCG (src/tt_als.py:956-996).  The generalized shrink
solve (smallest of (Delta, A)) runs under ``lax.cond`` only when the
shifted pencil goes indefinite.

The step size alpha stays ON DEVICE through a whole half sweep (the
ragged path synced it per window); the host reads it once per sweep for
the zero-step break.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ttipm_tpu.ops.jacobi import TINY, fast_split_svd, safe_eigh

from ttipm_tpu import config
from ttipm_tpu.ops.tt import TT, tt_normalise

__all__ = ["tt_max_generalised_eigen_fused", "tt_min_eig_fused"]


# ---------------------------------------------------------------------------
# In-kernel pieces
# ---------------------------------------------------------------------------

def _asm2(phi_l, A_k, A_k1, phi_r):
    t = jnp.einsum("lsr,smnk,kptS,LSR->lmpLrntR", phi_l, A_k, A_k1, phi_r)
    m = t.shape[0] * t.shape[1] * t.shape[2] * t.shape[3]
    return t.reshape(m, m)


def _asm1(phi_l, A_k, phi_r):
    t = jnp.einsum("lsr,smnS,LSR->lmLrnR", phi_l, A_k, phi_r)
    m = t.shape[0] * t.shape[1] * t.shape[2]
    return t.reshape(m, m)


def _smallest_eigpair(M):
    ev, U = safe_eigh(0.5 * (M + M.T))
    return ev[0], U[:, 0]


def _shrink_alpha(MA, MD, alpha, tol):
    """alpha <- min(alpha, 1/lambda_max(-Delta, A)) when the shifted pencil
    is indefinite (src/tt_als.py:988-994), via whitened dense eigh."""
    m = MA.shape[0]
    L = jnp.linalg.cholesky(
        0.5 * (MA + MA.T) + 1e-12 * jnp.eye(m, dtype=MA.dtype)
    )
    W = jax.scipy.linalg.solve_triangular(L, 0.5 * (MD + MD.T), lower=True)
    W = jax.scipy.linalg.solve_triangular(L, W.T, lower=True)
    evg, _ = safe_eigh(0.5 * (W + W.T))
    lam_max = -evg[0]
    ok = jnp.isfinite(lam_max) & (lam_max > 0)
    return jnp.where(
        ok,
        jnp.maximum(0.0, jnp.minimum(alpha, 1.0 / jnp.where(ok, lam_max, 1.0))),
        alpha * (1 - tol),
    )


def _pencil_solve(MA, MD, prev_vec, alpha, tol):
    """Smallest eigpair of MA/alpha + MD, shrink rule, previous-iterate
    residual in the updated pencil.  Returns (x, alpha_new, old_res,
    scale) where scale = ||M||_F of the window pencil — the floor below
    which a residual in this dtype is pure rounding noise (the penalty
    tolerance in the driver is floored at eps(dtype)*scale)."""
    M = MA / alpha + MD
    lam, x = _smallest_eigpair(M)
    # branch outputs cast to the operand dtype: under the f32 profile a
    # host-float alpha otherwise traces one branch f64 and the other f32
    alpha_new = jax.lax.cond(
        lam < 0,
        lambda _: _shrink_alpha(MA, MD, alpha, tol).astype(MA.dtype),
        lambda _: jnp.asarray(alpha, dtype=MA.dtype),
        None,
    )
    denom = jnp.where(alpha_new > 0, alpha_new, 1.0)
    Mp = (MA @ prev_vec) / denom + MD @ prev_vec
    lam_prev = jnp.vdot(prev_vec, Mp)
    old_res = jnp.linalg.norm(Mp - lam_prev * prev_vec)
    scale = jnp.linalg.norm(M)
    return x, alpha_new, old_res, scale


def _phi_bck(phi_next, c, a, c2):
    return jnp.einsum("LSR,lML,sMNS,rNR->lsr", phi_next, c, a, c2)


def _phi_fwd(phi_prev, c, a, c2):
    return jnp.einsum("lsr,lML,sMNS,rNR->LSR", phi_prev, c, a, c2)


def _split_bck(x, shape, r_out: int):
    """x: window vector; split keeping the right core orthonormal."""
    rl, n1, n2, rr = shape
    mat = x.reshape(rl * n1, n2 * rr).T
    u, s, vt = fast_split_svd(mat, full_matrices=False)
    sol2 = u[:, :r_out].T.reshape(r_out, n2, rr)
    sol1 = (s[:r_out, None] * vt[:r_out]).T.reshape(rl, n1, r_out)
    return sol1, sol2


def _split_fwd(x, shape, r_out: int):
    rl, n1, n2, rr = shape
    mat = x.reshape(rl * n1, n2 * rr)
    u, s, vt = fast_split_svd(mat, full_matrices=False)
    sol1 = u[:, :r_out].reshape(rl, n1, r_out)
    sol2 = (s[:r_out, None] * vt[:r_out]).reshape(r_out, n2, rr)
    return sol1, sol2


# ---------------------------------------------------------------------------
# Fused window steps (generalized step-size pencil)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("r_out", "bwd"))
def _gen_window_step(
    pAl, A_k, A_k1, pAr, pDl, D_k, D_k1, pDr, sol1, sol2, alpha, tol,
    r_out: int, bwd: bool,
):
    prev = jnp.einsum("rny,ytR->rntR", sol1, sol2)
    shape = prev.shape
    MA = _asm2(pAl, A_k, A_k1, pAr)
    MD = _asm2(pDl, D_k, D_k1, pDr)
    x, alpha_new, old_res, scale = _pencil_solve(
        MA, MD, prev.reshape(-1), alpha, tol
    )
    x = x / jnp.maximum(jnp.linalg.norm(x), TINY)
    if bwd:
        sol1_new, sol2_new = _split_bck(x, shape, r_out)
        pA_upd = _phi_bck(pAr, sol2_new, A_k1, sol2_new)
        pD_upd = _phi_bck(pDr, sol2_new, D_k1, sol2_new)
    else:
        sol1_new, sol2_new = _split_fwd(x, shape, r_out)
        pA_upd = _phi_fwd(pAl, sol1_new, A_k, sol1_new)
        pD_upd = _phi_fwd(pDl, sol1_new, D_k, sol1_new)
    return sol1_new, sol2_new, alpha_new, old_res, scale, pA_upd, pD_upd


@partial(jax.jit, static_argnames=("r_out", "bwd", "split"))
def _gen_last_step(
    pAl, A_k, pAr, pDl, D_k, pDr, neighbor, prev, alpha, tol,
    r_out: int, bwd: bool, split: bool,
):
    """Single-core refinement pass of the finishing sweep
    (src/tt_als.py:1056-1129), fused with the split + interface update."""
    shape = prev.shape
    MA = _asm1(pAl, A_k, pAr)
    MD = _asm1(pDl, D_k, pDr)
    x, alpha_new, old_res, _scale = _pencil_solve(
        MA, MD, prev.reshape(-1), alpha, tol
    )
    x = x / jnp.maximum(jnp.linalg.norm(x), TINY)
    if not split:
        return x.reshape(shape), neighbor, alpha_new, old_res, pAl, pDl
    rl, n, rr = shape
    if bwd:
        mat = x.reshape(rl, n * rr).T
        u, s, vt = fast_split_svd(mat, full_matrices=False)
        core = u[:, :r_out].T.reshape(r_out, n, rr)
        v = (s[:r_out, None] * vt[:r_out]).T  # (rl, r_out)
        nb_new = jnp.einsum("rdc,cR->rdR", neighbor, v)
        pA_upd = _phi_bck(pAr, core, A_k, core)
        pD_upd = _phi_bck(pDr, core, D_k, core)
    else:
        mat = x.reshape(rl * n, rr)
        u, s, vt = fast_split_svd(mat, full_matrices=False)
        core = u[:, :r_out].reshape(rl, n, r_out)
        v = s[:r_out, None] * vt[:r_out]  # (r_out, rr)
        nb_new = jnp.einsum("ij,jkl->ikl", v, neighbor)
        pA_upd = _phi_fwd(pAl, core, A_k, core)
        pD_upd = _phi_fwd(pDl, core, D_k, core)
    return core, nb_new, alpha_new, old_res, pA_upd, pD_upd


@partial(jax.jit, static_argnames=("r_out", "n_ops"))
def _orth_bck_step(x_km1, x_k, ops_k, phis_r, r_out: int, n_ops: int):
    """Sweep-0 orthogonalization step: SVD re-split at the fixed rank and
    update the interfaces of ``n_ops`` operators at once."""
    rl, n, rr = x_k.shape
    mat = x_k.reshape(rl, n * rr).T
    u, s, vt = fast_split_svd(mat, full_matrices=False)
    core = u[:, :r_out].T.reshape(r_out, n, rr)
    v = (s[:r_out, None] * vt[:r_out]).T
    x_km1_new = jnp.einsum("rdc,cR->rdR", x_km1, v)
    phi_upds = tuple(
        _phi_bck(phis_r[i], core, ops_k[i], core) for i in range(n_ops)
    )
    return core, x_km1_new, phi_upds


# ---------------------------------------------------------------------------
# Fused window steps (plain smallest eigenvector, for tt_min_eig)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("r_out", "bwd"))
def _min_window_step(pl, A_k, A_k1, pr, sol1, sol2, r_out: int, bwd: bool):
    prev = jnp.einsum("rny,ytR->rntR", sol1, sol2)
    shape = prev.shape
    M = _asm2(pl, A_k, A_k1, pr)
    lam, x = _smallest_eigpair(M)
    prev_vec = prev.reshape(-1)
    Mp = M @ prev_vec
    lam_prev = jnp.vdot(prev_vec, Mp)
    old_res = jnp.linalg.norm(lam_prev * prev_vec - Mp)
    x = x / jnp.maximum(jnp.linalg.norm(x), TINY)
    if bwd:
        sol1_new, sol2_new = _split_bck(x, shape, r_out)
        p_upd = _phi_bck(pr, sol2_new, A_k1, sol2_new)
    else:
        sol1_new, sol2_new = _split_fwd(x, shape, r_out)
        p_upd = _phi_fwd(pl, sol1_new, A_k, sol1_new)
    return sol1_new, sol2_new, old_res, p_upd


@partial(jax.jit, static_argnames=("r_out", "bwd", "split"))
def _min_last_step(pl, A_k, pr, neighbor, prev, r_out: int, bwd: bool,
                   split: bool):
    shape = prev.shape
    M = _asm1(pl, A_k, pr)
    lam, x = _smallest_eigpair(M)
    x = x / jnp.maximum(jnp.linalg.norm(x), TINY)
    if not split:
        return x.reshape(shape), neighbor, pl
    rl, n, rr = shape
    if bwd:
        mat = x.reshape(rl, n * rr).T
        u, s, vt = fast_split_svd(mat, full_matrices=False)
        core = u[:, :r_out].T.reshape(r_out, n, rr)
        v = (s[:r_out, None] * vt[:r_out]).T
        nb_new = jnp.einsum("rdc,cR->rdR", neighbor, v)
        p_upd = _phi_bck(pr, core, A_k, core)
    else:
        mat = x.reshape(rl * n, rr)
        u, s, vt = fast_split_svd(mat, full_matrices=False)
        core = u[:, :r_out].reshape(rl, n, r_out)
        v = s[:r_out, None] * vt[:r_out]
        nb_new = jnp.einsum("ij,jkl->ikl", v, neighbor)
        p_upd = _phi_fwd(pl, core, A_k, core)
    return core, nb_new, p_upd


# ---------------------------------------------------------------------------
# Whole-eigen device program: the ENTIRE eigensolve — sweep-0
# orthogonalization, the first forward solving half sweep, a
# lax.while_loop over (backward, forward) half-sweep pairs with alpha,
# residuals, zero-step and stall termination ALL on device, and a final
# backward refinement sweep — as ONE jitted program (the _solve_program
# collapse of solvers/fused.py:713-780 applied to the step-size search).
#
# Motivation (BASELINE.md round 2): the per-window host loop costs ~160
# dispatches x 28 ms tunnel latency per IPM iteration — the dominant term
# of the 3044 s on-chip maxcut d3 solve.  This program leaves ONE dispatch
# per eigensolve and zero host float() syncs.
#
# Deviations from the host loop (both bounded): termination is checked at
# sweep-pair granularity (at most one extra half sweep), and the finishing
# refinement always runs backward (the host picks the direction opposite
# the half sweep that converged; the refinement is direction-symmetric).
# On zero-step (alpha <= 0 / nonfinite) the forward half and the finish
# results are discarded via where-selects, matching the host's break.
# ---------------------------------------------------------------------------


def _stalled_dev(prev_step, step, prev_res, res, tol):
    """Device form of solvers/eigen.py::_eigen_step_stalled."""
    scale = jnp.maximum(jnp.maximum(jnp.abs(step), jnp.abs(prev_step)), 1.0)
    res_stall = (
        jnp.isfinite(prev_res) & jnp.isfinite(res)
        & (res <= 50 * tol) & (res >= 0.8 * prev_res)
    )
    step_stall = jnp.abs(step - prev_step) <= jnp.maximum(
        10 * tol, 1e-12
    ) * scale
    return step_stall & res_stall


def _res_stalled_dev(prev_res, res, tol):
    """Device form of solvers/eigen.py::_eigen_residual_stalled."""
    return (
        jnp.isfinite(prev_res) & jnp.isfinite(res)
        & (res <= 50 * tol) & (res >= 0.8 * prev_res)
    )


def _gen_orth_sweep(A_p, D_p, st, caps):
    xs, XAX, XDX = list(st[0]), list(st[1]), list(st[2])
    d = len(xs)
    for k in range(d - 1, 0, -1):
        core, x_prev, (pA, pD) = _orth_bck_step(
            xs[k - 1], xs[k], (A_p[k], D_p[k]), (XAX[k + 1], XDX[k + 1]),
            r_out=caps[k - 1], n_ops=2,
        )
        xs[k] = core
        xs[k - 1] = x_prev
        XAX[k] = pA
        XDX[k] = pD
    return tuple(xs), tuple(XAX), tuple(XDX)


def _gen_half_sweep(A_p, D_p, st, alpha, tol, caps, bwd: bool):
    xs, XAX, XDX = list(st[0]), list(st[1]), list(st[2])
    d = len(xs)
    res_vals = []
    scale_vals = []
    if bwd:
        for k in range(d - 1, 0, -1):
            xs[k - 1], xs[k], alpha, res, scl, pA, pD = _gen_window_step(
                XAX[k - 1], A_p[k - 1], A_p[k], XAX[k + 1],
                XDX[k - 1], D_p[k - 1], D_p[k], XDX[k + 1],
                xs[k - 1], xs[k], alpha, tol, r_out=caps[k - 1], bwd=True,
            )
            XAX[k] = pA
            XDX[k] = pD
            res_vals.append(res)
            scale_vals.append(scl)
    else:
        for k in range(d - 1):
            xs[k], xs[k + 1], alpha, res, scl, pA, pD = _gen_window_step(
                XAX[k], A_p[k], A_p[k + 1], XAX[k + 2],
                XDX[k], D_p[k], D_p[k + 1], XDX[k + 2],
                xs[k], xs[k + 1], alpha, tol, r_out=caps[k], bwd=False,
            )
            XAX[k + 1] = pA
            XDX[k + 1] = pD
            res_vals.append(res)
            scale_vals.append(scl)
    return ((tuple(xs), tuple(XAX), tuple(XDX)), alpha,
            jnp.max(jnp.stack(res_vals)), jnp.max(jnp.stack(scale_vals)))


def _gen_finish_sweep(A_p, D_p, st, alpha, tol, caps):
    """Backward single-core refinement (host finish(-1))."""
    xs, XAX, XDX = list(st[0]), list(st[1]), list(st[2])
    d = len(xs)
    for k in range(d - 1, -1, -1):
        split = k > 0
        neighbor = xs[k - 1] if split else xs[k]
        r_out = caps[k - 1] if split else 1
        core, nb_new, alpha, _, pA, pD = _gen_last_step(
            XAX[k], A_p[k], XAX[k + 1], XDX[k], D_p[k], XDX[k + 1],
            neighbor, xs[k], alpha, tol, r_out=r_out, bwd=True, split=split,
        )
        xs[k] = core
        if split:
            xs[k - 1] = nb_new
            XAX[k] = pA
            XDX[k] = pD
    return (tuple(xs), tuple(XAX), tuple(XDX)), alpha


@partial(jax.jit, static_argnames=("caps", "max_pairs"))
def _gen_eigen_program(A_p, D_p, x_cores, alpha0, tol, caps: tuple,
                       max_pairs: int):
    dt = A_p[0].dtype
    d = len(x_cores)
    ones3 = jnp.ones((1, 1, 1), dtype=dt)
    # interior placeholders are overwritten by the orth sweep before any
    # read (trace-time list surgery, no shape constraint)
    XAX = tuple([ones3] * (d + 1))
    XDX = tuple([ones3] * (d + 1))
    alpha0 = jnp.asarray(alpha0, dtype=dt)
    tol = jnp.asarray(tol, dtype=dt)
    inf = jnp.asarray(jnp.inf, dtype=dt)

    st = _gen_orth_sweep(A_p, D_p, (x_cores, XAX, XDX), caps)
    st, alpha, res_f, scale0 = _gen_half_sweep(
        A_p, D_p, st, alpha0, tol, caps, bwd=False
    )

    def cond(carry):
        _, alpha_c, _, sweep_res, _, _, stalled, _, p = carry
        alpha_ok = jnp.isfinite(alpha_c) & (alpha_c > 0)
        return (
            (p < max_pairs) & alpha_ok & (sweep_res >= tol) & ~stalled
        )

    def body(carry):
        st_c, alpha_c, res_f_prev, _, prev_step, prev_res, _, scl, p = carry
        st1, alpha1, res_b, scl_b = _gen_half_sweep(
            A_p, D_p, st_c, alpha_c, tol, caps, bwd=True
        )
        ok1 = jnp.isfinite(alpha1) & (alpha1 > 0)
        # host semantics: skip the forward half on zero-step or on
        # convergence after the backward half (max over BOTH halves'
        # residuals, the forward ones from the previous sweep)
        run_fwd = ok1 & (jnp.maximum(res_b, res_f_prev) >= tol)
        st2, alpha2, res_f_c, scl_f = jax.lax.cond(
            run_fwd,
            lambda args: _gen_half_sweep(
                A_p, D_p, args[0], args[1], tol, caps, bwd=False
            ),
            lambda args: (args[0], args[1], res_b, scl_b),
            (st1, alpha1),
        )
        sweep_res = jnp.maximum(res_b, res_f_c)
        stalled = (p >= 1) & _stalled_dev(
            prev_step, alpha2, prev_res, sweep_res, tol
        )
        scl = jnp.maximum(scl, jnp.maximum(scl_b, scl_f))
        return (st2, alpha2, res_f_c, sweep_res, alpha2, sweep_res,
                stalled, scl, p + 1)

    carry0 = (st, alpha, res_f, inf, alpha, inf,
              jnp.zeros((), dtype=bool), scale0,
              jnp.zeros((), dtype=jnp.int32))
    st, alpha, _, sweep_res, _, _, _, scale, _ = jax.lax.while_loop(
        cond, body, carry0
    )

    st_f, alpha_f = _gen_finish_sweep(A_p, D_p, st, alpha, tol, caps)
    alpha_ok = jnp.isfinite(alpha) & (alpha > 0)
    st = jax.tree_util.tree_map(
        lambda a, b: jnp.where(alpha_ok, a, b), st_f, st
    )
    alpha = jnp.where(alpha_ok, alpha_f, alpha)
    return st[0], alpha, sweep_res, scale


def _min_orth_sweep(A_p, st, caps):
    xs, XAX = list(st[0]), list(st[1])
    d = len(xs)
    for k in range(d - 1, 0, -1):
        core, x_prev, (p_upd,) = _orth_bck_step(
            xs[k - 1], xs[k], (A_p[k],), (XAX[k + 1],),
            r_out=caps[k - 1], n_ops=1,
        )
        xs[k] = core
        xs[k - 1] = x_prev
        XAX[k] = p_upd
    return tuple(xs), tuple(XAX)


def _min_half_sweep(A_p, st, caps, bwd: bool):
    xs, XAX = list(st[0]), list(st[1])
    d = len(xs)
    res_vals = []
    if bwd:
        for k in range(d - 1, 0, -1):
            xs[k - 1], xs[k], res, p_upd = _min_window_step(
                XAX[k - 1], A_p[k - 1], A_p[k], XAX[k + 1],
                xs[k - 1], xs[k], r_out=caps[k - 1], bwd=True,
            )
            XAX[k] = p_upd
            res_vals.append(res)
    else:
        for k in range(d - 1):
            xs[k], xs[k + 1], res, p_upd = _min_window_step(
                XAX[k], A_p[k], A_p[k + 1], XAX[k + 2],
                xs[k], xs[k + 1], r_out=caps[k], bwd=False,
            )
            XAX[k + 1] = p_upd
            res_vals.append(res)
    return (tuple(xs), tuple(XAX)), jnp.max(jnp.stack(res_vals))


def _min_finish_sweep(A_p, st, caps):
    xs, XAX = list(st[0]), list(st[1])
    d = len(xs)
    for k in range(d - 1, -1, -1):
        split = k > 0
        neighbor = xs[k - 1] if split else xs[k]
        r_out = caps[k - 1] if split else 1
        core, nb_new, p_upd = _min_last_step(
            XAX[k], A_p[k], XAX[k + 1], neighbor, xs[k],
            r_out=r_out, bwd=True, split=split,
        )
        xs[k] = core
        if split:
            xs[k - 1] = nb_new
            XAX[k] = p_upd
    return tuple(xs), tuple(XAX)


@partial(jax.jit, static_argnames=("caps", "max_pairs"))
def _min_eig_program(A_p, x_cores, tol, caps: tuple, max_pairs: int):
    dt = A_p[0].dtype
    d = len(x_cores)
    ones3 = jnp.ones((1, 1, 1), dtype=dt)
    XAX = tuple([ones3] * (d + 1))
    tol = jnp.asarray(tol, dtype=dt)
    inf = jnp.asarray(jnp.inf, dtype=dt)

    st = _min_orth_sweep(A_p, (x_cores, XAX), caps)
    st, res_f = _min_half_sweep(A_p, st, caps, bwd=False)

    def cond(carry):
        _, _, sweep_res, _, stalled, p = carry
        return (p < max_pairs) & (sweep_res >= tol) & ~stalled

    def body(carry):
        st_c, res_f_prev, _, prev_res, _, p = carry
        st1, res_b = _min_half_sweep(A_p, st_c, caps, bwd=True)
        run_fwd = jnp.maximum(res_b, res_f_prev) >= tol
        st2, res_f_c = jax.lax.cond(
            run_fwd,
            lambda s: _min_half_sweep(A_p, s, caps, bwd=False),
            lambda s: (s, res_b),
            st1,
        )
        sweep_res = jnp.maximum(res_b, res_f_c)
        stalled = (p >= 1) & _res_stalled_dev(prev_res, sweep_res, tol)
        return (st2, res_f_c, sweep_res, sweep_res, stalled, p + 1)

    carry0 = (st, res_f, inf, inf, jnp.zeros((), dtype=bool),
              jnp.zeros((), dtype=jnp.int32))
    st, _, sweep_res, _, _, _ = jax.lax.while_loop(cond, body, carry0)
    st = _min_finish_sweep(A_p, st, caps)
    return st[0], sweep_res


# ---------------------------------------------------------------------------
# Host-side prep (numpy only)
# ---------------------------------------------------------------------------

def _bucket4(r: int) -> int:
    return ((int(r) + 3) // 4) * 4


def _use_host_engine() -> bool:
    """numpy window steps on CPU (config.py::host_algebra rationale); the
    jitted window/whole-eigen programs remain the TPU engine."""
    return (config.offload_device() is None and config.host_algebra()
            and not config.fused_whole_solve())


def _finalize(cores):
    if _use_host_engine():
        return [np.asarray(c) for c in cores]
    return [jnp.asarray(c) for c in cores]


def _prep_operator(cores, d: int, ra: Optional[int] = None) -> List[jax.Array]:
    # config.eigen_dtype() decides the pencil precision.  Default f64:
    # the step-size pencil (largest alpha with A + alpha*Delta PSD)
    # determines a boundary crossing from near-zero eigenvalues, and
    # round 2's all-f32 eigen path broke IPM convergence (measured
    # 2026-08-19: maxcut d3 e2e failed within 2 iterations) — though
    # that measurement predates the Gram-eigh split fixes.  "native"
    # mode (f32 under the f32 profile) is what the whole-eigen device
    # program needs on TPU, where f64 lowers to Jacobi rotation loops
    # that explode the remote compile (19 min measured, BASELINE.md).
    cs = [np.asarray(c, dtype=config.eigen_dtype()) for c in cores]
    if d == 1:
        return _finalize([cs[0]])
    ra_min = _bucket4(max(c.shape[-1] for c in cs[:-1]))
    ra = ra_min if ra is None else max(int(ra), ra_min)
    out = []
    for k, c in enumerate(cs):
        rl = 1 if k == 0 else ra
        rr = 1 if k == d - 1 else ra
        pad = [(0, rl - c.shape[0])] + [(0, 0)] * (c.ndim - 2) + [
            (0, rr - c.shape[-1])
        ]
        out.append(np.pad(c, pad))
    return _finalize(out)


def _vec_caps(d: int, R: int, n: int) -> List[int]:
    return [min(R, n ** (k + 1), n ** (d - 1 - k)) for k in range(d - 1)]


def _prep_vec(x0, d: int, n: int, caps: List[int], rng) -> List[jax.Array]:
    """Eigenvector warm start at exact cap ranks (numpy retraction/pad)."""
    if x0 is not None:
        cores = [np.asarray(c, dtype=config.eigen_dtype()) for c in x0]
        # RL-orthogonalise then truncate/zero-pad to caps
        for i in range(d - 1, 0, -1):
            sh = cores[i].shape
            q, r = np.linalg.qr(cores[i].reshape(sh[0], -1).T)
            cores[i] = q.T.reshape(-1, *sh[1:])
            prev = cores[i - 1]
            cores[i - 1] = (prev.reshape(-1, sh[0]) @ r.T).reshape(
                *prev.shape[:-1], -1
            )
        for k in range(d - 1):
            sh = cores[k].shape
            u, s, vt = np.linalg.svd(cores[k].reshape(-1, sh[-1]),
                                     full_matrices=False)
            r = min(caps[k], len(s))
            u_k = u[:, :r]
            sv = s[:r, None] * vt[:r]
            nxt = cores[k + 1]
            folded = sv @ nxt.reshape(nxt.shape[0], -1)
            if r < caps[k]:
                u_k = np.pad(u_k, [(0, 0), (0, caps[k] - r)])
                folded = np.pad(folded, [(0, caps[k] - r), (0, 0)])
            cores[k] = u_k.reshape(*sh[:-1], caps[k])
            cores[k + 1] = folded.reshape(caps[k], *nxt.shape[1:])
        return _finalize(cores)
    cores = []
    for k in range(d):
        rl = 1 if k == 0 else caps[k - 1]
        rr = 1 if k == d - 1 else caps[k]
        cores.append(np.asarray(rng.randn(rl, n, rr),
                                dtype=config.eigen_dtype()))
    return _finalize(cores)


# ---------------------------------------------------------------------------
# Drivers
# ---------------------------------------------------------------------------

def _tt_max_generalised_eigen_fused_impl(
    A: TT, Delta: TT, x0: Optional[TT] = None, nswp: int = 10,
    tol: float = 1e-8, R: int = 8, verbose: bool = False,
):
    """Largest ``alpha`` with ``A + alpha*Delta ⪰ 0``; fused fixed-rank
    MALS (parity: src/tt_als.py:1132-1283 via solvers/eigen.py)."""
    from ttipm_tpu.solvers.eigen import _eigen_step_stalled

    rng = np.random
    d = len(A)
    n = A[0].shape[1]
    A_p = _prep_operator(A, d)
    D_p = _prep_operator(Delta, d)
    caps = _vec_caps(d, R, n)
    x_cores = _prep_vec(x0, d, n, caps, rng)

    if config.fused_whole_solve() and d >= 2:
        # Whole-eigen device program: ONE dispatch per eigensolve.
        edt = config.eigen_dtype()
        args = (tuple(A_p), tuple(D_p), tuple(x_cores),
                jnp.asarray(1.0, dtype=edt), jnp.asarray(tol, dtype=edt))
        if config.offload_device() is not None:
            args = config.offload_put(args)
        xs, alpha, res, scl = _gen_eigen_program(
            *args, caps=tuple(caps), max_pairs=max(nswp - 1, 1)
        )
        xs, alpha, res, scl = config.offload_fetch((xs, alpha, res, scl))
        step_size = float(alpha)
        if not np.isfinite(step_size) or step_size < 0:
            step_size = 0.0
        max_res = float(res)
        x_cores = tt_normalise(list(xs))
        # Unconverged-eigensolve penalty — see the host-loop comment
        # below.  The tolerance is additionally floored at
        # 4*eps(dtype)*||M||_F: a window residual at the pencil's own
        # rounding-noise floor means the sweeps converged to this dtype's
        # precision (alpha is as good as the dtype allows; the downstream
        # fraction-to-boundary margin absorbs the remaining error), and
        # penalising it crushes CORRECT f32 steps — measured 2026-08-20:
        # maxcut d4 f32-native took 15 iterations with the absolute floor
        # vs 7 in f64.
        # The achievable residual is floored by the COARSER of the iterate
        # representation dtype (config.dtype() — the pencil operands were
        # rounded to it) and the pencil compute dtype.  Flooring by the
        # compute dtype alone reintroduced round-2 root-cause #2: under
        # the f32 profile with f64 pencils the f64 floor (6.7e-15) let
        # tol=1e-8 penalise the ~5e-8 input-representation residual floor
        # and crushed correct steps 5x per iteration (measured: maxcut d3
        # f32 diverged to slackness 2.6 in 21 iterations).
        eps_dt = max(float(jnp.finfo(edt).eps),
                     float(jnp.finfo(config.dtype()).eps))
        tol = max(tol, 30.0 * eps_dt, 4.0 * eps_dt * float(scl))
        if max_res > tol and np.isfinite(max_res) and max_res > 0:
            step_size *= tol / max_res
        return step_size, x_cores

    use_host = _use_host_engine()
    if use_host:
        from ttipm_tpu.solvers import fused_eigen_host as _H

        win_step, last_step, orth_step = (
            _H.gen_window_step, _H.gen_last_step, _H.orth_bck_step
        )
        ones3 = np.ones((1, 1, 1), dtype=config.eigen_dtype())
        tol_dev = float(tol)
        alpha = 1.0
    else:
        win_step, last_step, orth_step = (
            _gen_window_step, _gen_last_step, _orth_bck_step
        )
        ones3 = jnp.ones((1, 1, 1), dtype=config.eigen_dtype())
        tol_dev = jnp.asarray(tol, dtype=config.eigen_dtype())
        alpha = jnp.asarray(1.0, dtype=config.eigen_dtype())
    XAX = [ones3] + [None] * (d - 1) + [ones3]
    XDX = [ones3] + [None] * (d - 1) + [ones3]
    if config.offload_device() is not None:
        (A_p, D_p, x_cores, XAX, XDX, tol_dev, alpha) = config.offload_put(
            (A_p, D_p, x_cores, XAX, XDX, tol_dev, alpha)
        )
        A_p, D_p, x_cores = list(A_p), list(D_p), list(x_cores)
        XAX, XDX = list(XAX), list(XDX)
    local_res = np.inf * np.ones((2, max(d - 1, 1)))
    max_scale = 0.0
    trunc_tol = tol / np.sqrt(d)
    prev_sweep_step = None
    prev_sweep_res = np.inf

    def finish(direction: int):
        nonlocal alpha
        ks = range(d) if direction > 0 else range(d - 1, -1, -1)
        for k in ks:
            split = (k < d - 1) if direction > 0 else (k > 0)
            bwd = direction < 0
            nb_idx = k + 1 if direction > 0 else k - 1
            neighbor = x_cores[nb_idx] if split else x_cores[k]
            r_out = (caps[k] if direction > 0 else caps[k - 1]) if split else 1
            core, nb_new, alpha, _, pA_upd, pD_upd = last_step(
                XAX[k], A_p[k], XAX[k + 1], XDX[k], D_p[k], XDX[k + 1],
                neighbor, x_cores[k], alpha, tol_dev,
                r_out=r_out, bwd=bwd, split=split,
            )
            x_cores[k] = core
            if split:
                x_cores[nb_idx] = nb_new
                if direction > 0:
                    XAX[k + 1] = pA_upd
                    XDX[k + 1] = pD_upd
                else:
                    XAX[k] = pA_upd
                    XDX[k] = pD_upd

    swp = 0
    for swp in range(nswp):
        zero_step = False
        # backward half sweep over 2-core windows
        if swp > 0:
            res_list = []
            for k in range(d - 1, 0, -1):
                (x_cores[k - 1], x_cores[k], alpha, res, scl, pA_upd,
                 pD_upd) = win_step(
                    XAX[k - 1], A_p[k - 1], A_p[k], XAX[k + 1],
                    XDX[k - 1], D_p[k - 1], D_p[k], XDX[k + 1],
                    x_cores[k - 1], x_cores[k], alpha, tol_dev,
                    r_out=caps[k - 1], bwd=True,
                )
                XAX[k] = pA_upd
                XDX[k] = pD_upd
                res_list.append(res)
            local_res[0, :] = [float(r) for r in res_list][::-1]
            max_scale = max(max_scale, float(scl))
            if not np.isfinite(float(alpha)) or float(alpha) <= 0:
                zero_step = True
        else:
            for k in range(d - 1, 0, -1):
                core, x_prev, (pA_upd, pD_upd) = orth_step(
                    x_cores[k - 1], x_cores[k],
                    (A_p[k], D_p[k]), (XAX[k + 1], XDX[k + 1]),
                    r_out=caps[k - 1], n_ops=2,
                )
                x_cores[k] = core
                x_cores[k - 1] = x_prev
                XAX[k] = pA_upd
                XDX[k] = pD_upd

        if zero_step:
            break
        if np.max(local_res) < tol or swp == nswp - 1:
            finish(+1)
            break

        # forward half sweep
        res_list = []
        for k in range(d - 1):
            (x_cores[k], x_cores[k + 1], alpha, res, scl, pA_upd,
             pD_upd) = win_step(
                XAX[k], A_p[k], A_p[k + 1], XAX[k + 2],
                XDX[k], D_p[k], D_p[k + 1], XDX[k + 2],
                x_cores[k], x_cores[k + 1], alpha, tol_dev,
                r_out=caps[k], bwd=False,
            )
            XAX[k + 1] = pA_upd
            XDX[k + 1] = pD_upd
            res_list.append(res)
        local_res[1, :] = [float(r) for r in res_list]
        max_scale = max(max_scale, float(scl))
        if not np.isfinite(float(alpha)) or float(alpha) <= 0:
            break
        if np.max(local_res) < tol:
            finish(-1)
            break

        sweep_res = float(np.max(local_res))
        step_f = float(alpha)
        if swp >= 2 and _eigen_step_stalled(
            prev_sweep_step, step_f, prev_sweep_res, sweep_res, tol
        ):
            break
        prev_sweep_step = step_f
        prev_sweep_res = sweep_res

    step_size = float(alpha)
    if not np.isfinite(step_size) or step_size < 0:
        step_size = 0.0
    max_res = float(np.max(local_res))
    x_cores = tt_normalise(list(config.offload_fetch(tuple(x_cores))))
    # Unconverged-eigensolve penalty (reference src/tt_als.py:1280-1283):
    # conservative step shrink by tol/res.  The tolerance must be floored
    # at the dtype's achievable residual: under the f32 profile the sweeps
    # converge to res ~ 5e-8 (input-representation floor) while the
    # callers pass the reference's f64-calibrated tol=1e-8, and the
    # penalty silently crushed CORRECT step sizes 4-16x per iteration
    # (measured 2026-08-19: step 1.0 -> 0.23 at maxcut d3 iteration 0,
    # stalling the IPM at slackness 1e-2).
    # floor by the coarser of representation and compute dtype (see the
    # whole-eigen branch above)
    eps_dt = max(float(jnp.finfo(config.eigen_dtype()).eps),
                 float(jnp.finfo(config.dtype()).eps))
    tol = max(tol, 30.0 * eps_dt, 4.0 * eps_dt * max_scale)
    if max_res > tol and np.isfinite(max_res) and max_res > 0:
        step_size *= tol / max_res
    return step_size, x_cores


def _tt_min_eig_fused_impl(
    A: TT, x0: Optional[TT] = None, nswp: int = 10, tol: float = 1e-8,
    R: int = 8, return_eig_val: bool = False, verbose: bool = False,
):
    """Smallest eigenvector of a symmetric TT operator; fused fixed-rank
    MALS (parity: src/tt_als.py:1392-1499 via solvers/eigen.py)."""
    from ttipm_tpu.solvers.eigen import _eigen_residual_stalled
    from ttipm_tpu.ops.tt import tt_inner_prod
    from ttipm_tpu.ops.products import tt_fast_matrix_vec_mul

    rng = np.random
    d = len(A)
    n = A[0].shape[1]
    A_p = _prep_operator(A, d)
    caps = _vec_caps(d, R, n)
    x_cores = _prep_vec(x0, d, n, caps, rng)

    if config.fused_whole_solve() and d >= 2:
        edt = config.eigen_dtype()
        args = (tuple(A_p), tuple(x_cores), jnp.asarray(tol, dtype=edt))
        if config.offload_device() is not None:
            args = config.offload_put(args)
        xs, _res = _min_eig_program(
            *args, caps=tuple(caps), max_pairs=max(nswp - 1, 1)
        )
        x_cores = tt_normalise(list(config.offload_fetch(xs)))
        min_eig_value = None
        if return_eig_val:
            min_eig_value = tt_inner_prod(
                x_cores, tt_fast_matrix_vec_mul(A, x_cores, 1e-12)
            )
        return x_cores, min_eig_value

    use_host = _use_host_engine()
    if use_host:
        from ttipm_tpu.solvers import fused_eigen_host as _H

        minw_step, minl_step, orth_step = (
            _H.min_window_step, _H.min_last_step, _H.orth_bck_step
        )
        ones3 = np.ones((1, 1, 1), dtype=config.eigen_dtype())
    else:
        minw_step, minl_step, orth_step = (
            _min_window_step, _min_last_step, _orth_bck_step
        )
        ones3 = jnp.ones((1, 1, 1), dtype=config.eigen_dtype())
    XAX = [ones3] + [None] * (d - 1) + [ones3]
    if config.offload_device() is not None:
        A_p, x_cores, XAX = config.offload_put((A_p, x_cores, XAX))
        A_p, x_cores, XAX = list(A_p), list(x_cores), list(XAX)
    prev_sweep_res = np.inf
    max_res = 0.0

    def finish(direction: int):
        ks = range(d) if direction > 0 else range(d - 1, -1, -1)
        for k in ks:
            split = (k < d - 1) if direction > 0 else (k > 0)
            bwd = direction < 0
            nb_idx = k + 1 if direction > 0 else k - 1
            neighbor = x_cores[nb_idx] if split else x_cores[k]
            r_out = (caps[k] if direction > 0 else caps[k - 1]) if split else 1
            core, nb_new, p_upd = minl_step(
                XAX[k], A_p[k], XAX[k + 1], neighbor, x_cores[k],
                r_out=r_out, bwd=bwd, split=split,
            )
            x_cores[k] = core
            if split:
                x_cores[nb_idx] = nb_new
                if direction > 0:
                    XAX[k + 1] = p_upd
                else:
                    XAX[k] = p_upd

    swp = 0
    for swp in range(nswp):
        max_res = np.inf if swp == 0 else 0.0
        if swp > 0:
            res_list = []
            for k in range(d - 1, 0, -1):
                x_cores[k - 1], x_cores[k], res, p_upd = minw_step(
                    XAX[k - 1], A_p[k - 1], A_p[k], XAX[k + 1],
                    x_cores[k - 1], x_cores[k], r_out=caps[k - 1], bwd=True,
                )
                XAX[k] = p_upd
                res_list.append(res)
            max_res = max(float(r) for r in res_list)
        else:
            for k in range(d - 1, 0, -1):
                core, x_prev, (p_upd,) = orth_step(
                    x_cores[k - 1], x_cores[k], (A_p[k],), (XAX[k + 1],),
                    r_out=caps[k - 1], n_ops=1,
                )
                x_cores[k] = core
                x_cores[k - 1] = x_prev
                XAX[k] = p_upd

        if max_res < tol or swp == nswp - 1:
            finish(+1)
            break

        res_list = []
        for k in range(d - 1):
            x_cores[k], x_cores[k + 1], res, p_upd = minw_step(
                XAX[k], A_p[k], A_p[k + 1], XAX[k + 2],
                x_cores[k], x_cores[k + 1], r_out=caps[k], bwd=False,
            )
            XAX[k + 1] = p_upd
            res_list.append(res)
        max_res = max(float(r) for r in res_list)

        if max_res < tol:
            finish(-1)
            break
        if swp >= 2 and _eigen_residual_stalled(prev_sweep_res, max_res, tol):
            break
        prev_sweep_res = max_res

    x_cores = tt_normalise(list(config.offload_fetch(tuple(x_cores))))
    min_eig_value = None
    if return_eig_val:
        min_eig_value = tt_inner_prod(
            x_cores, tt_fast_matrix_vec_mul(A, x_cores, 1e-12)
        )
    return x_cores, min_eig_value


def tt_max_generalised_eigen_fused(*args, **kwargs):
    """Public entry: runs the fused MALS driver; under heterogeneous
    offload (config.set_offload) the window-step programs trace with the
    TPU-safe Jacobi factorizations and execute on the offload device."""
    from contextlib import nullcontext

    from ttipm_tpu.ops import jacobi as _jacobi

    ctx = (_jacobi.forced(True) if config.offload_device() is not None
           else nullcontext())
    with ctx:
        return _tt_max_generalised_eigen_fused_impl(*args, **kwargs)


def tt_min_eig_fused(*args, **kwargs):
    """Public entry for the fused min-eig driver (see above)."""
    from contextlib import nullcontext

    from ttipm_tpu.ops import jacobi as _jacobi

    ctx = (_jacobi.forced(True) if config.offload_device() is not None
           else nullcontext())
    with ctx:
        return _tt_min_eig_fused_impl(*args, **kwargs)
