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
    residual in the updated pencil.  Returns (x, alpha_new, old_res)."""
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
    return x, alpha_new, old_res


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
    x, alpha_new, old_res = _pencil_solve(MA, MD, prev.reshape(-1), alpha, tol)
    x = x / jnp.maximum(jnp.linalg.norm(x), TINY)
    if bwd:
        sol1_new, sol2_new = _split_bck(x, shape, r_out)
        pA_upd = _phi_bck(pAr, sol2_new, A_k1, sol2_new)
        pD_upd = _phi_bck(pDr, sol2_new, D_k1, sol2_new)
    else:
        sol1_new, sol2_new = _split_fwd(x, shape, r_out)
        pA_upd = _phi_fwd(pAl, sol1_new, A_k, sol1_new)
        pD_upd = _phi_fwd(pDl, sol1_new, D_k, sol1_new)
    return sol1_new, sol2_new, alpha_new, old_res, pA_upd, pD_upd


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
    x, alpha_new, old_res = _pencil_solve(MA, MD, prev.reshape(-1), alpha, tol)
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
# Host-side prep (numpy only)
# ---------------------------------------------------------------------------

def _bucket4(r: int) -> int:
    return ((int(r) + 3) // 4) * 4


def _prep_operator(cores, d: int) -> List[jax.Array]:
    # Deliberately f64 even under the f32 profile: the step-size pencil
    # (largest alpha with A + alpha*Delta PSD) determines a boundary
    # crossing from near-zero eigenvalues, and an all-f32 eigen path
    # breaks IPM convergence (measured 2026-08-19: maxcut d3 e2e fails
    # within 2 iterations with f32 preps, passes with f64).  The window
    # matrices are tiny, so the f64 cost is negligible on CPU and
    # bounded on TPU (emulated matvecs; factorizations stay small).
    cs = [np.asarray(c, dtype=np.float64) for c in cores]
    if d == 1:
        return [jnp.asarray(cs[0])]
    ra = _bucket4(max(c.shape[-1] for c in cs[:-1]))
    out = []
    for k, c in enumerate(cs):
        rl = 1 if k == 0 else ra
        rr = 1 if k == d - 1 else ra
        pad = [(0, rl - c.shape[0])] + [(0, 0)] * (c.ndim - 2) + [
            (0, rr - c.shape[-1])
        ]
        out.append(jnp.asarray(np.pad(c, pad)))
    return out


def _vec_caps(d: int, R: int, n: int) -> List[int]:
    return [min(R, n ** (k + 1), n ** (d - 1 - k)) for k in range(d - 1)]


def _prep_vec(x0, d: int, n: int, caps: List[int], rng) -> List[jax.Array]:
    """Eigenvector warm start at exact cap ranks (numpy retraction/pad)."""
    if x0 is not None:
        cores = [np.asarray(c, dtype=np.float64) for c in x0]
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
        return [jnp.asarray(c) for c in cores]
    cores = []
    for k in range(d):
        rl = 1 if k == 0 else caps[k - 1]
        rr = 1 if k == d - 1 else caps[k]
        cores.append(jnp.asarray(rng.randn(rl, n, rr)))
    return cores


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

    ones3 = jnp.ones((1, 1, 1), dtype=config.dtype())
    XAX = [ones3] + [None] * (d - 1) + [ones3]
    XDX = [ones3] + [None] * (d - 1) + [ones3]

    tol_dev = jnp.asarray(tol, dtype=config.dtype())
    alpha = jnp.asarray(1.0, dtype=config.dtype())
    if config.offload_device() is not None:
        (A_p, D_p, x_cores, XAX, XDX, tol_dev, alpha) = config.offload_put(
            (A_p, D_p, x_cores, XAX, XDX, tol_dev, alpha)
        )
        A_p, D_p, x_cores = list(A_p), list(D_p), list(x_cores)
        XAX, XDX = list(XAX), list(XDX)
    local_res = np.inf * np.ones((2, max(d - 1, 1)))
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
            core, nb_new, alpha, _, pA_upd, pD_upd = _gen_last_step(
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
                (x_cores[k - 1], x_cores[k], alpha, res, pA_upd,
                 pD_upd) = _gen_window_step(
                    XAX[k - 1], A_p[k - 1], A_p[k], XAX[k + 1],
                    XDX[k - 1], D_p[k - 1], D_p[k], XDX[k + 1],
                    x_cores[k - 1], x_cores[k], alpha, tol_dev,
                    r_out=caps[k - 1], bwd=True,
                )
                XAX[k] = pA_upd
                XDX[k] = pD_upd
                res_list.append(res)
            local_res[0, :] = [float(r) for r in res_list][::-1]
            if not np.isfinite(float(alpha)) or float(alpha) <= 0:
                zero_step = True
        else:
            for k in range(d - 1, 0, -1):
                core, x_prev, (pA_upd, pD_upd) = _orth_bck_step(
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
            (x_cores[k], x_cores[k + 1], alpha, res, pA_upd,
             pD_upd) = _gen_window_step(
                XAX[k], A_p[k], A_p[k + 1], XAX[k + 2],
                XDX[k], D_p[k], D_p[k + 1], XDX[k + 2],
                x_cores[k], x_cores[k + 1], alpha, tol_dev,
                r_out=caps[k], bwd=False,
            )
            XAX[k + 1] = pA_upd
            XDX[k + 1] = pD_upd
            res_list.append(res)
        local_res[1, :] = [float(r) for r in res_list]
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
    tol = max(tol, 30.0 * float(jnp.finfo(config.dtype()).eps))
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

    ones3 = jnp.ones((1, 1, 1), dtype=config.dtype())
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
            core, nb_new, p_upd = _min_last_step(
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
                x_cores[k - 1], x_cores[k], res, p_upd = _min_window_step(
                    XAX[k - 1], A_p[k - 1], A_p[k], XAX[k + 1],
                    x_cores[k - 1], x_cores[k], r_out=caps[k - 1], bwd=True,
                )
                XAX[k] = p_upd
                res_list.append(res)
            max_res = max(float(r) for r in res_list)
        else:
            for k in range(d - 1, 0, -1):
                core, x_prev, (p_upd,) = _orth_bck_step(
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
            x_cores[k], x_cores[k + 1], res, p_upd = _min_window_step(
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
