"""numpy twins of the fused eigensolver window steps.

Same semantics as the jitted step programs of ``solvers/fused_eigen.py``
(dense window eigh, shrink-on-negative generalized solve, fixed-rank SVD
re-split, interface updates), executed with numpy/LAPACK on the host.
Selected by the drivers when host-algebra mode is active and nothing is
offloaded — the per-window jitted programs pay XLA trace/lower/dispatch
per shape signature, which dwarfs the microseconds of arithmetic on these
<=256-dimensional pencils (config.py::host_algebra rationale; reference
engine src/tt_als.py:931-1499 runs scipy eigsh the same way).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as sla

from ttipm_tpu.solvers.fused_host import _es

TINY = 1e-300


def _asm2(phi_l, A_k, A_k1, phi_r):
    t = _es("lsr,smnk,kptS,LSR->lmpLrntR", phi_l, A_k, A_k1, phi_r)
    m = t.shape[0] * t.shape[1] * t.shape[2] * t.shape[3]
    return t.reshape(m, m)


def _asm1(phi_l, A_k, phi_r):
    t = _es("lsr,smnS,LSR->lmLrnR", phi_l, A_k, phi_r)
    m = t.shape[0] * t.shape[1] * t.shape[2]
    return t.reshape(m, m)


# Dense-vs-Lanczos dispatch: below this window size the full LAPACK eigh
# is effectively free; above it only ONE eigenpair is wanted and ARPACK
# k=1 with a warm start is asymptotically cheaper (the window matrices
# grow as (rl*4*rr)^2 — n=4096 at d=10 — and a full eigh there costs
# seconds per window).  This mirrors the reference's own dense-eigsh
# dispatch (src/tt_als.py:963-1018).
_DENSE_EIG_LIMIT = 192


def _smallest_eigpair(M, v0=None):
    m = M.shape[0]
    Ms = 0.5 * (M + M.T)
    if m >= _DENSE_EIG_LIMIT and np.all(np.isfinite(Ms)):
        try:
            from scipy.sparse.linalg import eigsh

            kw = dict(k=1, which="SA", maxiter=50 * int(np.sqrt(m)),
                      tol=1e-10, ncv=min(m - 1, 48))
            if v0 is not None:
                v0 = np.asarray(v0, dtype=Ms.dtype).reshape(-1)
                if v0.shape[0] == m and np.all(np.isfinite(v0)) and \
                        np.linalg.norm(v0) > 0:
                    kw["v0"] = v0
            ev, U = eigsh(Ms, **kw)
            return float(ev[0]), U[:, 0]
        except Exception:
            pass  # ARPACK no-convergence etc. -> dense fallback
    try:
        ev, U = np.linalg.eigh(Ms)
    except np.linalg.LinAlgError:
        return np.nan, np.full(M.shape[0], np.nan, dtype=M.dtype)
    return ev[0], U[:, 0]


def _largest_eigval(W):
    m = W.shape[0]
    Ws = 0.5 * (W + W.T)
    if m >= _DENSE_EIG_LIMIT and np.all(np.isfinite(Ws)):
        try:
            from scipy.sparse.linalg import eigsh

            ev = eigsh(Ws, k=1, which="LA", maxiter=50 * int(np.sqrt(m)),
                       tol=1e-10, ncv=min(m - 1, 48),
                       return_eigenvectors=False)
            return float(ev[0])
        except Exception:
            pass
    evg = np.linalg.eigvalsh(Ws)
    return float(evg[-1])


def _shrink_alpha(MA, MD, alpha, tol):
    m = MA.shape[0]
    try:
        L = np.linalg.cholesky(
            0.5 * (MA + MA.T) + 1e-12 * np.eye(m, dtype=MA.dtype)
        )
        W = sla.solve_triangular(L, 0.5 * (MD + MD.T), lower=True)
        W = sla.solve_triangular(L, W.T, lower=True)
        # reference computes -(smallest eig of W) = largest eig of -W
        lam_max = _largest_eigval(-W)
    except np.linalg.LinAlgError:
        lam_max = np.nan
    if np.isfinite(lam_max) and lam_max > 0:
        return max(0.0, min(float(alpha), 1.0 / lam_max))
    return float(alpha) * (1 - tol)


def _pencil_solve(MA, MD, prev_vec, alpha, tol):
    M = MA / alpha + MD
    lam, x = _smallest_eigpair(M, v0=prev_vec)
    if np.isfinite(lam) and lam < 0:
        alpha_new = _shrink_alpha(MA, MD, alpha, tol)
    else:
        alpha_new = float(alpha)
    denom = alpha_new if alpha_new > 0 else 1.0
    Mp = (MA @ prev_vec) / denom + MD @ prev_vec
    lam_prev = float(np.vdot(prev_vec, Mp))
    old_res = float(np.linalg.norm(Mp - lam_prev * prev_vec))
    scale = float(np.linalg.norm(M))
    return x, alpha_new, old_res, scale


def _phi_bck(phi_next, c, a, c2):
    return _es("LSR,lML,sMNS,rNR->lsr", phi_next, c, a, c2)


def _phi_fwd(phi_prev, c, a, c2):
    return _es("lsr,lML,sMNS,rNR->LSR", phi_prev, c, a, c2)


def _svd(mat):
    try:
        return np.linalg.svd(mat, full_matrices=False)
    except np.linalg.LinAlgError:
        return sla.svd(mat, full_matrices=False, lapack_driver="gesvd")


def _split_bck(x, shape, r_out: int):
    rl, n1, n2, rr = shape
    mat = x.reshape(rl * n1, n2 * rr).T
    u, s, vt = _svd(mat)
    r_out = min(r_out, u.shape[1])
    sol2 = np.ascontiguousarray(u[:, :r_out].T).reshape(r_out, n2, rr)
    sol1 = (s[:r_out, None] * vt[:r_out]).T.reshape(rl, n1, r_out)
    return sol1, sol2


def _split_fwd(x, shape, r_out: int):
    rl, n1, n2, rr = shape
    mat = x.reshape(rl * n1, n2 * rr)
    u, s, vt = _svd(mat)
    r_out = min(r_out, u.shape[1])
    sol1 = u[:, :r_out].reshape(rl, n1, r_out)
    sol2 = (s[:r_out, None] * vt[:r_out]).reshape(r_out, n2, rr)
    return sol1, sol2


def gen_window_step(pAl, A_k, A_k1, pAr, pDl, D_k, D_k1, pDr, sol1, sol2,
                    alpha, tol, r_out: int, bwd: bool):
    prev = _es("rny,ytR->rntR", sol1, sol2)
    shape = prev.shape
    MA = _asm2(pAl, A_k, A_k1, pAr)
    MD = _asm2(pDl, D_k, D_k1, pDr)
    x, alpha_new, old_res, scale = _pencil_solve(
        MA, MD, prev.reshape(-1), float(alpha), float(tol)
    )
    x = x / max(float(np.linalg.norm(x)), TINY)
    if bwd:
        sol1_new, sol2_new = _split_bck(x, shape, r_out)
        pA_upd = _phi_bck(pAr, sol2_new, A_k1, sol2_new)
        pD_upd = _phi_bck(pDr, sol2_new, D_k1, sol2_new)
    else:
        sol1_new, sol2_new = _split_fwd(x, shape, r_out)
        pA_upd = _phi_fwd(pAl, sol1_new, A_k, sol1_new)
        pD_upd = _phi_fwd(pDl, sol1_new, D_k, sol1_new)
    return sol1_new, sol2_new, alpha_new, old_res, scale, pA_upd, pD_upd


def gen_last_step(pAl, A_k, pAr, pDl, D_k, pDr, neighbor, prev, alpha, tol,
                  r_out: int, bwd: bool, split: bool):
    shape = prev.shape
    MA = _asm1(pAl, A_k, pAr)
    MD = _asm1(pDl, D_k, pDr)
    x, alpha_new, old_res, _scale = _pencil_solve(
        MA, MD, prev.reshape(-1), float(alpha), float(tol)
    )
    x = x / max(float(np.linalg.norm(x)), TINY)
    if not split:
        return x.reshape(shape), neighbor, alpha_new, old_res, pAl, pDl
    rl, n, rr = shape
    if bwd:
        mat = x.reshape(rl, n * rr).T
        u, s, vt = _svd(mat)
        r_out = min(r_out, u.shape[1])
        core = np.ascontiguousarray(u[:, :r_out].T).reshape(r_out, n, rr)
        v = (s[:r_out, None] * vt[:r_out]).T
        nb_new = _es("rdc,cR->rdR", neighbor, v)
        pA_upd = _phi_bck(pAr, core, A_k, core)
        pD_upd = _phi_bck(pDr, core, D_k, core)
    else:
        mat = x.reshape(rl * n, rr)
        u, s, vt = _svd(mat)
        r_out = min(r_out, u.shape[1])
        core = u[:, :r_out].reshape(rl, n, r_out)
        v = s[:r_out, None] * vt[:r_out]
        nb_new = _es("ij,jkl->ikl", v, neighbor)
        pA_upd = _phi_fwd(pAl, core, A_k, core)
        pD_upd = _phi_fwd(pDl, core, D_k, core)
    return core, nb_new, alpha_new, old_res, pA_upd, pD_upd


def orth_bck_step(x_km1, x_k, ops_k, phis_r, r_out: int, n_ops: int):
    rl, n, rr = x_k.shape
    mat = x_k.reshape(rl, n * rr).T
    u, s, vt = _svd(mat)
    r_out = min(r_out, u.shape[1])
    core = np.ascontiguousarray(u[:, :r_out].T).reshape(r_out, n, rr)
    v = (s[:r_out, None] * vt[:r_out]).T
    x_km1_new = _es("rdc,cR->rdR", x_km1, v)
    phi_upds = tuple(
        _phi_bck(phis_r[i], core, ops_k[i], core) for i in range(n_ops)
    )
    return core, x_km1_new, phi_upds


def min_window_step(pl, A_k, A_k1, pr, sol1, sol2, r_out: int, bwd: bool):
    prev = _es("rny,ytR->rntR", sol1, sol2)
    shape = prev.shape
    M = _asm2(pl, A_k, A_k1, pr)
    prev_vec = prev.reshape(-1)
    lam, x = _smallest_eigpair(M, v0=prev_vec)
    Mp = M @ prev_vec
    lam_prev = float(np.vdot(prev_vec, Mp))
    old_res = float(np.linalg.norm(lam_prev * prev_vec - Mp))
    x = x / max(float(np.linalg.norm(x)), TINY)
    if bwd:
        sol1_new, sol2_new = _split_bck(x, shape, r_out)
        p_upd = _phi_bck(pr, sol2_new, A_k1, sol2_new)
    else:
        sol1_new, sol2_new = _split_fwd(x, shape, r_out)
        p_upd = _phi_fwd(pl, sol1_new, A_k, sol1_new)
    return sol1_new, sol2_new, old_res, p_upd


def min_last_step(pl, A_k, pr, neighbor, prev, r_out: int, bwd: bool,
                  split: bool):
    shape = prev.shape
    M = _asm1(pl, A_k, pr)
    lam, x = _smallest_eigpair(M, v0=prev.reshape(-1))
    x = x / max(float(np.linalg.norm(x)), TINY)
    if not split:
        return x.reshape(shape), neighbor, pl
    rl, n, rr = shape
    if bwd:
        mat = x.reshape(rl, n * rr).T
        u, s, vt = _svd(mat)
        r_out = min(r_out, u.shape[1])
        core = np.ascontiguousarray(u[:, :r_out].T).reshape(r_out, n, rr)
        v = (s[:r_out, None] * vt[:r_out]).T
        nb_new = _es("rdc,cR->rdR", neighbor, v)
        p_upd = _phi_bck(pr, core, A_k, core)
    else:
        mat = x.reshape(rl * n, rr)
        u, s, vt = _svd(mat)
        r_out = min(r_out, u.shape[1])
        core = u[:, :r_out].reshape(rl, n, r_out)
        v = s[:r_out, None] * vt[:r_out]
        nb_new = _es("ij,jkl->ikl", v, neighbor)
        p_upd = _phi_fwd(pl, core, A_k, core)
    return core, nb_new, p_upd
