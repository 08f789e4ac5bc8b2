"""Conic (SCS / SDPA) encodings of the four SDP families, for
cross-solver ground-truth validation.

Role parity: /root/reference/psd_system/direct_conic.py:82-271 and the
per-problem `*_scs.py` / `*_sdpa.py` runner scripts.  Re-architected:
constraints are built once as a solver-independent `ConicSDP` (sparse
entry lists over the dense matrix), and each backend encoding is a pure,
vectorised numpy transform of that object — so the encodings are unit-
testable against dense oracles without `scs`/`sdpap` installed; only the
final `solve_*` calls are gated on the optional packages.

All problems are MAXIMISATION of <C, X> subject to
  <A_i, X> = b_i          (equality rows)
  <G_j, X> >= h_j         (inequality rows)
  X PSD.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import numpy as np

__all__ = [
    "ConicSDP",
    "svec",
    "smat",
    "svec_entries",
    "scs_encode",
    "sdpa_encode",
    "solve_scs",
    "solve_sdpa",
    "maxcut_conic",
    "corr_clust_conic",
    "max_stable_set_conic",
    "graphm_conic",
]

_SQRT2 = math.sqrt(2.0)

# One constraint = list of (i, j, coef) meaning  sum coef * X[i, j]
# with symmetric completion (an off-diagonal entry touches X[i,j]+X[j,i]
# through the symmetry of X, handled by the encodings).
Entries = Sequence[Tuple[int, int, float]]


@dataclass
class ConicSDP:
    """Solver-independent maximisation SDP over one PSD block."""

    C: np.ndarray
    eq_entries: List[Entries] = field(default_factory=list)
    eq_rhs: List[float] = field(default_factory=list)
    ineq_entries: List[Entries] = field(default_factory=list)  # <G,X> >= h
    ineq_rhs: List[float] = field(default_factory=list)

    @property
    def n(self) -> int:
        return self.C.shape[0]

    def add_eq(self, entries: Entries, rhs: float) -> None:
        self.eq_entries.append(list(entries))
        self.eq_rhs.append(float(rhs))

    def add_ge(self, entries: Entries, rhs: float = 0.0) -> None:
        self.ineq_entries.append(list(entries))
        self.ineq_rhs.append(float(rhs))

    # dense oracles (used by tests and feasibility reporting)
    def eq_residual(self, X: np.ndarray) -> np.ndarray:
        return np.array(
            [_apply_entries(e, X) for e in self.eq_entries]
        ) - np.asarray(self.eq_rhs)

    def ineq_violation(self, X: np.ndarray) -> np.ndarray:
        vals = np.array([_apply_entries(e, X) for e in self.ineq_entries])
        return np.minimum(vals - np.asarray(self.ineq_rhs), 0.0)


def _apply_entries(entries: Entries, X: np.ndarray) -> float:
    """<A, X> where A has the given (i, j, coef) entries placed
    symmetrically (coef split over (i,j) and (j,i) for i != j... no:
    the convention is coef multiplies X[i, j] once; X symmetric)."""
    return float(sum(c * X[i, j] for i, j, c in entries))


# --- scaled-lower-triangle vectorisation (SCS "s" cone convention) --------


def _tril_indices(n: int):
    """Column-major lower-triangle index pair arrays (SCS ordering)."""
    cols, rows = np.meshgrid(np.arange(n), np.arange(n), indexing="xy")
    mask = rows >= cols
    # column-major walk: for j in cols, for i in rows >= j
    order = np.argsort(cols[mask] * n + rows[mask], kind="stable")
    return rows[mask][order], cols[mask][order]


def _tril_pos(i: np.ndarray, j: np.ndarray, n: int) -> np.ndarray:
    """Position of lower-tri (i >= j) entry in the column-major packing."""
    return (j * (2 * n - j + 1)) // 2 + (i - j)


def svec(M: np.ndarray) -> np.ndarray:
    """Scaled column-major lower-triangle vectorisation: off-diagonals
    are multiplied by sqrt(2) so <svec(A), svec(B)> == <A, B>."""
    n = M.shape[0]
    r, c = _tril_indices(n)
    v = M[r, c].astype(float).copy()
    v[r != c] *= _SQRT2
    return v


def smat(v: np.ndarray, n: int) -> np.ndarray:
    """Inverse of :func:`svec`."""
    r, c = _tril_indices(n)
    vals = np.asarray(v, dtype=float).copy()
    vals[r != c] /= _SQRT2
    M = np.zeros((n, n))
    M[r, c] = vals
    M[c, r] = vals
    return M


def svec_entries(entries: Entries, n: int):
    """(positions, values) of a constraint row in svec coordinates.
    Duplicate (i, j) hits accumulate; an off-diagonal coefficient on
    X[i, j] of the SYMMETRIC variable contributes coef/sqrt(2) at the
    packed slot (so that packed_row . svec(X) == sum coef * X[i, j])."""
    pos: dict = {}
    for i, j, coef in entries:
        if i < j:
            i, j = j, i
        p = int(_tril_pos(np.asarray(i), np.asarray(j), n))
        w = float(coef) if i == j else float(coef) / _SQRT2
        pos[p] = pos.get(p, 0.0) + w
    idx = np.fromiter(pos.keys(), dtype=np.int64, count=len(pos))
    val = np.fromiter(pos.values(), dtype=float, count=len(pos))
    return idx, val


# --- SCS encoding -----------------------------------------------------------


def scs_encode(prob: ConicSDP):
    """(A, b, c, cone) for ``scs.solve`` in SCS >= 3 convention:
    minimise c.x  s.t.  Ax + s = b,  s in K = {0}^z x R+^l x PSD.
    Maximisation of <C, X> becomes c = -svec(C); inequality rows
    <G, X> >= h become -g.x <= -h; the PSD block enters as -I slack."""
    import scipy.sparse as sp

    n = prob.n
    nvar = n * (n + 1) // 2
    m_eq, m_ineq = len(prob.eq_entries), len(prob.ineq_entries)
    rows, cols, vals = [], [], []
    b = np.zeros(m_eq + m_ineq + nvar)

    for r, entries in enumerate(prob.eq_entries):
        idx, val = svec_entries(entries, n)
        rows.append(np.full(idx.shape, r))
        cols.append(idx)
        vals.append(val)
        b[r] = prob.eq_rhs[r]
    for k, entries in enumerate(prob.ineq_entries):
        r = m_eq + k
        idx, val = svec_entries(entries, n)
        rows.append(np.full(idx.shape, r))
        cols.append(idx)
        vals.append(-val)  # >= h  ->  -g.x <= -h
        b[r] = -prob.ineq_rhs[k]
    # PSD slack: -x + s = 0, s in S+
    rows.append(np.arange(m_eq + m_ineq, m_eq + m_ineq + nvar))
    cols.append(np.arange(nvar))
    vals.append(-np.ones(nvar))

    A = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(m_eq + m_ineq + nvar, nvar),
    ).tocsc()
    c = -svec(prob.C)
    cone = {"z": m_eq, "l": m_ineq, "s": [n]}
    return A, b, c, cone


def solve_scs(prob: ConicSDP, eps: float = 1e-5, verbose: bool = False,
              **scs_kwargs):
    """Solve with SCS (optional dependency).  Returns the same schema as
    the reference glue: x_matrix, z_matrix, y_eq, y_ineq and the raw sol.
    Parity: /root/reference/psd_system/direct_conic.py:115-187."""
    import scs

    A, b, c, cone = scs_encode(prob)
    sol = scs.solve(
        {"A": A, "b": b, "c": c}, cone,
        eps_abs=eps, eps_rel=eps, verbose=verbose, **scs_kwargs,
    )
    x = sol.get("x")
    y = sol.get("y")
    if x is None or y is None:
        status = sol.get("info", {}).get("status")
        raise RuntimeError(f"SCS returned no solution (status={status})")
    n = prob.n
    m_eq, m_ineq = len(prob.eq_entries), len(prob.ineq_entries)
    return {
        "x_matrix": smat(np.asarray(x), n),
        "y_eq": np.asarray(y)[:m_eq],
        "y_ineq": np.asarray(y)[m_eq:m_eq + m_ineq],
        "z_matrix": smat(np.asarray(y)[m_eq + m_ineq:], n),
        "iters": float(sol.get("info", {}).get("iter", 0)),
        "sol": sol,
    }


# --- SDPA (sdpap / CLP format) encoding -------------------------------------


def _full_entries(entries: Entries, n: int):
    """(positions, values) over the full column-major n*n vectorisation;
    off-diagonal coefficients are split symmetrically so the row acts on
    a symmetric X exactly like the entry list."""
    pos: dict = {}

    def hit(i, j, w):
        p = i + j * n
        pos[p] = pos.get(p, 0.0) + w

    for i, j, coef in entries:
        if i == j:
            hit(i, i, float(coef))
        else:
            hit(i, j, 0.5 * float(coef))
            hit(j, i, 0.5 * float(coef))
    idx = np.fromiter(pos.keys(), dtype=np.int64, count=len(pos))
    val = np.fromiter(pos.values(), dtype=float, count=len(pos))
    return idx, val


def sdpa_encode(prob: ConicSDP):
    """(A, b, c) + cone sizes for ``sdpap.solve`` (CLP format): variable
    cone K = PSD(n) over the full vectorisation, constraint cone J with
    f equalities then l inequalities (Ax - b >= 0 rows)."""
    import scipy.sparse as sp

    n = prob.n
    nvar = n * n
    m_eq, m_ineq = len(prob.eq_entries), len(prob.ineq_entries)
    rows, cols, vals = [], [], []
    b = np.zeros(m_eq + m_ineq)
    for r, entries in enumerate(prob.eq_entries):
        idx, val = _full_entries(entries, n)
        rows.append(np.full(idx.shape, r))
        cols.append(idx)
        vals.append(val)
        b[r] = prob.eq_rhs[r]
    for k, entries in enumerate(prob.ineq_entries):
        r = m_eq + k
        idx, val = _full_entries(entries, n)
        rows.append(np.full(idx.shape, r))
        cols.append(idx)
        vals.append(val)
        b[r] = prob.ineq_rhs[k]
    A = sp.coo_matrix(
        (np.concatenate(vals) if vals else np.zeros(0),
         (np.concatenate(rows) if rows else np.zeros(0),
          np.concatenate(cols) if cols else np.zeros(0))),
        shape=(m_eq + m_ineq, nvar),
    ).tocsc()
    c = -prob.C.reshape(-1, order="F")
    return A, b, c, m_eq, m_ineq


def solve_splitting(prob: ConicSDP, rho: float = 1.0,
                    max_iter: int = 20000, tol: float = 1e-7,
                    verbose: bool = False):
    """Native first-order operator-splitting SDP solver (SCS-class ADMM).

    The reference's cross-solver ground-truth axis runs the pip ``scs``
    wheel (psd_system/maxcut/maxcut_scs.py:44-110); that wheel is not
    installable in this image, so this is an in-tree solver of the same
    algorithm family (alternating projections onto the affine constraint
    set and the PSD cone with scaled dual updates — O'Donoghue et al.'s
    splitting, minus the homogeneous self-dual embedding, which only
    matters for infeasibility certificates).  Dense factorizations: meant
    for the cross-check sizes (n = 2^d <= ~64), not production scale.

    Solves  max <C, X>  s.t.  A_eq(X) = b,  A_in(X) >= h,  X PSD.
    Returns dict(x_matrix, objective, iterations, primal_res, dual_res).
    """
    n = prob.n
    nvar = n * (n + 1) // 2
    m_eq, m_in = len(prob.eq_entries), len(prob.ineq_entries)

    def rows(entries_list, sign=1.0):
        R = np.zeros((len(entries_list), nvar))
        for r, entries in enumerate(entries_list):
            idx, val = svec_entries(entries, n)
            R[r, idx] = sign * val
        return R

    A_eq = rows(prob.eq_entries)
    A_in = rows(prob.ineq_entries)
    b_eq = np.asarray(prob.eq_rhs, dtype=float)
    h_in = np.asarray(prob.ineq_rhs, dtype=float)
    c = -svec(prob.C)  # minimise -<C, X>

    # KKT system of the (X, s) subproblem:
    #   min c.x + rho/2 ||x - zx||^2 + rho/2 ||s - zs||^2
    #   s.t. A_eq x = b_eq,  A_in x - s = h_in
    # Eliminating through the stationarity rows gives a saddle system in
    # the multipliers with Schur matrix G = [Aeq; Ain] [Aeq; Ain]' / rho
    # (+ I/rho on the inequality block from the slack row).
    import scipy.linalg as sla

    A_all = np.vstack([A_eq, A_in]) if m_in else A_eq
    G = (A_all @ A_all.T) / rho
    if m_in:
        G[m_eq:, m_eq:] += np.eye(m_in) / rho
    G_f = sla.cho_factor(G + 1e-12 * np.eye(G.shape[0]))

    x = np.zeros(nvar)
    zx = np.zeros(nvar)    # PSD-cone copy of x
    ux = np.zeros(nvar)
    s = np.zeros(m_in)     # inequality slack (A_in x - h >= 0)
    zs = np.zeros(m_in)    # nonneg copy of s
    us = np.zeros(m_in)

    rhs_const = np.concatenate([b_eq, h_in]) if m_in else b_eq
    it = 0
    pri = dual = np.inf
    for it in range(1, max_iter + 1):
        # --- (X, s) update: equality-constrained quadratic ---
        qx = rho * (zx - ux) - c
        qs = rho * (zs - us)
        r_vec = rhs_const - np.concatenate(
            [A_eq @ (qx / rho),
             A_in @ (qx / rho) - qs / rho] if m_in else [A_eq @ (qx / rho)]
        )
        lam = sla.cho_solve(G_f, r_vec)
        x = (qx + A_all.T @ lam) / rho
        if m_in:
            s = (qs - lam[m_eq:]) / rho
        # --- cone projections ---
        zx_old, zs_old = zx, zs
        w, V = np.linalg.eigh(smat(x + ux, n))
        zx = svec((V * np.maximum(w, 0.0)) @ V.T)
        if m_in:
            zs = np.maximum(s + us, 0.0)
        # --- dual updates ---
        ux = ux + x - zx
        us = us + s - zs if m_in else us
        pri = np.linalg.norm(x - zx) + (
            np.linalg.norm(s - zs) if m_in else 0.0
        )
        dual = rho * (np.linalg.norm(zx - zx_old) + (
            np.linalg.norm(zs - zs_old) if m_in else 0.0
        ))
        scale = max(1.0, np.linalg.norm(zx))
        if pri / scale < tol and dual / scale < tol:
            break
        if verbose and it % 500 == 0:
            print(f"[splitting] it {it}: pri {pri:.2e} dual {dual:.2e}",
                  flush=True)

    X = smat(zx, n)
    return {
        "x_matrix": X,
        "objective": float(np.sum(prob.C * X)),
        "iterations": it,
        "primal_res": float(pri),
        "dual_res": float(dual),
    }


def solve_sdpa(prob: ConicSDP, option=None):
    """Solve with sdpap (optional dependency).  Parity:
    /root/reference/psd_system/direct_conic.py:202-271."""
    import sdpap

    A, b, c, m_eq, m_ineq = sdpa_encode(prob)
    n = prob.n
    K = sdpap.SymCone(s=(n,))
    J = sdpap.SymCone(f=m_eq, l=m_ineq)
    opts = {
        "print": "no",
        "epsilonDash": 1e-5,
        "epsilonStar": 1e-5,
        "domainMethod": "none",
        "rangeMethod": "none",
    }
    if option:
        opts.update(option)
    x, y, *info = sdpap.solve(A, b, c, K, J, option=opts)
    x_vec = np.asarray(x.todense()).reshape(-1)
    y_vec = np.asarray(y.todense()).reshape(-1)
    X = x_vec.reshape((n, n), order="F")
    Z = (c - A.T @ y_vec).reshape((n, n), order="F")
    return {
        "x_matrix": 0.5 * (X + X.T),
        "y_eq": y_vec[:m_eq],
        "y_ineq": y_vec[m_eq:],
        "z_matrix": 0.5 * (Z + Z.T),
        "info": info,
    }


# --- per-problem constraint builders ----------------------------------------
# Dense-side mirrors of the TT problem generators (models/*.py); used by
# utils/baseline_runner.py.  Parity: psd_system/*/*_scs.py builders.


def maxcut_conic(C: np.ndarray) -> ConicSDP:
    """max <C, X>, diag(X) = 1, X PSD (psd_system/maxcut/maxcut_scs.py:19)."""
    prob = ConicSDP(C)
    for i in range(C.shape[0]):
        prob.add_eq([(i, i, 1.0)], 1.0)
    return prob


def corr_clust_conic(C: np.ndarray, ineq_mask: np.ndarray,
                     beta: float = 0.0) -> ConicSDP:
    """diag(X)=1 plus entrywise X_ij >= -beta on the mask support
    (psd_system/corr_clust/corr_clust_scs.py:17-31)."""
    prob = ConicSDP(C)
    n = C.shape[0]
    for i in range(n):
        prob.add_eq([(i, i, 1.0)], 1.0)
    ii, jj = np.nonzero(np.triu(ineq_mask))
    for i, j in zip(ii.tolist(), jj.tolist()):
        prob.add_ge([(int(i), int(j), float(ineq_mask[i, j]))], -beta)
    return prob


def max_stable_set_conic(C: np.ndarray, adj: np.ndarray) -> ConicSDP:
    """X_ij = 0 on edges, trace(X) = 1
    (psd_system/max_stable_set/max_stable_set_scs.py:22-38)."""
    prob = ConicSDP(C)
    n = C.shape[0]
    ii, jj = np.nonzero(np.triu(adj))
    for i, j in zip(ii.tolist(), jj.tolist()):
        prob.add_eq([(int(i), int(j), float(adj[i, j]))], 0.0)
    prob.add_eq([(k, k, 1.0) for k in range(n)], 1.0)
    return prob


def graphm_conic(C: np.ndarray, n: int) -> ConicSDP:
    """Lifted QAP constraints on the (n^2+1)-sized matrix [[Q, p], [pT, 1]]
    (psd_system/graphm/graphm_scs.py:17-95): block partial traces,
    doubly-stochastic coupling, Q/P nonnegativity."""
    q = n * n
    last = q
    prob = ConicSDP(C)
    prob.add_eq([(last, last, 1.0)], 1.0)
    # sum_i Q_ii block == I_n
    for a in range(n):
        for b_ in range(n):
            prob.add_eq([(i * n + a, i * n + b_, 1.0) for i in range(n)],
                        1.0 if a == b_ else 0.0)
    # trace(Q_ij) == 0 for i != j
    for i in range(n):
        for j in range(n):
            if i != j:
                prob.add_eq([(i * n + a, j * n + a, 1.0) for a in range(n)],
                            0.0)
    # each Q_ij block sums to 1
    for i in range(n):
        for j in range(n):
            prob.add_eq(
                [(i * n + a, j * n + b_, 1.0)
                 for a in range(n) for b_ in range(n)], 1.0)
    # diag(Q) equals the P column of the lifting
    for i in range(n):
        for j in range(n):
            idx = i * n + j
            prob.add_eq([(idx, idx, 1.0), (idx, last, -1.0)], 0.0)
    # doubly stochastic P
    for i in range(n):
        prob.add_eq([(j + i * n, last, 1.0) for j in range(n)], 1.0)
    for j in range(n):
        prob.add_eq([(j + i * n, last, 1.0) for i in range(n)], 1.0)
    # nonnegativity
    for i in range(n):
        for j in range(n):
            prob.add_ge([(j + i * n, last, 1.0)], 0.0)
    for r in range(q):
        for c_ in range(r + 1):
            prob.add_ge([(r, c_, 1.0)], 0.0)
    return prob
