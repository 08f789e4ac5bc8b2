"""Classical dense SDP baselines for cross-checking the TT-IPM.

``cgal`` / ``sketchy_cgal`` implement the CGAL and SketchyCGAL algorithms
of Yurtsever, Tropp, Fercoq, Udell & Cevher, *Scalable Semidefinite
Programming* (SIAM J. Math. Data Sci. 3(1), 2021) — conditional-gradient
augmented-Lagrangian methods on the trace-bounded spectrahedron.  They
serve the same numerical-ground-truth role as the reference's baselines
(/root/reference/src/baselines.py, SURVEY.md §4) but are implemented from
the paper's pseudocode: the constraint map A is applied as one stacked
einsum rather than a Python loop over matrices, and SketchyCGAL tracks
only the Nystrom sketch plus the scalars (<C, X>, A(X)) — never the full
iterate.

``solve_scs_psd_max`` / ``solve_sdpa_psd_max`` delegate to the conic
encodings in models/conic.py and need the optional ``scs`` / ``sdpap``
packages only for the final solve call.

These run on host numpy/scipy by design: they are CPU cross-check tools,
not part of the TPU solve path.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import scipy.sparse.linalg as spla

__all__ = ["cgal", "sketchy_cgal", "solve_scs_psd_max", "solve_sdpa_psd_max"]


# --- shared machinery --------------------------------------------------------


class _ConstraintMap:
    """A(X) = (<A_i, X>)_i and its adjoint, as stacked-array contractions."""

    def __init__(self, constraint_matrices: Sequence[np.ndarray]):
        self.stack = np.stack([np.asarray(A, dtype=float)
                               for A in constraint_matrices])

    def __call__(self, X: np.ndarray) -> np.ndarray:
        return np.einsum("kij,ij->k", self.stack, X)

    def on_vector(self, v: np.ndarray) -> np.ndarray:
        """A(v v^T) without forming the outer product."""
        return np.einsum("kij,i,j->k", self.stack, v, v)

    def adjoint(self, z: np.ndarray) -> np.ndarray:
        return np.einsum("k,kij->ij", z, self.stack)

    @property
    def frob_sum(self) -> float:
        return float(sum(np.linalg.norm(A) for A in self.stack))


def _min_eigpair(H: np.ndarray, ncv: int) -> Tuple[float, np.ndarray, int]:
    """Smallest eigenpair of a symmetric matrix with a Lanczos->dense
    fallback ladder (the paper's oracle is approximate; robustness over
    speed here)."""
    n = H.shape[0]
    if n <= 128:
        w, V = np.linalg.eigh(H)
        return float(w[0]), V[:, 0], ncv
    try:
        w, V = spla.eigsh(H, k=1, which="SA", ncv=min(ncv, n - 1))
        return float(w[0]), V[:, 0], ncv
    except Exception:
        if ncv + 10 < min(n, 500):
            return _min_eigpair(H, ncv + 10)
        w, V = np.linalg.eigh(H)
        return float(w[0]), V[:, 0], ncv


def _stop_test(gap: float, feas: float, obj: float, bias_norm: float,
               gap_tol: float, abs_tol) -> bool:
    """Relative-or-absolute termination contract shared with the runner
    (reference src/baselines.py keeps the same thresholds)."""
    gap_ok = gap < min((1.0 + abs(obj)) * gap_tol, abs_tol[0])
    feas_ok = feas < min((1.0 + bias_norm) * gap_tol, abs_tol[1])
    return gap_ok and feas_ok


# --- CGAL (Algorithm 3.1) ----------------------------------------------------


def cgal(obj_matrix, constraint_matrices, bias, trace_params, R=1,
         gap_tol=1e-5, abs_tol=(0.1, 1e-3), num_iter=100, verbose=False):
    """min <C, X>  s.t.  A(X) = b,  tr X <= alpha,  X PSD.

    Smoothed augmented Lagrangian with beta_t = sqrt(t+1), dual ascent with
    the paper's step-size safeguard; the primal update mixes in the rank-1
    atom alpha * v v^T from the smallest eigenvector of the gradient.
    ``trace_params = (alpha_if_gradient_psd, alpha)`` reproduces the
    trace-or-zero atom selection used for maximisation problems."""
    C = np.asarray(obj_matrix, dtype=float)
    amap = _ConstraintMap(constraint_matrices)
    b = np.asarray(bias, dtype=float).reshape(-1)
    b_norm = float(np.linalg.norm(b))

    X = np.zeros_like(C)
    y = np.zeros_like(b)          # dual variable
    slack = -b                    # A(X) - b
    # dual step-size budget: the paper bounds sum gamma_t ||slack||^2 by
    # a constant; alpha_0 matches the reference's scaling so runs compare
    alpha_0 = 4.0 * amap.frob_sum * trace_params[1] ** 2

    gaps: List[float] = []
    gap = np.inf
    ncv = 20
    t = 0
    for t in range(1, num_iter):
        beta = np.sqrt(t + 1.0)
        grad = C + amap.adjoint(y + beta * slack)
        lam, v, ncv = _min_eigpair(grad, ncv)

        # atom: alpha * v v^T when the gradient has a negative direction,
        # else the zero matrix (maximisation: shrink toward 0)
        alpha_tr = trace_params[0] if lam > 0 else trace_params[1]
        obj_val = float(np.sum(C * X))
        gap = obj_val + float(np.sum(amap.adjoint(y + beta * slack) * X)) \
            - alpha_tr * lam

        eta = 2.0 / (t + 1.0)
        X *= 1.0 - eta
        if alpha_tr != 0.0:
            X += (eta * alpha_tr) * np.outer(v, v)

        slack = amap(X) - b
        feas2 = float(slack @ slack)
        gamma = min(alpha_0 / ((t + 1.0) ** 1.5 * max(feas2, 1e-300)), 1.0)
        y = y + gamma * slack

        feas = np.sqrt(feas2)
        if verbose and t % 1000 == 0:
            gaps.append(gap)
            print(f"cgal step {t}: gap {gap:.3e} feas {feas2:.3e}",
                  flush=True)
        if _stop_test(gap, feas, np.sum(C * X), b_norm, gap_tol, abs_tol):
            break
    return X, gaps, {"num_iters": t}


# --- SketchyCGAL (Algorithm 6.1) --------------------------------------------


class _NystromSketch:
    """Rank-R randomised range sketch S = X @ Omega with the stabilised
    reconstruction of the paper (sec. 5.2): shift by sigma, Cholesky of
    the core matrix, SVD of the scaled sketch, shift removed from the
    eigenvalues."""

    def __init__(self, n: int, R: int):
        self.omega = np.random.randn(n, R)
        self.S = np.zeros((n, R))

    def rank_one_mix(self, eta: float, weight: float, v: np.ndarray):
        """S <- (1 - eta) S + eta * weight * v (v^T Omega)."""
        self.S *= 1.0 - eta
        if weight != 0.0:
            self.S += (eta * weight) * np.outer(v, v @ self.omega)

    def reconstruct(self) -> Tuple[np.ndarray, np.ndarray]:
        n = self.S.shape[0]
        sigma = 2.2e-12 * np.sqrt(n) * np.linalg.norm(self.S)
        Ss = self.S + sigma * self.omega
        core = self.omega.T @ Ss
        L = np.linalg.cholesky(0.5 * (core + core.T))
        # triangular solve against L^T from the right: B = Ss L^{-T}
        Bm = np.linalg.solve(L, Ss.T).T
        U, s, _ = np.linalg.svd(Bm, full_matrices=False)
        lam = np.maximum(s ** 2 - sigma, 0.0)
        return U, np.diag(lam)


def sketchy_cgal(obj_matrix, constraint_matrices, bias, trace_params, R=1,
                 gap_tol=1e-5, abs_tol=(0.1, 1e-3), num_iter=100,
                 verbose=False, stagnation_window=100, stagnation_tol=1e-6,
                 improve_window=None):
    """CGAL tracking only (sketch, A(X), <C, X>) — O(nR) memory.  The
    reconstruction returns the best rank-R PSD approximation with the
    trace correction spread over the spectrum (paper eq. (6.3)).

    Stagnation guard: break when a 100-iteration window of gap estimates
    is genuinely flat (mean |diff| and std below 1e-6).  The reference
    also declares a no-improvement counter, but its guard is dead code
    (the gap deque is capped at 10 entries while the trigger tests for
    length 100, /root/reference/src/baselines.py:59-67) and the gap
    estimate is too noisy for it — pass ``improve_window`` to enable."""
    C = np.asarray(obj_matrix, dtype=float)
    amap = _ConstraintMap(constraint_matrices)
    b = np.asarray(bias, dtype=float).reshape(-1)
    b_norm = float(np.linalg.norm(b))
    n = C.shape[0]

    sketch = _NystromSketch(n, 2 * R)
    zX = np.zeros_like(b)          # A(X), tracked
    cX = 0.0                       # <C, X>, tracked
    trX = 0.0                      # tr X, tracked
    y = np.zeros_like(b)
    slack = -b
    alpha_0 = 4.0 * amap.frob_sum * trace_params[1] ** 2

    gaps: List[float] = []
    best_gap = np.inf
    no_improve = 0.0
    ncv = 20
    gap = np.inf
    t = 0
    for t in range(1, num_iter):
        beta = np.sqrt(t + 1.0)
        grad_shift = y + beta * slack
        grad = C + amap.adjoint(grad_shift)
        lam, v, ncv = _min_eigpair(grad, ncv)
        alpha_tr = trace_params[0] if lam > 0 else trace_params[1]
        gap = cX + float(grad_shift @ zX) - alpha_tr * lam

        eta = 2.0 / (t + 1.0)
        sketch.rank_one_mix(eta, alpha_tr, v)
        zX = (1.0 - eta) * zX + eta * alpha_tr * amap.on_vector(v)
        cX = (1.0 - eta) * cX + eta * alpha_tr * float(v @ (C @ v))
        trX = (1.0 - eta) * trX + eta * alpha_tr

        slack = zX - b
        feas2 = float(slack @ slack)
        gamma = min(alpha_0 / ((t + 1.0) ** 1.5 * max(feas2, 1e-300)), 1.0)
        y = y + gamma * slack

        feas = np.sqrt(feas2)
        if _stop_test(gap, feas, cX, b_norm, gap_tol, abs_tol):
            break
        # stagnation control: bounded-window gap history (reference keeps
        # the same window/improvement heuristics for comparable runs)
        gaps.append(gap)
        if len(gaps) > stagnation_window:
            gaps.pop(0)
        if len(gaps) == stagnation_window:
            arr = np.asarray(gaps)
            if (np.mean(np.abs(np.diff(arr))) < stagnation_tol
                    and np.std(arr) < stagnation_tol):
                break
            if improve_window is not None:
                if gap < best_gap:
                    best_gap = gap
                    no_improve = max(0.0, no_improve - 0.5)
                else:
                    no_improve += 1.0
                if no_improve >= improve_window:
                    break
        if verbose and t % 1000 == 0:
            print(f"scgal step {t}: gap {gap:.3e} feas {feas2:.3e}",
                  flush=True)

    U, Lam = sketch.reconstruct()
    U = U[:, :R]
    Lam = Lam[:R, :R]
    # spread the tracked-trace deficit uniformly (paper eq. (6.3))
    Lam = Lam + (trX - np.trace(Lam)) * np.eye(R) / R
    X = U @ Lam @ U.T

    lam, _, _ = _min_eigpair(C + amap.adjoint(y + np.sqrt(t + 1.0) * slack),
                             ncv)
    alpha_tr = trace_params[0] if lam > 0 else trace_params[1]
    gap = float(np.sum(C * X) + (y + np.sqrt(t + 1.0) * slack) @ (amap(X))
                - alpha_tr * lam)
    gaps.append(gap)
    return X, list(gaps), {"num_iters": t}


# --- conic glue (delegates to models/conic.py) -------------------------------


def _conic_problem(c_matrix, eq_entries, eq_rhs, ineq_entries, ineq_rhs):
    from ttipm_tpu.models.conic import ConicSDP

    prob = ConicSDP(np.asarray(c_matrix, dtype=float))
    for entries, rhs in zip(eq_entries or [], np.atleast_1d(eq_rhs if eq_rhs is not None else [])):
        prob.add_eq(entries, float(rhs))
    for entries, rhs in zip(ineq_entries or [], np.atleast_1d(ineq_rhs if ineq_rhs is not None else [])):
        prob.add_ge(entries, float(rhs))
    return prob


def solve_scs_psd_max(c_matrix, eq_entries, eq_rhs, ineq_entries=None,
                      ineq_rhs=None, eps=1e-5, verbose=False):
    """SCS cross-check: max <C, X>, <A_i, X> = b_i, <G_j, X> >= h_j, X PSD.
    Constraints are (i, j, coef) entry lists (see models/conic.py).
    Requires the optional ``scs`` package only for the solve itself.
    Parity: /root/reference/psd_system/direct_conic.py:115-187."""
    from ttipm_tpu.models.conic import solve_scs

    prob = _conic_problem(c_matrix, eq_entries, eq_rhs, ineq_entries, ineq_rhs)
    return solve_scs(prob, eps=eps, verbose=verbose)


def solve_sdpa_psd_max(c_matrix, eq_entries, eq_rhs, ineq_entries=None,
                       ineq_rhs=None, option=None):
    """SDPA cross-check via sdpap (optional dependency).
    Parity: /root/reference/psd_system/direct_conic.py:202-271."""
    from ttipm_tpu.models.conic import solve_sdpa

    prob = _conic_problem(c_matrix, eq_entries, eq_rhs, ineq_entries, ineq_rhs)
    return solve_sdpa(prob, option=option)
