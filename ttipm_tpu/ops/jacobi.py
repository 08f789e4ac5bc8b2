"""TPU-safe SVD / symmetric eigendecomposition via Jacobi rotations.

Why this exists (measured on v5e, 2026-08-18, scripts/tpu_probe_*.py):

* TPU XLA emulates f64 as an f32 pair with f32's EXPONENT RANGE: 1e300
  overflows to inf, 1e-300 and even 1e-38 underflow to zero.  Division
  guards must use ``TINY`` (1e-30) instead of 1e-300, and norms of
  matrices with entries beyond ~1e18 overflow when squared.
* The QDWH-based ``jnp.linalg.svd``/``eigh`` NaN on v5e-f64 for matrices
  with exact zero columns, clustered tiny singular values (e.g. a block
  of columns scaled by 1e-15), and mixed-scale spectra — all of which the
  padded-rank TT sweeps produce routinely.  CPU LAPACK handles every such
  case.  The failure is inside the eigh primitive itself (stepwise bisect
  in scripts/tpu_probe_steps.py).

The fix: factorizations built ONLY from primitives that measured robust
on-chip (Householder QR: 2e-15; elementwise arithmetic) — one-sided
Jacobi for the SVD, two-sided Jacobi for symmetric eigh.  Both run as a
single ``lax.while_loop`` program with a static round-robin rotation
schedule (n/2 disjoint rotations per step, n-1 steps per sweep), so a
whole factorization is one XLA dispatch.  Jacobi also delivers *high
relative accuracy* singular values — better than QDWH for the tiny
singular values the TT rounding thresholds (down to 1e-12, reference
cy_src/tt_ops_cy.pyx:188) care about.

``safe_svd``/``safe_eigh`` dispatch per backend at trace time: CPU keeps
LAPACK (faster, equally robust); TPU takes the Jacobi path.

Replaces LAPACK ``gesvd``/``syevd`` (reference cy_src/tt_ops_cy.pyx:205-211,
src/tt_als.py:963-1021) on hardware where XLA's own replacements fail.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TINY", "safe_svd", "safe_eigh", "fast_split_svd",
           "jacobi_svd", "jacobi_eigh", "jacobi_svd_fast"]

# Smallest magnitude that is safely representable AND whose square is
# representable in v5e's f32-pair f64 emulation (min normal ~1e-38; we
# keep squares of guard quotients finite too).
TINY = 1e-30

# Off-diagonal reduction target, relative.  v5e's f32-pair arithmetic
# plateaus at an off-diagonal mass that grows roughly linearly in n
# (measured on-chip: ~1e-14 at n<=64, 4.05e-14 at n=128 after grinding
# the full sweep cap), so the target scales with n to sit just above the
# plateau at every size.  Same shape for true f32 with n*eps_f32 slope.
_JACOBI_TOL = 4e-14
_MAX_SWEEPS = 26

# All rotation/update matmuls run at Precision.HIGHEST: TPU f32 matmuls
# otherwise lower to bf16 passes, which caps achievable orthogonality at
# ~5e-3 (measured) and stalls Jacobi convergence entirely.
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def _tol_for(n: int, dtype) -> float:
    if jnp.dtype(dtype) == jnp.float32:
        return max(4e-6, n * 1.5e-7)
    return max(_JACOBI_TOL, n * 4e-16)


@lru_cache(maxsize=64)
def _round_robin(n: int):
    """Static (n-1, n/2) round-robin pairing schedule (n even): every
    unordered column pair meets exactly once per sweep, each step's pairs
    are disjoint so their rotations commute and apply simultaneously."""
    assert n % 2 == 0
    arr = list(range(n))
    ii, jj = [], []
    for _ in range(n - 1):
        ii.append(arr[: n // 2])
        jj.append(arr[n // 2:][::-1])
        arr = [arr[0]] + [arr[-1]] + arr[1:-1]
    return np.asarray(ii, dtype=np.int32), np.asarray(jj, dtype=np.int32)


@lru_cache(maxsize=64)
def _schedule_onehots(n: int):
    """(n-1, n, n/2) one-hot selector stacks E_i, E_j for the round-robin
    schedule: W @ E_i gathers this step's left columns as a MATMUL.  TPU
    lane-dimension gathers/scatters are slow and Mosaic-hostile; selecting
    and applying the disjoint rotations as matmuls keeps the whole sweep
    on the MXU."""
    si, sj = _round_robin(n)
    steps, p = si.shape
    Ei = np.zeros((steps, n, p))
    Ej = np.zeros((steps, n, p))
    rows = np.arange(p)
    for k in range(steps):
        Ei[k, si[k], rows] = 1.0
        Ej[k, sj[k], rows] = 1.0
    return Ei, Ej


def _svd_rotations(a, b, c, dtype, tol=_JACOBI_TOL):
    """One-sided Jacobi rotation (cs, sn) orthogonalising column pairs
    with Gram entries (a=<wi,wi>, b=<wj,wj>, c=<wi,wj>)."""
    denom = jnp.sqrt(a * b)
    rotate = jnp.abs(c) > tol * denom
    c_safe = jnp.where(rotate, c, jnp.ones_like(c))
    tau = (b - a) / (2.0 * c_safe)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    # overflowing tau (clustered tiny columns) -> t==0 -> identity, which
    # is the correct limit of the rotation angle
    t = jnp.where(jnp.isfinite(t), t, jnp.zeros_like(t))
    cs = 1.0 / jnp.sqrt(1.0 + t * t)
    sn = cs * t
    cs = jnp.where(rotate, cs, jnp.ones_like(cs)).astype(dtype)
    sn = jnp.where(rotate, sn, jnp.zeros_like(sn)).astype(dtype)
    return cs, sn


@partial(jax.jit, static_argnames=())
def _jacobi_orthogonalise(w):
    """Rotate the columns of ``w`` (m, n even) to mutual orthogonality.
    Returns (w_rot, v) with w_rot = w @ v and v exactly orthonormal.

    Each step applies its n/2 disjoint rotations as ONE (n, n) rotation
    matrix G assembled from the schedule one-hots — column-pair selection
    and update both ride the MXU instead of lane gathers/scatters."""
    m, n = w.shape
    tol = _tol_for(n, w.dtype)
    Ei_np, Ej_np = _schedule_onehots(n)
    Ei_all = jnp.asarray(Ei_np, dtype=w.dtype)
    Ej_all = jnp.asarray(Ej_np, dtype=w.dtype)
    v0 = jnp.eye(n, dtype=w.dtype)

    def one_step(k, wv):
        w, v = wv
        Ei = Ei_all[k]
        Ej = Ej_all[k]
        wi = _mm(w, Ei)
        wj = _mm(w, Ej)
        a = jnp.sum(wi * wi, axis=0)
        b = jnp.sum(wj * wj, axis=0)
        c = jnp.sum(wi * wj, axis=0)
        cs, sn = _svd_rotations(a, b, c, w.dtype, tol)
        # G[:, i_p] = cs e_i - sn e_j ; G[:, j_p] = sn e_i + cs e_j
        G = (_mm(Ei * cs, Ei.T) + _mm(Ej * cs, Ej.T)
             + _mm(Ei * sn, Ej.T) - _mm(Ej * sn, Ei.T))
        return _mm(w, G), _mm(v, G)

    def sweep(state):
        w, v, swp, _ = state
        w, v = jax.lax.fori_loop(0, n - 1, one_step, (w, v))
        g = _mm(w.T, w)
        d = jnp.diagonal(g)
        # clamp AFTER the sqrt: TINY**2 itself underflows to 0 in v5e's
        # f32-pair f64 (min normal ~1e-38) and 0/0 here NaN'd the loop
        # condition, silently stopping after one sweep
        scale = jnp.maximum(jnp.sqrt(jnp.abs(d[:, None] * d[None, :])), TINY)
        off = jnp.abs(g - jnp.diag(d)) / scale
        return w, v, swp + 1, jnp.max(off)

    def keep_going(state):
        _, _, swp, off = state
        return (swp < _MAX_SWEEPS) & (off > tol)

    w, v, _, _ = jax.lax.while_loop(
        keep_going, sweep, (w, v0, jnp.int32(0), jnp.asarray(jnp.inf, w.dtype))
    )
    return w, v


def _f32_prerotation(r_pad, dtype):
    """f32 Jacobi pre-pass: returns an exactly-orthonormal (f64) v0 that
    orthogonalises r_pad's columns to ~f32 level.  Warm-starting the f64
    polish from it cuts its quadratic-convergence sweeps from ~9-26 cold
    to ~2-4.  Underflowed tiny/zero f32 columns simply skip their
    rotations (guarded) and are left for the f64 polish."""
    _, v32 = _jacobi_orthogonalise(r_pad.astype(jnp.float32))
    v0, _ = jnp.linalg.qr(v32.astype(dtype))
    return v0


def _jacobi_factor_tall(a):
    """Shared tall-matrix (m >= n) pipeline: a/scale == (q @ qw) @ rw @
    v_s.T with q, qw, v_s (exactly) orthonormal and rw upper-triangular,
    rows ordered by descending norm (~ the singular values)."""
    m, n = a.shape
    scale = jnp.max(jnp.abs(a))
    scale = jnp.where(jnp.isfinite(scale) & (scale > 0), scale,
                      jnp.ones((), a.dtype))
    q, r = jnp.linalg.qr(a / scale)
    pad = n % 2
    r_pad = jnp.pad(r, ((0, 0), (0, pad))) if pad else r
    v0 = _f32_prerotation(r_pad, a.dtype)
    w, v = _jacobi_orthogonalise(_mm(r_pad, v0))
    v = _mm(v0, v)
    # sort columns by descending norm; a padded column is exactly zero
    # (rotations against it are skipped) and sorts last
    norms2 = jnp.sum(w * w, axis=0)
    order = jnp.argsort(-norms2)[:n]
    w_s = w[:, order]
    v_s = v[:n, order] if pad else v[:, order]
    # Householder-QR completion: orthonormal basis even for zero columns
    qw, rw = jnp.linalg.qr(w_s)
    return q, qw, rw, v_s, scale


def jacobi_svd(a):
    """``u, s, vt`` with ``u @ (s[:, None] * vt) == a`` to arithmetic
    precision and ``u`` EXACTLY orthonormal in both orientations: for a
    tall input u comes from composed Householder QRs; for a wide input it
    is the Jacobi rotation product, orthonormal by construction even in
    the nullspace (XLA's QDWH SVD NaNs there on v5e f64).  vt rows are
    unit-normalised; rows at s == 0 are zero, not orthonormal completions.
    """
    m, n = a.shape
    if m >= n:
        q, qw, rw, v_s, scale = _jacobi_factor_tall(a)
        u = q @ qw
        s = jnp.linalg.norm(rw, axis=1)
        coeff = rw @ v_s.T  # (n, n)
        vt = coeff / jnp.maximum(s, TINY)[:, None]
        return u, s * scale, vt
    # wide input: aT = (q @ qw) @ rw @ v_sT, hence
    #             a  = v_s @ rwT @ (q @ qw)T.
    q, qw, rw, v_s, scale = _jacobi_factor_tall(a.T)
    u = v_s  # (m, m), exactly orthonormal
    s = jnp.linalg.norm(rw, axis=0)  # == row norms of rw.T == norms of coeff rows
    coeff = rw.T @ (q @ qw).T  # (m, n)
    vt = coeff / jnp.maximum(s, TINY)[:, None]
    return u, s * scale, vt


def _jacobi_factor_tall_fast(a):
    """Mixed-precision tall pipeline for FIXED-RANK splits: the Jacobi
    rotations run in f32 (native MXU speed instead of f64 emulation), the
    rotation product is re-orthonormalised EXACTLY in f64 by Householder
    QR, and the final split is exact f64 by construction.  Only the
    singular-value ESTIMATES carry f32 accuracy (~1e-7 relative): fine
    for keep-the-top-R truncations, not for eps-threshold rounding."""
    m, n = a.shape
    scale = jnp.max(jnp.abs(a))
    scale = jnp.where(jnp.isfinite(scale) & (scale > 0), scale,
                      jnp.ones((), a.dtype))
    q, r = jnp.linalg.qr(a / scale)
    pad = n % 2
    r_pad = jnp.pad(r, ((0, 0), (0, pad))) if pad else r
    v64 = _f32_prerotation(r_pad, a.dtype)
    w = _mm(r_pad, v64)
    norms2 = jnp.sum(w * w, axis=0)
    order = jnp.argsort(-norms2)[:n]
    w_s = w[:, order]
    v_s = v64[:n, order] if pad else v64[:, order]
    qw, rw = jnp.linalg.qr(w_s)
    return q, qw, rw, v_s, scale


def jacobi_svd_fast(a):
    """Fixed-rank-split SVD: exact f64 factorization with f32-accurate
    singular-value ordering (see _jacobi_factor_tall_fast)."""
    m, n = a.shape
    if m >= n:
        q, qw, rw, v_s, scale = _jacobi_factor_tall_fast(a)
        u = q @ qw
        s = jnp.linalg.norm(rw, axis=1)
        coeff = rw @ v_s.T
        vt = coeff / jnp.maximum(s, TINY)[:, None]
        return u, s * scale, vt
    q, qw, rw, v_s, scale = _jacobi_factor_tall_fast(a.T)
    u = v_s
    s = jnp.linalg.norm(rw, axis=0)
    coeff = rw.T @ (q @ qw).T
    vt = coeff / jnp.maximum(s, TINY)[:, None]
    return u, s * scale, vt


def _gram_split_svd(a):
    """f32 split SVD via the Gram eigendecomposition: the basis factor
    ``u`` is EXACTLY orthonormal on both branches and garbage-free at
    zero singular values.

    Why not the native lowering: on TPU, ``jnp.linalg.svd`` f32 SIGABRTs
    the v5e compiler at small narrow shapes ((32,12) crashes, (96,96)
    compiles); on CPU, XLA's f32 svd custom call returns ~1e26-magnitude
    LEFT singular vectors for exactly-zero singular values (measured
    2026-08-19 on a rank-3 (4,24) matrix; numpy's LAPACK on the same
    bytes returns a clean orthonormal completion).  Those garbage basis
    columns overflow the fused sweeps' phi products two sweeps later, so
    every f32 split goes through this construction on every backend.

    Contract: u exactly orthonormal (QR- or eigh-produced, including at
    s == 0), u @ (s*vt) == a to arithmetic precision, vt rows at
    s <= eps32*s_max are exactly ZERO (not orthonormal completions).
    Only the singular-value ESTIMATES carry the Gram squaring's accuracy
    loss (~sqrt(eps_f32) for the smallest), which split-rank decisions
    tolerate."""
    m, n = a.shape
    if m < n:
        # wide: left singular vectors are eigenvectors of the small Gram
        # a a^T — eigh returns an exactly orthonormal V, no division.
        G = a @ a.T                          # (m, m)
        delta = jnp.trace(G) / m * 1e-6 + TINY
        w, V = jnp.linalg.eigh(
            0.5 * (G + G.T) + delta * jnp.eye(m, dtype=G.dtype)
        )
        w = jnp.flip(w, axis=0) - delta
        u = jnp.flip(V, axis=1)              # exactly orthonormal
        s = jnp.sqrt(jnp.maximum(w, 0.0))
        coeff = u.T @ a                      # u @ coeff == a exactly
    else:
        G = a.T @ a                          # (n, n) Gram
        # Diagonal shift before eigh: the TPU QDWH lowering is fragile on
        # exact-zero columns / clustered tiny eigenvalues (the padded TT
        # sweeps produce both routinely); the shift leaves eigenvectors
        # unchanged and is subtracted from the estimates afterwards.
        delta = jnp.trace(G) / n * 1e-6 + TINY
        w, V = jnp.linalg.eigh(
            0.5 * (G + G.T) + delta * jnp.eye(n, dtype=G.dtype)
        )
        w = jnp.flip(w, axis=0) - delta
        V = jnp.flip(V, axis=1)
        s = jnp.sqrt(jnp.maximum(w, 0.0))
        B = a @ V                            # columns ~ U * s, span range(a)
        from ttipm_tpu.ops.kernels import qr_reduced
        u, _ = qr_reduced(B)                 # exactly orthonormal
        coeff = u.T @ a                      # u @ coeff == a exactly
    # rows of coeff at s ~ 0 are eps-size noise; dividing them by TINY
    # manufactures ~1e24 garbage — zero them below the f32 noise cutoff
    cutoff = 4e-7 * jnp.max(s) + TINY
    vt = jnp.where((s > cutoff)[:, None],
                   coeff / jnp.maximum(s, TINY)[:, None],
                   jnp.zeros_like(coeff))
    return u, s, vt


def fast_split_svd(a, full_matrices: bool = False):
    """SVD for fixed-rank basis splits (fused sweeps): LAPACK on CPU f64,
    the mixed-precision Jacobi pipeline on TPU f64, the Gram-eigh split
    for f32 on EVERY backend (both native f32 lowerings are broken: the
    TPU one crashes the compiler, the XLA:CPU one returns garbage basis
    columns at zero singular values — see _gram_split_svd).  The split
    u @ (s*vt) == a is exact and u exactly orthonormal on every path."""
    assert not full_matrices
    if not _use_jacobi(a.dtype):
        if a.dtype == jnp.float32 or _targets_tpu():
            return _gram_split_svd(a)
        return jnp.linalg.svd(a, full_matrices=False)
    return jacobi_svd_fast(a)


def safe_svd(a, full_matrices: bool = False):
    """Drop-in for ``jnp.linalg.svd(a, full_matrices=False)`` that cannot
    NaN on v5e f64 emulation (Jacobi) and cannot crash the v5e compiler
    at f32 (Gram-eigh split).  On CPU this is LAPACK.  Contract: u
    orthonormal (exactly, including nullspace directions),
    u @ (s[:, None] * vt) == a to arithmetic precision, s >= 0 descending.
    vt rows at s == 0 are zero rather than orthonormal completions."""
    assert not full_matrices, "safe_svd supports full_matrices=False only"
    if not _use_jacobi(a.dtype):
        if a.dtype == jnp.float32 or _targets_tpu():
            return _gram_split_svd(a)
        return jnp.linalg.svd(a, full_matrices=False)
    return jacobi_svd(a)


# --- symmetric eigendecomposition -----------------------------------------


@partial(jax.jit, static_argnames=())
def _jacobi_eigh_core(a):
    """Cyclic two-sided Jacobi for a symmetric (n, n) matrix, n even.
    Returns (w ascending, V) with a == V @ diag(w) @ V.T."""
    n = a.shape[0]
    tol = _tol_for(n, a.dtype)
    sched_i, sched_j = _round_robin(n)
    si = jnp.asarray(sched_i)
    sj = jnp.asarray(sched_j)
    v0 = jnp.eye(n, dtype=a.dtype)

    def one_step(k, av):
        a, v = av
        ii, jj = si[k], sj[k]
        aii = a[ii, ii]
        ajj = a[jj, jj]
        aij = a[ii, jj]
        # rotation zeroing a_ij (Golub & Van Loan 8.4)
        rotate = jnp.abs(aij) > tol * jnp.sqrt(
            jnp.abs(aii * ajj) + TINY
        )
        aij_safe = jnp.where(rotate, aij, jnp.ones_like(aij))
        tau = (ajj - aii) / (2.0 * aij_safe)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(jnp.isfinite(t), t, jnp.zeros_like(t))
        cs = 1.0 / jnp.sqrt(1.0 + t * t)
        sn = cs * t
        cs = jnp.where(rotate, cs, jnp.ones_like(cs))
        sn = jnp.where(rotate, sn, jnp.zeros_like(sn))
        # column rotation
        ai, aj = a[:, ii], a[:, jj]
        a = a.at[:, ii].set(cs * ai - sn * aj).at[:, jj].set(sn * ai + cs * aj)
        # row rotation (pairs disjoint -> commuting updates)
        ari, arj = a[ii, :], a[jj, :]
        a = a.at[ii, :].set(cs[:, None] * ari - sn[:, None] * arj)
        a = a.at[jj, :].set(sn[:, None] * ari + cs[:, None] * arj)
        vi, vj = v[:, ii], v[:, jj]
        v = v.at[:, ii].set(cs * vi - sn * vj).at[:, jj].set(sn * vi + cs * vj)
        return a, v

    def sweep(state):
        a, v, swp, _ = state
        a, v = jax.lax.fori_loop(0, n - 1, one_step, (a, v))
        d = jnp.abs(jnp.diagonal(a))
        # see _jacobi_orthogonalise: clamp after sqrt (TINY**2 underflows
        # to 0 on v5e f64 emulation -> 0/0 -> NaN loop exit)
        scale = jnp.maximum(jnp.sqrt(d[:, None] * d[None, :]), TINY)
        off = jnp.abs(a - jnp.diag(jnp.diagonal(a))) / scale
        return a, v, swp + 1, jnp.max(off)

    def keep_going(state):
        _, _, swp, off = state
        return (swp < _MAX_SWEEPS) & (off > tol)

    a, v, _, _ = jax.lax.while_loop(
        keep_going, sweep, (a, v0, jnp.int32(0), jnp.asarray(jnp.inf, a.dtype))
    )
    w = jnp.diagonal(a)
    order = jnp.argsort(w)
    return w[order], v[:, order]


def jacobi_eigh(a):
    """Symmetric eigendecomposition via two-sided Jacobi (ascending)."""
    n = a.shape[0]
    scale = jnp.max(jnp.abs(a))
    scale = jnp.where(jnp.isfinite(scale) & (scale > 0), scale,
                      jnp.ones((), a.dtype))
    an = a / scale
    if n % 2:
        # pad with a decoupled zero row/column: its off-diagonals are
        # exactly zero, so rotations against it are always skipped and
        # (eigenvalue 0, eigenvector e_n) passes through untouched
        an = jnp.pad(an, ((0, 1), (0, 1)))
        w, v = _jacobi_eigh_core(an)
        # drop the padded eigenpair: it is the one whose eigenvector is
        # (numerically exactly) e_n — rotations against the zero row are
        # skipped, so v[n] stays e_n^T in exactly one column
        pad_col = jnp.argmax(jnp.abs(v[n, :]))
        keep = jnp.arange(n + 1)
        keep = jnp.where(keep < pad_col, keep, keep + 1)[:n]
        return w[keep] * scale, v[:n, keep]
    w, v = _jacobi_eigh_core(an)
    return w * scale, v


def safe_eigh(a):
    """Drop-in for ``jnp.linalg.eigh`` of a real symmetric matrix that
    cannot NaN on v5e f64 (two-sided Jacobi on TPU, LAPACK on CPU)."""
    if not _use_jacobi(a.dtype):
        return jnp.linalg.eigh(a)
    return jacobi_eigh(a)


# --- backend dispatch -------------------------------------------------------

_FORCE_JACOBI = None  # None = auto (by backend), True/False = override


def force_jacobi(flag):
    """Test hook: force (True) or forbid (False) the Jacobi path; None
    restores backend auto-detection."""
    global _FORCE_JACOBI
    _FORCE_JACOBI = flag


def _targets_tpu() -> bool:
    """Whether traced programs will run on a TPU (honours the force hook,
    which the offload trace context and CI coverage set)."""
    if _FORCE_JACOBI is not None:
        return _FORCE_JACOBI
    return jax.default_backend() == "tpu"


def _use_jacobi(dtype=None) -> bool:
    # The Jacobi kernels exist because the TPU's QDWH svd/eigh NaN under
    # f32-pair f64 EMULATION; native f32 lowerings are TPU-safe and their
    # HLO is ~10x smaller (measured: a 6-sweep fused solve program took
    # 19 min to compile with in-kernel Jacobi rotation loops).  So f32
    # operands always take the native path, even under force.
    if dtype is not None and jnp.dtype(dtype) != jnp.float64:
        return False
    if _FORCE_JACOBI is not None:
        return _FORCE_JACOBI
    return jax.default_backend() == "tpu"


from contextlib import contextmanager


@contextmanager
def forced(flag):
    """Scoped force_jacobi: offloaded fused programs trace under
    forced(True) so their SVD/eigh lower to the Jacobi kernels even when
    the host default backend is CPU."""
    global _FORCE_JACOBI
    old = _FORCE_JACOBI
    _FORCE_JACOBI = flag
    try:
        yield
    finally:
        _FORCE_JACOBI = old
