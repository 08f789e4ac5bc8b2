"""Pallas TPU kernels for the hot projected-KKT contractions.

The reference's hottest native code is a zero-allocation Cython BLAS
pipeline computing the projected block operator application
``y = (phi_l . A . phi_r) x`` as three dgemms with cache-friendly
transpose-reshapes (parity: /root/reference/cy_src/lgmres_cy.pyx:126-153,
203-377).  ``kkt_block_matvec`` is the TPU-native equivalent: one Pallas
kernel holding every operand in VMEM and driving the same three-matmul
chain through the MXU.

Status of the contraction kernels: validated in interpret mode (the test
suite checks them against the fused-einsum XLA path).  On the real TPU,
Mosaic rejects both — measured op-by-op on a v5e (2026-08-19, probe
scripts under /tmp/chip_jobs): in-kernel cross-lane reshapes
((1,1024)->(32,32) and (6,32,32)->(6,1024)) and >2-D relayout transposes
are refused, while 2-D dots (even small/unaligned, e.g. (24,40)@(40,48)),
2-D transposes, lead-dim indexing with scalar*2-D accumulation, and
cross-lane reductions all compile and run.  The Kronecker interleave
``lmrn,LR -> (lmL),(rnR)`` is exactly a cross-lane relayout, so the fused
einsum (``*_xla``) stays the production TPU path for these contractions —
XLA:TPU maps them onto the MXU directly and fuses the relayout epilogue.

``panel_qr`` below is the kernel that DOES fit Mosaic's op set: a
VMEM-resident masked Householder QR for the (4r, r) bond panels that the
rounding/orthogonalisation sweeps factorise hundreds of times per IPM
iteration (reference hot path: tt_rl_orthogonalise,
/root/reference/cy_src/tt_ops_cy.pyx:132-159).  XLA:TPU's blocked
Householder QR at these sizes costs ~1 ms on a v5e; the kernel keeps the
panel in VMEM and uses only probe-validated ops (2-D reductions,
broadcasts, masked rank-1 updates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["kkt_block_matvec", "kkt_block_matvec_xla",
           "schur_assemble", "schur_assemble_xla"]


def kkt_block_matvec_xla(phi_l, A_core, phi_r, x):
    """Reference XLA path: y[l,m,L] = phi_l[l,s,r] A[s,m,n,S] phi_r[L,S,R] x[r,n,R]."""
    return jnp.einsum("lsr,smnS,LSR,rnR->lmL", phi_l, A_core, phi_r, x)


def _kkt_matvec_kernel(phil_ref, a_ref, phir_ref, x_ref, out_ref):
    phil = phil_ref[:]
    a = a_ref[:]
    phir = phir_ref[:]
    x = x_ref[:]
    l, s, r = phil.shape
    s2, m, n, S = a.shape
    L, S2, R = phir.shape

    # dgemm 1: t1[l,s,n,R] = sum_r phil[l,s,r] x[r,n,R]
    t1 = jnp.dot(
        phil.reshape(l * s, r), x.reshape(r, n * R),
        preferred_element_type=jnp.float32 if phil.dtype == jnp.float32 else None,
    ).reshape(l, s, n, R)
    # transpose-reshape: group the contracted (s, n) axes
    t1 = jnp.transpose(t1, (1, 2, 0, 3)).reshape(s * n, l * R)
    # dgemm 2: t2[m,S, l,R] = sum_{s,n} A[s,m,n,S] t1[s,n, l,R]
    a2 = jnp.transpose(a, (1, 3, 0, 2)).reshape(m * S, s * n)
    t2 = jnp.dot(a2, t1).reshape(m, S, l, R)
    # transpose-reshape: bring (l, m) out, group (S, R)
    t2 = jnp.transpose(t2, (2, 0, 1, 3)).reshape(l * m, S * R)
    # dgemm 3: y[l,m,L] = sum_{S,R} t2[l,m, S,R] phir[L, S,R]
    y = jnp.dot(t2, phir.reshape(L, S2 * R).T).reshape(l, m, L)
    out_ref[:] = y


@functools.partial(jax.jit, static_argnames=("interpret",))
def kkt_block_matvec(phi_l, A_core, phi_r, x, interpret: bool = False):
    """Pallas projected-KKT block matvec (three MXU matmuls in VMEM)."""
    l = phi_l.shape[0]
    m = A_core.shape[1]
    L = phi_r.shape[0]
    return pl.pallas_call(
        _kkt_matvec_kernel,
        out_shape=jax.ShapeDtypeStruct((l, m, L), x.dtype),
        interpret=interpret,
    )(phi_l, A_core, phi_r, x)


# ---------------------------------------------------------------------------
# Schur assembly kernel: B[(l,m,L),(r,n,R)] = phi_l[l,s,r] A[s,m,n,S]
# phi_r[L,S,R] — the hottest contraction of the fused local solves
# (solvers/fused.py::_proj; reference hot loop cy_src/lgmres_cy.pyx:126-153).
#
# Design: stage 1 (the s-contraction) is tiny and runs in XLA outside;
# the kernel fuses the big S-contraction matmul WITH the 6-D Kronecker
# interleave that XLA otherwise materialises as a separate full-output
# relayout pass over HBM (134 MB in f64 at R=32).
# ---------------------------------------------------------------------------


def schur_assemble_xla(phi_l, A_core, phi_r):
    """Reference XLA path (one einsum + reshape)."""
    m = phi_l.shape[0] * A_core.shape[1] * phi_r.shape[0]
    return jnp.einsum("lsr,smnS,LSR->lmLrnR", phi_l, A_core, phi_r).reshape(m, m)


def _schur_kernel(w_ref, p_ref, o_ref, *, l, n, r, L, R):
    t = jnp.dot(w_ref[:], p_ref[:], preferred_element_type=jnp.float32)
    t = t.reshape(l, n, r, n, L, R)          # (l, m, r, n, L, R)
    t = jnp.transpose(t, (0, 1, 4, 2, 3, 5))  # -> (l, m, L, r, n, R)
    o_ref[:] = t.reshape(l * n * L, r * n * R)


@functools.partial(jax.jit, static_argnames=("interpret",))
def schur_assemble(phi_l, A_core, phi_r, interpret: bool = False):
    """Pallas Schur assembly: one MXU matmul + in-kernel interleave.

    Returns B as (l*m*L, r*n*R) like schur_assemble_xla.  f32 is the
    production dtype (the fused TPU profile); other dtypes are cast in
    and the result cast back.
    """
    l, s, r = phi_l.shape
    _, mdim, n, S = A_core.shape
    L, _, R = phi_r.shape
    assert mdim == n
    dt = phi_l.dtype
    W = jnp.einsum("lsr,smnS->lmrnS", phi_l, A_core)          # stage 1 (XLA)
    Wf = W.reshape(l * mdim * r * n, S).astype(jnp.float32)
    Pf = jnp.transpose(phi_r, (1, 0, 2)).reshape(S, L * R).astype(jnp.float32)
    msize = l * mdim * L
    nsize = r * n * R
    out = pl.pallas_call(
        functools.partial(_schur_kernel, l=l, n=n, r=r, L=L, R=R),
        out_shape=jax.ShapeDtypeStruct((msize, nsize), jnp.float32),
        interpret=interpret,
    )(Wf, Pf)
    return out.astype(dt)


# ---------------------------------------------------------------------------
# Panel QR: VMEM-resident masked Householder factorization of a tall-skinny
# bond panel.  TPU-legal by construction: every step is a 2-D reduction,
# broadcast, or rank-1 update — no lane slicing, no cross-lane reshapes
# (both Mosaic-rejected, see module docstring).  Columns are addressed with
# one-hot masks built from broadcasted_iota; the column loop is unrolled at
# trace time (n is static).
# ---------------------------------------------------------------------------


def _panel_qr_kernel(a_ref, q_ref, r_ref, *, m, n):
    f32 = a_ref.dtype
    A = a_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    tiny = jnp.asarray(1e-30, f32)

    vs = []
    betas = []
    for j in range(n):
        oh_c = (col == j).astype(f32)              # (1, n) one-hot column j
        oh_r = (row == j).astype(f32)              # (m, 1) one-hot row j
        below = (row >= j).astype(f32)             # rows j..m-1
        x = jnp.sum(A * oh_c, axis=1, keepdims=True)   # (m, 1) column j
        xm = x * below
        # all scalars kept (1, 1): Mosaic rejects 0-D intermediates
        xj = jnp.sum(xm * oh_r, axis=0, keepdims=True)     # (1, 1) A[j, j]
        sigma2 = jnp.sum(xm * xm, axis=0, keepdims=True)   # (1, 1)
        sigma = jnp.sqrt(sigma2)
        # branch-free selects: jnp.where on (1,1) operands SIGABRTs the
        # v5e Mosaic compiler (probe-bisected 2026-08-19); comparison
        # masks + arithmetic compile fine
        sign = (xj >= 0).astype(f32) * 2.0 - 1.0
        alpha = -sign * sigma                       # (1, 1)
        v = xm - alpha * oh_r                      # (m, 1) reflector
        vtv = jnp.sum(v * v, axis=0, keepdims=True)
        beta = (vtv > tiny).astype(f32) * 2.0 / jnp.maximum(vtv, tiny)
        w = jnp.sum(v * A, axis=0, keepdims=True)  # (1, n) = v^T A
        A = A - (beta * v) * w                     # rank-1 update
        vs.append(v)
        betas.append(beta)

    # R: the first n rows of the eliminated panel, exact zeros below diag
    upper = (row < n).astype(f32)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (m, n), 0) <=
           jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)).astype(f32)
    r_ref[:] = (A * tri * upper).astype(r_ref.dtype)

    # Q (reduced): apply reflectors in reverse to the first n columns of I
    Q = ((row == col) & (col < n)).astype(f32)     # (m, n) = I[:, :n]
    for j in range(n - 1, -1, -1):
        t = jnp.sum(vs[j] * Q, axis=0, keepdims=True)  # (1, n)
        Q = Q - (betas[j] * vs[j]) * t
    q_ref[:] = Q.astype(q_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def panel_qr(a, interpret: bool = False):
    """Reduced QR of a tall panel via one VMEM-resident Pallas kernel.

    Same contract as ``jnp.linalg.qr(a, mode="reduced")`` up to column
    signs: q (m, n) with orthonormal columns, r (n, n) upper triangular,
    q @ r == a.  Rows are padded to a multiple of 8 (zero rows pass
    through Householder QR exactly: QR([A; 0]) == ([Q; 0], R)).
    Intended envelope: the rounding sweeps' bond panels (m <= ~512,
    n <= 128); falls back to jnp.linalg.qr outside it via qr_reduced.
    """
    m, n = a.shape
    mp = max(8, -(-m // 8) * 8)
    ap = jnp.pad(a, ((0, mp - m), (0, 0))) if mp != m else a
    q, r = pl.pallas_call(
        functools.partial(_panel_qr_kernel, m=mp, n=n),
        out_shape=(jax.ShapeDtypeStruct((mp, n), a.dtype),
                   jax.ShapeDtypeStruct((mp, n), a.dtype)),
        interpret=interpret,
    )(ap)
    return q[:m], r[:n]


def qr_reduced(a, interpret: bool = False):
    """Reduced QR dispatch: the Pallas panel kernel inside its validated
    envelope on TPU-bound f32 traces, ``jnp.linalg.qr`` everywhere else.
    Under heterogeneous offload the HOST TT algebra still traces for the
    CPU backend, so the Pallas path additionally requires the trace to
    target a TPU (the offload programs' forced context)."""
    m, n = a.shape
    if (a.dtype == jnp.float32 and m >= n and m <= 512 and n <= 128
            and _panel_qr_enabled()):
        from ttipm_tpu.ops.jacobi import _targets_tpu

        if interpret or _targets_tpu():
            return panel_qr(a, interpret=interpret)
    q, r = jnp.linalg.qr(a, mode="reduced")
    return q, r


_PANEL_QR = False
_PANEL_QR_SUSPENDED = 0


def set_panel_qr(flag: bool) -> None:
    """Route qr_reduced through the Pallas panel kernel (TPU f32 profile)."""
    global _PANEL_QR
    _PANEL_QR = bool(flag)


class panel_qr_disabled:
    """Trace-time suspension of the Pallas QR dispatch.  The vmapped
    (seeds-batched) sweep programs cannot use the panel kernel — Mosaic
    fails to legalize the batched pallas_call ('func.return' legalization
    error, measured on v5e) — so the batch drivers trace under this
    context and take the XLA QR instead."""

    def __enter__(self):
        global _PANEL_QR_SUSPENDED
        _PANEL_QR_SUSPENDED += 1
        return self

    def __exit__(self, *exc):
        global _PANEL_QR_SUSPENDED
        _PANEL_QR_SUSPENDED -= 1
        return False


def _panel_qr_enabled() -> bool:
    return _PANEL_QR and not _PANEL_QR_SUSPENDED


# ---------------------------------------------------------------------------
# Panel Cholesky: VMEM-resident column-elimination factorization of an SPD
# matrix (the fused Schur chain's hot factorization: L_Z blocks and the
# eigen shrink pencil, solvers/fused.py:207, fused_eigen.py:65).  Same
# Mosaic-legal construction discipline as panel_qr: one-hot column masks,
# (1, 1) scalars, rank-1 updates; the column loop unrolls at trace time.
# Parity target: cy_src/lgmres_cy.pyx:28-192's dense micro-kernels /
# LAPACK dpotrf in the reference's local solves (src/tt_ipm.py:196-223).
# ---------------------------------------------------------------------------


def _panel_cholesky_kernel(a_ref, l_ref, *, n):
    f32 = a_ref.dtype
    A = a_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    tiny = jnp.asarray(1e-30, f32)

    L = jnp.zeros((n, n), dtype=f32)
    for j in range(n):
        oh_c = (col == j).astype(f32)                  # (1, n)
        oh_r = (row == j).astype(f32)                  # (n, 1)
        col_j = jnp.sum(A * oh_c, axis=1, keepdims=True)   # (n, 1)
        ajj = jnp.sum(col_j * oh_r, axis=0, keepdims=True)  # (1, 1)
        piv = jnp.sqrt(jnp.maximum(ajj, tiny))
        below = (row > j).astype(f32)
        l_j = (col_j / piv) * below + piv * oh_r       # (n, 1) L[:, j]
        L = L + l_j * oh_c                             # write column j
        # (n,1)->(1,n) via 2-D transpose (Mosaic-supported; cross-lane
        # reshapes are not)
        A = A - l_j * jnp.transpose(l_j)               # SYRK rank-1 update
    l_ref[:] = L.astype(l_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def panel_cholesky(a, interpret: bool = False):
    """Lower Cholesky factor of an SPD matrix via one VMEM-resident Pallas
    kernel; contract of ``jnp.linalg.cholesky``.  Envelope: n <= 256 f32
    (the fused local Schur blocks); dispatch via ``cholesky_lower``."""
    n = a.shape[0]
    np_ = max(8, -(-n // 8) * 8)
    if np_ != n:
        # identity-pad: chol(blockdiag(A, I)) == blockdiag(chol(A), I)
        pad = jnp.eye(np_, dtype=a.dtype).at[:n, :n].set(a)
        a = pad
    L = pl.pallas_call(
        functools.partial(_panel_cholesky_kernel, n=np_),
        out_shape=jax.ShapeDtypeStruct((np_, np_), a.dtype),
        interpret=interpret,
    )(a)
    return L[:n, :n]


def cholesky_lower(a, interpret: bool = False):
    """Cholesky dispatch.  Hardware verdict (v5e, measured 2026-08-20,
    marginal device time via scan deltas): the Pallas column-elimination
    kernel runs ~39 us at n=64 while XLA's blocked cholesky is at the
    ~1 us noise floor — XLA's factorization is already MXU-blocked, so
    unlike the tall-skinny QR there is no win to harvest and the Pallas
    path stays OFF by default (TTIPM_PALLAS_CHOL=1 forces it; the kernel
    remains correctness-validated on hardware, rel diff 9.5e-8 vs XLA)."""
    import os

    n = a.shape[0]
    if (a.dtype == jnp.float32 and a.ndim == 2 and n <= 256
            and os.environ.get("TTIPM_PALLAS_CHOL") == "1"):
        from ttipm_tpu.ops.jacobi import _targets_tpu

        if interpret or _targets_tpu():
            return panel_cholesky(a, interpret=interpret)
    return jnp.linalg.cholesky(a)
