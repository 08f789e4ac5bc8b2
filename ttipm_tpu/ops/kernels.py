"""Pallas TPU kernels for the hot projected-KKT contractions.

The reference's hottest native code is a zero-allocation Cython BLAS
pipeline computing the projected block operator application
``y = (phi_l . A . phi_r) x`` as three dgemms with cache-friendly
transpose-reshapes (parity: /root/reference/cy_src/lgmres_cy.pyx:126-153,
203-377).  ``kkt_block_matvec`` is the TPU-native equivalent: one Pallas
kernel holding every operand in VMEM and driving the same three-matmul
chain through the MXU.

Status: validated in interpret mode (the test suite checks it against
the fused-einsum XLA path).  On the real TPU, Mosaic currently rejects
this kernel: the chain needs either multi-dim-contracting matmuls
("lhs contracting dims must be of size 1") or 4-D relayout transposes
between the dgemms, neither of which Mosaic supports for these small
unaligned shapes.  ``kkt_block_matvec_xla`` — the same contraction as one
fused einsum — is therefore the production TPU path (XLA:TPU maps it onto
the MXU directly); the Pallas variant is kept as the starting point for a
tiled VMEM-resident version once shapes are padded to (8,128) lanes.
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
