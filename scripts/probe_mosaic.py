"""Empirical Mosaic-legality probe for the projected-KKT kernels.

Runs a battery of candidate Pallas constructs at production shapes
(R in {8,16,32}, rA in {6,30}, n=4) on the real TPU with interpret=False
and reports accept/reject + timing vs the XLA einsum. The surviving
constructs define the production kernel in ttipm_tpu/ops/kernels.py.

Usage:  JAX_PLATFORMS= python scripts/probe_mosaic.py
"""

import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _rand(*shape, dtype=jnp.float32):
    return jnp.asarray(np.random.RandomState(0).randn(*shape), dtype=dtype)


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e6  # us


def probe(name, build):
    try:
        fn, args, ref = build()
        out = jax.block_until_ready(fn(*args))
        err = float(jnp.max(jnp.abs(out - ref))) / max(
            float(jnp.max(jnp.abs(ref))), 1e-30)
        us = timeit(fn, *args)
        print(f"[OK]   {name}: rel_err {err:.2e}  {us:.1f} us")
        return us
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return None


# --- candidate 1: existing 3-dot matvec chain (unaligned) -------------------

def c1_matvec_unaligned(R=32, rA=30, n=4):
    from ttipm_tpu.ops.kernels import kkt_block_matvec, kkt_block_matvec_xla

    phil, a, phir, x = (_rand(R, rA, R), _rand(rA, n, n, rA),
                        _rand(R, rA, R), _rand(R, n, R))

    def build():
        ref = kkt_block_matvec_xla(phil, a, phir, x)
        return (lambda *t: kkt_block_matvec(*t, interpret=False),
                (phil, a, phir, x), ref)

    return build


# --- candidate 2: leading-dim-only transpose inside a kernel ----------------

def c2_leading_transpose(a=4, b=8, c=16, d=128):
    x = _rand(a, b, c, d)

    def build():
        def kern(x_ref, o_ref):
            o_ref[:] = jnp.transpose(x_ref[:], (0, 2, 1, 3))

        fn = lambda t: pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((a, c, b, d), t.dtype),
        )(t)
        return jax.jit(fn), (x,), jnp.transpose(x, (0, 2, 1, 3))

    return build


# --- candidate 3: sublane-group transpose (r,L swap at lane=32) --------------

def c3_sublane32(l=32, r=32, L=32, R=32):
    x = _rand(l, r, L, R)

    def build():
        def kern(x_ref, o_ref):
            o_ref[:] = jnp.transpose(x_ref[:], (0, 2, 1, 3))

        fn = lambda t: pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((l, L, r, R), t.dtype),
        )(t)
        return jax.jit(fn), (x,), jnp.transpose(x, (0, 2, 1, 3))

    return build


# --- candidate 4: 2D transpose 128x128 --------------------------------------

def c4_t2d(m=128, n=128):
    x = _rand(m, n)

    def build():
        def kern(x_ref, o_ref):
            o_ref[:] = x_ref[:].T

        fn = lambda t: pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((n, m), t.dtype),
        )(t)
        return jax.jit(fn), (x,), x.T

    return build


# --- candidate 5: reshape crossing lanes (l*s,nR)->(s*n,l*R) -----------------

def c5_chain_reshape(l=32, s=32, n=4, R=32):
    x = _rand(l * s, n * R)

    def build():
        def kern(x_ref, o_ref):
            t = x_ref[:].reshape(l, s, n, R)
            t = jnp.transpose(t, (1, 2, 0, 3))
            o_ref[:] = t.reshape(s * n, l * R)

        fn = lambda t: pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((s * n, l * R), t.dtype),
        )(t)
        ref = jnp.transpose(x.reshape(l, s, n, R), (1, 2, 0, 3)).reshape(
            s * n, l * R)
        return jax.jit(fn), (x,), ref

    return build


# --- candidate 6: full assembly, single matmul + in-kernel interleave -------

def c6_assembly(R=16, rA=16, n=4):
    """out[(l,m,L),(r,n,R)] = phil[l,s,r] A[s,m,n,S] phir[L,S,R];
    W = stage1 outside; kernel does (l m r n, S) @ (S, L R) + permute."""
    phil, a, phir = _rand(R, rA, R), _rand(rA, n, n, rA), _rand(R, rA, R)
    m = R * n * R

    W = jnp.einsum("lsr,smnS->lmrnS", phil, a)  # outside, tiny

    def build():
        def kern(w_ref, p_ref, o_ref):
            w = w_ref[:]                          # (l*m*r*n, S)
            p = p_ref[:]                          # (S, L*R)
            t = jnp.dot(w, p, preferred_element_type=jnp.float32)
            t = t.reshape(R, n, R, n, R, R)        # l,m,r,n,L,R
            t = jnp.transpose(t, (0, 1, 4, 2, 3, 5))
            o_ref[:] = t.reshape(m, m)

        fn = lambda w, p: pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((m, m), w.dtype),
        )(w, p)
        ref = jnp.einsum("lsr,smnS,LSR->lmLrnR", phil, a, phir).reshape(m, m)
        return (jax.jit(fn),
                (W.reshape(R * n * R * n, rA), phir.transpose(1, 0, 2).reshape(rA, R * R)),
                ref)

    return build


# --- candidate 7: XLA reference timings --------------------------------------

def xla_times(R=32, rA=30, n=4):
    from ttipm_tpu.ops.kernels import kkt_block_matvec_xla

    phil, a, phir, x = (_rand(R, rA, R), _rand(rA, n, n, rA),
                        _rand(R, rA, R), _rand(R, n, R))
    mv = jax.jit(kkt_block_matvec_xla)
    us = timeit(mv, phil, a, phir, x)
    print(f"[REF]  xla matvec R={R} rA={rA}: {us:.1f} us")

    proj = jax.jit(lambda p, A, q: jnp.einsum(
        "lsr,smnS,LSR->lmLrnR", p, A, q).reshape(R * n * R, R * n * R))
    us = timeit(proj, phil, a, phir)
    print(f"[REF]  xla assembly R={R} rA={rA}: {us:.1f} us")


if __name__ == "__main__":
    print("devices:", jax.devices())
    xla_times(R=16, rA=16)
    xla_times(R=32, rA=30)
    probe("matvec_unaligned R=32", c1_matvec_unaligned())
    probe("leading_transpose", c2_leading_transpose())
    probe("sublane32_transpose", c3_sublane32())
    probe("t2d_128", c4_t2d())
    probe("chain_reshape", c5_chain_reshape())
    probe("assembly R=16", c6_assembly(R=16, rA=16))
    probe("assembly R=32", c6_assembly(R=32, rA=30))
    sys.exit(0)
