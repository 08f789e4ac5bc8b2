"""Instrument the Jacobi orthogonalisation convergence on TPU vs CPU."""
import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from ttipm_tpu.ops import jacobi

dev = jax.devices()[0]
cpu = jax.devices("cpu")[0]
rng = np.random.RandomState(0)


def ortho_dbg(w):
    n = w.shape[1]
    si, sj = jacobi._round_robin(n)
    si = jnp.asarray(si); sj = jnp.asarray(sj)
    v0 = jnp.eye(n, dtype=w.dtype)

    def one_step(k, wv):
        w, v = wv
        ii, jj = si[k], sj[k]
        wi, wj = w[:, ii], w[:, jj]
        a = jnp.sum(wi * wi, axis=0)
        b = jnp.sum(wj * wj, axis=0)
        c = jnp.sum(wi * wj, axis=0)
        cs, sn = jacobi._svd_rotations(a, b, c, w.dtype)
        w = w.at[:, ii].set(cs * wi - sn * wj).at[:, jj].set(sn * wi + cs * wj)
        vi, vj = v[:, ii], v[:, jj]
        v = v.at[:, ii].set(cs * vi - sn * vj).at[:, jj].set(sn * vi + cs * vj)
        return w, v

    def off_of(w):
        g = w.T @ w
        d = jnp.diagonal(g)
        scale = jnp.sqrt(jnp.maximum(d[:, None] * d[None, :],
                                     jacobi.TINY ** 2))
        return jnp.max(jnp.abs(g - jnp.diag(d)) / scale)

    offs = []
    v = v0
    for swp in range(8):
        w, v = jax.lax.fori_loop(0, n - 1, one_step, (w, v))
        offs.append(off_of(w))
    return jnp.stack(offs), w, v


f_t = jax.jit(ortho_dbg, device=dev)
f_c = jax.jit(ortho_dbg, device=cpu)

for name, m in {
    "randn 24": rng.randn(24, 24),
    "randn 16": rng.randn(16, 16),
    "randn 8": rng.randn(8, 8),
}.items():
    a = jnp.asarray(m)
    offs_t, w_t, v_t = jax.device_get(f_t(a))
    offs_c, w_c, v_c = jax.device_get(f_c(a))
    print(f"--- {name}")
    print("  tpu offs:", " ".join(f"{o:.1e}" for o in offs_t))
    print("  cpu offs:", " ".join(f"{o:.1e}" for o in offs_c))
    # check single-step equivalence: do ONE step on both and diff W
    def one(w):
        offs, w2, v2 = ortho_dbg(w)
        return w2
    # compare v orthonormality
    print("  v_t orth err:", np.max(np.abs(v_t.T @ v_t - np.eye(v_t.shape[1]))))
    print("  w diff tpu-cpu:", np.max(np.abs(w_t - w_c)))
print("done")
