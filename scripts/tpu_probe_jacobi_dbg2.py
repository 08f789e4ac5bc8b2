"""Instrument the real while_loop path of _jacobi_orthogonalise on TPU."""
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


def ortho_full(w):
    """Copy of _jacobi_orthogonalise that also returns (sweeps, off)."""
    m, n = w.shape
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

    def sweep(state):
        w, v, swp, _ = state
        w, v = jax.lax.fori_loop(0, n - 1, one_step, (w, v))
        g = w.T @ w
        d = jnp.diagonal(g)
        scale = jnp.sqrt(jnp.maximum(d[:, None] * d[None, :],
                                     jacobi.TINY ** 2))
        off = jnp.max(jnp.abs(g - jnp.diag(d)) / scale)
        return w, v, swp + 1, off

    def keep_going(state):
        _, _, swp, off = state
        return (swp < jacobi._MAX_SWEEPS) & (off > jacobi._JACOBI_TOL)

    w, v, swp, off = jax.lax.while_loop(
        keep_going, sweep,
        (w, v0, jnp.int32(0), jnp.asarray(jnp.inf, w.dtype)))
    return w, v, swp, off


n = 24
q1, _ = np.linalg.qr(rng.randn(n, n))
q2, _ = np.linalg.qr(rng.randn(n, n))
A = (q1 * np.logspace(0, -6, n)) @ q2.T
Z = A.copy(); Z[:, 20:] = 0.0
T17 = rng.randn(53, 17)

cases = {"zero_cols(24)": Z, "well_cond(24)": A}
for name, a in cases.items():
    scale = np.abs(a).max()
    _, r = np.linalg.qr(a / scale)
    if r.shape[1] % 2:
        r = np.pad(r, ((0, 0), (0, 1)))
    for d, lbl in [(dev, "tpu"), (cpu, "cpu")]:
        w, v, swp, off = jax.device_get(jax.jit(ortho_full, device=d)(jnp.asarray(r)))
        g = w.T @ w
        offabs = np.max(np.abs(g - np.diag(np.diagonal(g))))
        print(f"{name:15s} {lbl}: sweeps={int(swp)} off_rel={off:.2e} off_abs={offabs:.2e}")

# tall case r is 17x17 -> padded to 18
scale = np.abs(T17).max()
_, r = np.linalg.qr(T17 / scale)
r = np.pad(r, ((0, 0), (0, 1)))
for d, lbl in [(dev, "tpu"), (cpu, "cpu")]:
    w, v, swp, off = jax.device_get(jax.jit(ortho_full, device=d)(jnp.asarray(r)))
    g = w.T @ w
    offabs = np.max(np.abs(g - np.diag(np.diagonal(g))))
    print(f"tall(53x17)     {lbl}: sweeps={int(swp)} off_rel={off:.2e} off_abs={offabs:.2e}")
print("done")
