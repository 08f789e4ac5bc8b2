"""safe_svd v2: pre-scale before first QR + ridge-shifted Gram eigh."""
import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
rng = np.random.RandomState(0)

RIDGE = 1e-12


def _exp2_scale(x):
    """Power-of-two scale ~ max|x| (exact to multiply/divide by)."""
    m = jnp.max(jnp.abs(x))
    m = jnp.where(jnp.isfinite(m) & (m > 0), m, 1.0)
    return jnp.exp2(jnp.round(jnp.log2(m)))


def safe_svd(a, ridge=RIDGE):
    m, n = a.shape
    if m < n:
        u, s, vt = safe_svd(a.T, ridge)
        return vt.T, s, u.T
    scale = _exp2_scale(a)
    q, r = jnp.linalg.qr(a / scale)
    g = r.T @ r
    g = g + (ridge * jnp.max(jnp.abs(jnp.diagonal(g)))) * jnp.eye(
        n, dtype=a.dtype
    )
    _, V = jnp.linalg.eigh(g)
    V = V[:, ::-1]
    B = r @ V
    qb, rb = jnp.linalg.qr(B)
    u = q @ qb
    svt = (rb @ V.T) * scale
    s = jnp.linalg.norm(svt, axis=1)
    vt = svt / jnp.maximum(s, 1e-30)[:, None]
    return u, s, vt


def check(name, a):
    f = jax.jit(safe_svd, device=dev)
    u, s, vt = jax.device_get(f(jnp.asarray(a)))
    ok = np.isfinite(u).all() and np.isfinite(s).all() and np.isfinite(vt).all()
    rec = np.max(np.abs((u * s) @ vt - a)) / max(np.abs(a).max(), 1e-300) if ok else np.nan
    orth = np.max(np.abs(u.T @ u - np.eye(u.shape[1]))) if ok else np.nan
    sref = np.linalg.svd(a, compute_uv=False)
    k = min(len(s), len(sref))
    sd = np.max(np.abs(np.sort(s)[::-1][:k] - sref[:k])) / max(sref[0], 1e-300) if ok else np.nan
    print(f"{name:36s} finite={ok} rel_rec={rec:.2e} orth={orth:.2e} s_relerr={sd:.2e}")


n = 48
q1, _ = np.linalg.qr(rng.randn(n, n))
q2, _ = np.linalg.qr(rng.randn(n, n))
A = (q1 * np.logspace(0, -6, n)) @ q2.T
check("well-cond 1e6", A)
Z = A.copy(); Z[:, 40:] = 0.0
check("8 zero cols", Z)
T = A.copy(); T[:, 40:] *= 1e-30
check("cols scaled 1e-30", T)
T2 = A.copy(); T2[:, 40:] *= 1e-15
check("cols scaled 1e-15", T2)
T3 = A.copy(); T3[:, 40:] *= 1e-8
check("cols scaled 1e-8", T3)
check("cond 1e14", (q1 * np.logspace(0, -14, n)) @ q2.T)
check("scale 1e20", A * 1e20)
check("scale 1e-20", A * 1e-20)
check("scale 1e30", A * 1e30)
check("zero matrix", np.zeros((n, n)))
P = rng.randn(96, 24); P[:, 20:] = 0.0
check("tall 96x24 zero cols", P)
P2 = rng.randn(24, 96); P2[20:, :] = 0.0
check("wide 24x96 zero rows", P2)
D = A.copy(); D[:, -1] = D[:, 0]
check("duplicate col", D)
M = rng.randn(64, 64); M[:, 32:] = M[:, :32] * 1e-13  # correlated tiny
check("correlated tiny cols", M)
print("done")
