"""safe_svd v3: frexp-based scaling + graded ridge."""
import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
rng = np.random.RandomState(0)


def _pow2_scale(x):
    m = jnp.max(jnp.abs(x))
    return jnp.where(jnp.isfinite(m) & (m > 0), m, jnp.ones((), x.dtype))


def safe_svd(a, ridge=1e-12):
    m, n = a.shape
    if m < n:
        u, s, vt = safe_svd(a.T, ridge)
        return vt.T, s, u.T
    scale = _pow2_scale(a)
    q, r = jnp.linalg.qr(a / scale)
    g = r.T @ r
    shift = ridge * jnp.max(jnp.abs(jnp.diagonal(g)))
    g = g + shift * jnp.diag(jnp.linspace(1.0, 2.0, n).astype(a.dtype))
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
    amax = max(np.abs(a).max(), 1e-300)
    rec = np.max(np.abs((u * s) @ vt - a)) / amax if ok else np.nan
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
for sc in [1e-30, 1e-15, 1e-8]:
    T = A.copy(); T[:, 40:] *= sc
    check(f"cols scaled {sc:.0e}", T)
check("cond 1e14", (q1 * np.logspace(0, -14, n)) @ q2.T)
check("scale 1e20", A * 1e20)
check("scale 1e-20", A * 1e-20)
check("scale 1e30", A * 1e30)
check("zero matrix", np.zeros((n, n)))
P = rng.randn(96, 24); P[:, 20:] = 0.0
check("tall 96x24 zero cols", P)
D = A.copy(); D[:, -1] = D[:, 0]
check("duplicate col", D)
M = rng.randn(64, 64); M[:, 32:] = M[:, :32] * 1e-13
check("correlated tiny cols", M)
# production-shape stress: near-converged IPM panel (tiny + huge mix)
S = (q1 * np.logspace(3, -10, n)) @ q2.T
S[:, ::5] *= 1e-9
check("ipm-ish mixed scales", S)
print("done")
