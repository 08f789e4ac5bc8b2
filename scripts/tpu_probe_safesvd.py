"""Probe the QR+eigh-based TPU-safe SVD scheme on the v5e."""
import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
rng = np.random.RandomState(0)


def safe_svd(a):
    """SVD-like factorization a = u @ (s[:,None]*vt) using only QR+eigh
    (TPU f64 QDWH-SVD NaNs on zero columns / clustered tiny spectra).
    u has orthonormal columns; the split is exact by construction."""
    m, n = a.shape
    if m < n:
        u, s, vt = safe_svd(a.T)
        return vt.T, s, u.T
    q, r = jnp.linalg.qr(a)
    # scale into the f32-pair exponent comfort zone
    scale = jnp.maximum(jnp.max(jnp.abs(r)), 1e-30)
    rs = r / scale
    w, V = jnp.linalg.eigh(rs.T @ rs)
    V = V[:, ::-1]
    B = rs @ V
    qb, rb = jnp.linalg.qr(B)
    u = q @ qb
    svt = (rb @ V.T) * scale
    s = jnp.linalg.norm(svt, axis=1)
    # sign fix: make s entries the actual row norms, vt = svt / s
    vt = svt / jnp.maximum(s, 1e-30)[:, None]
    return u, s, vt


def check(name, a):
    f = jax.jit(safe_svd, device=dev)
    u, s, vt = jax.device_get(f(jnp.asarray(a)))
    ok = np.isfinite(u).all() and np.isfinite(s).all() and np.isfinite(vt).all()
    rec = np.max(np.abs((u * s) @ vt - a)) if ok else np.nan
    orth = np.max(np.abs(u.T @ u - np.eye(u.shape[1]))) if ok else np.nan
    mono = np.all(np.diff(s) <= 1e-9 * (s[0] + 1e-30)) if ok else False
    sref = np.linalg.svd(a, compute_uv=False)
    k = min(len(s), len(sref))
    sd = np.max(np.abs(np.sort(s)[::-1][:k] - sref[:k])) if ok else np.nan
    print(f"{name:36s} finite={ok} rec={rec:.2e} orth={orth:.2e} "
          f"desc={mono} s_err={sd:.2e}")


n = 48
q1, _ = np.linalg.qr(rng.randn(n, n))
q2, _ = np.linalg.qr(rng.randn(n, n))
A = (q1 * np.logspace(0, -6, n)) @ q2.T
check("well-cond 1e6", A)
Z = A.copy(); Z[:, 40:] = 0.0
check("8 zero cols", Z)
Z1 = A.copy(); Z1[:, -1] = 0.0
check("1 zero col", Z1)
ZR = A.copy(); ZR[40:, :] = 0.0
check("8 zero rows", ZR)
check("zero matrix", np.zeros((n, n)))
T = A.copy(); T[:, 40:] *= 1e-30
check("cols scaled 1e-30", T)
T2 = A.copy(); T2[:, 40:] *= 1e-15
check("cols scaled 1e-15", T2)
check("cond 1e14", (q1 * np.logspace(0, -14, n)) @ q2.T)
check("scale 1e20", A * 1e20)
check("scale 1e-20", A * 1e-20)
P = rng.randn(96, 24); P[:, 20:] = 0.0
check("tall 96x24 zero cols", P)
P2 = rng.randn(24, 96); P2[20:, :] = 0.0
check("wide 24x96 zero rows", P2)
D = A.copy(); D[:, -1] = D[:, 0]
check("duplicate col", D)

# timing vs QDWH svd at production panel sizes
import time
for shape in [(64, 64), (128, 32), (96, 96), (256, 64)]:
    a = jnp.asarray(rng.randn(*shape))
    f1 = jax.jit(safe_svd, device=dev)
    f2 = jax.jit(lambda x: jnp.linalg.svd(x, full_matrices=False), device=dev)
    jax.block_until_ready(f1(a)); jax.block_until_ready(f2(a))
    t0 = time.time()
    for _ in range(10):
        jax.block_until_ready(f1(a))
    t1 = time.time()
    for _ in range(10):
        jax.block_until_ready(f2(a))
    t2 = time.time()
    print(f"shape {shape}: safe_svd {1e3*(t1-t0)/10:.1f}ms "
          f"qdwh_svd {1e3*(t2-t1)/10:.1f}ms")
print("done")
