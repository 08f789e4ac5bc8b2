"""Probe v5e f64 numerics over the axon tunnel.

Tests the NaN hypotheses for the fused sweep (BASELINE.md "TPU status"):
  1. exponent range of emulated f64 (f32-pair emulation would clamp the
     usable range to ~1e±38, breaking 1e-300 division guards),
  2. f64 SVD on ill-conditioned / badly scaled matrices,
  3. f64 Cholesky of near-singular SPD matrices,
  4. f64 QR solve of ill-conditioned systems.
Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_probe_f64.py
"""
import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
cpu = jax.devices("cpu")[0]
print("device:", dev)


def on(d, f, *a):
    return jax.device_get(jax.jit(f, device=d)(*a))


def cmp(name, f, *a):
    t = on(dev, f, *a)
    c = on(cpu, f, *a)
    t, c = np.asarray(t), np.asarray(c)
    finite_t = np.isfinite(t).all()
    finite_c = np.isfinite(c).all()
    diff = np.max(np.abs(t - c)) if finite_t and finite_c else np.nan
    print(f"{name:40s} tpu_finite={finite_t} cpu_finite={finite_c} "
          f"maxdiff={diff:.3e} tpu_sample={t.ravel()[:2]}")


# 1. exponent range
for v in [1e300, 1e-300, 1e-310, 1e38, 1e-38, 1e-45]:
    x = jnp.float64(v)
    r = on(dev, lambda x: (x * 2.0) / 2.0, x)
    print(f"exp-range {v:9.1e}: roundtrip={float(r):.6e}")

# division guard pattern from _solve_local
g = on(dev, lambda x: x / jnp.maximum(jnp.float64(0.0), 1e-300),
       jnp.float64(1.0))
print("1.0 / max(0,1e-300) =", float(g))

# 2. SVD ill-conditioned
rng = np.random.RandomState(0)
q1, _ = np.linalg.qr(rng.randn(48, 48))
q2, _ = np.linalg.qr(rng.randn(48, 48))
s = np.logspace(0, -14, 48)
A_ill = (q1 * s) @ q2.T
cmp("svd ill-cond 1e14 (s)", lambda a: jnp.linalg.svd(a)[1], A_ill)
cmp("svd ill-cond (u)", lambda a: jnp.abs(jnp.linalg.svd(a)[0][:, 0]), A_ill)
# badly scaled: huge norm
cmp("svd scale 1e20 (s)", lambda a: jnp.linalg.svd(a)[1], A_ill * 1e20)
cmp("svd scale 1e-20 (s)", lambda a: jnp.linalg.svd(a)[1], A_ill * 1e-20)
# with exact zero rows (padded cores!)
A_pad = A_ill.copy()
A_pad[:, 32:] = 0.0
cmp("svd zero-cols (s)", lambda a: jnp.linalg.svd(a)[1], A_pad)
cmp("svd zero-cols (u0)", lambda a: jnp.abs(jnp.linalg.svd(a)[0][:, 0]), A_pad)

# 3. cholesky near-singular
B = q1 @ np.diag(np.logspace(0, -15, 48)) @ q1.T
B = 0.5 * (B + B.T)
cmp("cholesky near-sing", jnp.linalg.cholesky, B)
cmp("cholesky + solve_tri",
    lambda b: jax.scipy.linalg.solve_triangular(
        jnp.linalg.cholesky(b), jnp.ones((48, 1)), lower=True), B)

# 4. QR solve ill-conditioned
cmp("qr ill-cond (r diag)",
    lambda a: jnp.abs(jnp.diagonal(jnp.linalg.qr(a)[1])), A_ill)
b = rng.randn(48, 1)
cmp("qr_solve ill-cond",
    lambda a, b: jax.scipy.linalg.solve_triangular(
        jnp.linalg.qr(a)[1], jnp.linalg.qr(a)[0].T @ b, lower=False),
    A_ill, b)

# 5. eigh (used by LOBPCG / dense gates)
cmp("eigh near-sing (w)", lambda b: jnp.linalg.eigh(b)[0], B)
print("done")
