"""Stepwise finiteness bisect of the safe_svd pipeline on failing inputs."""
import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
rng = np.random.RandomState(0)


def steps(a, ridge=1e-12):
    out = {}
    scale = jnp.maximum(jnp.max(jnp.abs(a)), 1e-30)
    an = a / scale
    q, r = jnp.linalg.qr(an)
    out["qr.q"] = q
    out["qr.r"] = r
    g = r.T @ r
    out["gram"] = g
    shift = ridge * jnp.max(jnp.abs(jnp.diagonal(g)))
    g2 = g + shift * jnp.diag(jnp.linspace(1.0, 2.0, g.shape[0]).astype(a.dtype))
    w, V = jnp.linalg.eigh(g2)
    out["eigh.w"] = w
    out["eigh.V"] = V
    B = r @ V[:, ::-1]
    out["B"] = B
    qb, rb = jnp.linalg.qr(B)
    out["qb"] = qb
    out["rb"] = rb
    return out


f = jax.jit(steps, device=dev)

n = 48
q1, _ = np.linalg.qr(rng.randn(n, n))
q2, _ = np.linalg.qr(rng.randn(n, n))
A = (q1 * np.logspace(0, -6, n)) @ q2.T

cases = {}
T = A.copy(); T[:, 40:] *= 1e-15
cases["cols scaled 1e-15"] = T
S = (q1 * np.logspace(3, -10, n)) @ q2.T
S[:, ::5] *= 1e-9
cases["ipm-ish mixed scales"] = S
Z = A.copy(); Z[:, 40:] = 0.0
cases["8 zero cols (control)"] = Z

for name, a in cases.items():
    print(f"--- {name}")
    out = jax.device_get(f(jnp.asarray(a)))
    cpu_out = jax.device_get(jax.jit(steps, device=jax.devices("cpu")[0])(jnp.asarray(a)))
    for k in ["qr.q","qr.r","gram","eigh.w","eigh.V","B","qb","rb"]:
        v = out[k]
        fin = np.isfinite(v).all()
        cfin = np.isfinite(cpu_out[k]).all()
        extra = ""
        if k == "eigh.w" and fin:
            extra = f" w_min={v.min():.2e} w_max={v.max():.2e}"
        print(f"  {k:8s} tpu_finite={fin} cpu_finite={cfin}{extra}")
print("done")
