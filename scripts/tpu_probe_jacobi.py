"""Run the Jacobi safe_svd/safe_eigh gallery on the real v5e + timing."""
import os, sys, time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from ttipm_tpu.ops import jacobi

print("backend:", jax.default_backend())
assert jax.default_backend() == "tpu"

from test_jacobi import _gallery

bad = 0
for name, a in _gallery().items():
    u, s, vt = (np.asarray(x) for x in jax.jit(jacobi.jacobi_svd)(jnp.asarray(a)))
    ok = np.isfinite(u).all() and np.isfinite(s).all() and np.isfinite(vt).all()
    amax = max(np.abs(a).max(), 1e-30)
    rec = np.max(np.abs((u * s) @ vt - a)) / amax if ok else np.nan
    orth = np.max(np.abs(u.T @ u - np.eye(u.shape[1]))) if ok else np.nan
    sref = np.linalg.svd(a, compute_uv=False)
    k = min(len(s), len(sref))
    sd = (np.max(np.abs(np.sort(s)[::-1][:k] - sref[:k])) / max(sref[0] if len(sref) else 1.0, 1e-30)) if ok else np.nan
    good = ok and rec < 1e-10 and orth < 1e-11 and sd < 1e-9
    bad += not good
    print(f"svd  {name:16s} ok={good} rec={rec:.2e} orth={orth:.2e} s={sd:.2e}")

rng = np.random.RandomState(1)
for n in [7, 24]:
    q, _ = np.linalg.qr(rng.randn(n, n))
    for i, spec in enumerate([np.linspace(-3, 5, n), np.zeros(n),
                              np.r_[np.zeros(n // 2), np.logspace(-14, 0, n - n // 2)]]):
        a = (q * spec) @ q.T
        a = 0.5 * (a + a.T)
        w, v = (np.asarray(x) for x in jax.jit(jacobi.jacobi_eigh)(jnp.asarray(a)))
        ok = np.isfinite(w).all() and np.isfinite(v).all()
        wref = np.linalg.eigvalsh(a)
        werr = np.max(np.abs(np.sort(w) - wref)) if ok else np.nan
        rec = np.max(np.abs(v @ np.diag(w) @ v.T - a)) if ok else np.nan
        good = ok and werr < 1e-10 * max(1, abs(wref).max()) and rec < 1e-10 * max(1, abs(wref).max())
        bad += not good
        print(f"eigh n={n} spec{i} ok={good} werr={werr:.2e} rec={rec:.2e}")

# timing at production shapes
for shape in [(64, 64), (128, 32), (96, 96), (256, 64)]:
    a = jnp.asarray(np.random.RandomState(2).randn(*shape))
    f = jax.jit(jacobi.jacobi_svd)
    jax.block_until_ready(f(a))
    t0 = time.time()
    for _ in range(10):
        jax.block_until_ready(f(a))
    dt = (time.time() - t0) / 10
    print(f"jacobi_svd {shape}: {1e3*dt:.1f}ms")
print("BAD:", bad)
