"""Pin down the v5e f64 SVD NaN trigger and test fix candidates."""
import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
cpu = jax.devices("cpu")[0]
rng = np.random.RandomState(0)


def svd_ok(name, a):
    f = jax.jit(lambda x: jnp.linalg.svd(x, full_matrices=False), device=dev)
    u, s, vt = jax.device_get(f(jnp.asarray(a)))
    ok = np.isfinite(u).all() and np.isfinite(s).all() and np.isfinite(vt).all()
    rec = np.max(np.abs((u * s) @ vt - a)) if ok else np.nan
    print(f"{name:46s} finite={ok} rec_err={rec:.2e} s_head={s[:2]} s_tail={s[-2:]}")
    return ok


n = 48
q1, _ = np.linalg.qr(rng.randn(n, n))
q2, _ = np.linalg.qr(rng.randn(n, n))

# trigger candidates
A = (q1 * np.logspace(0, -6, n)) @ q2.T
svd_ok("well-cond 1e6", A)

Z = A.copy(); Z[:, 40:] = 0.0
svd_ok("8 zero cols", Z)

Z1 = A.copy(); Z1[:, -1] = 0.0
svd_ok("1 zero col", Z1)

D = A.copy(); D[:, -1] = D[:, 0]  # rank deficient, no zero col
svd_ok("duplicate col (rank-def)", D)

ZR = A.copy(); ZR[40:, :] = 0.0
svd_ok("8 zero rows", ZR)

svd_ok("zero matrix", np.zeros((n, n)))

T = A.copy(); T[:, 40:] *= 1e-30
svd_ok("cols scaled 1e-30", T)
T2 = A.copy(); T2[:, 40:] *= 1e-20
svd_ok("cols scaled 1e-20", T2)
T3 = A.copy(); T3[:, 40:] *= 1e-15
svd_ok("cols scaled 1e-15", T3)

# fix candidates on the zero-col matrix
G = rng.randn(n, n)
svd_ok("zerocols + 1e-30*G", Z + 1e-30 * G)
svd_ok("zerocols + 1e-25*G", Z + 1e-25 * G)
svd_ok("zerocols + 1e-20*G", Z + 1e-20 * G)
svd_ok("zerocols + 1e-14*G", Z + 1e-14 * G)

# tall/wide panels as in the sweep ((n*rr) x (rl*bs) etc.)
P = rng.randn(96, 24); P[:, 20:] = 0.0
svd_ok("tall 96x24, 4 zero cols", P)
P2 = rng.randn(24, 96); P2[20:, :] = 0.0
svd_ok("wide 24x96, 4 zero rows", P2)

# condition-limit scan (no zeros)
for c in [16, 20, 24, 28]:
    M = (q1 * np.logspace(0, -c, n)) @ q2.T
    svd_ok(f"cond 1e{c}", M)
print("done")
