"""Jacobi safe_svd / safe_eigh vs LAPACK oracles (forced on CPU).

These guard the TPU-only code path: v5e f64 QDWH svd/eigh NaN on zero
columns and clustered tiny spectra (scripts/tpu_probe_*.py), so the
Jacobi factorizations replace them on-chip.
"""

import numpy as np
import pytest

from ttipm_tpu.ops import jacobi


@pytest.fixture(autouse=True)
def _force():
    jacobi.force_jacobi(True)
    yield
    jacobi.force_jacobi(None)


def _gallery():
    rng = np.random.RandomState(0)
    n = 24
    q1, _ = np.linalg.qr(rng.randn(n, n))
    q2, _ = np.linalg.qr(rng.randn(n, n))
    A = (q1 * np.logspace(0, -6, n)) @ q2.T
    Z = A.copy(); Z[:, 20:] = 0.0
    T = A.copy(); T[:, 20:] *= 1e-15
    D = A.copy(); D[:, -1] = D[:, 0]
    cases = {
        "well_cond": A,
        "zero_cols": Z,
        "tiny_cols": T,
        "dup_col": D,
        "cond_1e14": (q1 * np.logspace(0, -14, n)) @ q2.T,
        "scaled_1e18": A * 1e18,
        "scaled_1e-18": A * 1e-18,
        "zero": np.zeros((n, n)),
        "tall": rng.randn(53, 17),
        "tall_zero_cols": np.hstack([rng.randn(40, 9), np.zeros((40, 4))]),
        "wide": rng.randn(17, 53),
        "wide_odd": rng.randn(15, 22),
        "one_col": rng.randn(9, 1),
        "one_row": rng.randn(1, 9),
    }
    return cases


@pytest.mark.parametrize("name", list(_gallery().keys()))
def test_safe_svd(name):
    a = _gallery()[name]
    u, s, vt = (np.asarray(x) for x in jacobi.safe_svd(a))
    assert np.isfinite(u).all() and np.isfinite(s).all() and np.isfinite(vt).all()
    amax = max(np.abs(a).max(), 1.0e-30)
    # exact split
    rec = np.max(np.abs((u * s) @ vt - a)) / amax
    assert rec < 1e-11, rec
    # u orthonormal including nullspace directions
    orth = np.max(np.abs(u.T @ u - np.eye(u.shape[1])))
    assert orth < 1e-12, orth
    # singular values match LAPACK (relative to sigma_max)
    sref = np.linalg.svd(a, compute_uv=False)
    k = min(len(s), len(sref))
    assert np.max(np.abs(np.sort(s)[::-1][:k] - sref[:k])) / max(sref[0] if len(sref) else 1.0, 1e-30) < 1e-10
    # descending (up to tolerance-level ties)
    assert np.all(np.diff(s) <= 1e-10 * (s[0] + 1e-30))


def test_safe_eigh_gallery():
    rng = np.random.RandomState(1)
    for n in [2, 7, 24]:
        q, _ = np.linalg.qr(rng.randn(n, n))
        for spec in [np.linspace(-3, 5, n), np.zeros(n),
                     np.r_[np.zeros(n // 2), np.logspace(-14, 0, n - n // 2)]]:
            a = (q * spec) @ q.T
            a = 0.5 * (a + a.T)
            w, v = (np.asarray(x) for x in jacobi.safe_eigh(a))
            assert np.isfinite(w).all() and np.isfinite(v).all()
            wref = np.linalg.eigvalsh(a)
            assert np.max(np.abs(np.sort(w) - wref)) < 1e-11 * max(
                1.0, np.abs(wref).max()
            )
            assert np.max(np.abs(v @ np.diag(w) @ v.T - a)) < 1e-11 * max(
                1.0, np.abs(wref).max()
            )
            assert np.max(np.abs(v.T @ v - np.eye(n))) < 1e-12


def test_gram_split_svd_contract():
    """The f32-TPU Gram-eigh split (used because jnp.linalg.svd crashes
    the v5e compiler at small narrow shapes): u exactly orthonormal,
    u @ (s*vt) == a to f32 precision, s descending and f32-accurate."""
    import jax.numpy as jnp
    import numpy as np

    from ttipm_tpu.ops.jacobi import _gram_split_svd

    rng = np.random.RandomState(0)
    for shape in [(32, 12), (12, 32), (96, 20), (7, 7), (1, 5), (5, 1)]:
        a = jnp.asarray(rng.randn(*shape), dtype=jnp.float32)
        u, s, vt = _gram_split_svd(a)
        k = min(shape)
        assert u.shape == (shape[0], k) and vt.shape == (k, shape[1])
        rec = float(jnp.max(jnp.abs(u @ (s[:, None] * vt) - a)))
        orth = float(jnp.max(jnp.abs(u.T @ u - jnp.eye(k, dtype=a.dtype))))
        assert rec < 1e-5, shape
        assert orth < 1e-5, shape
        s_np = np.asarray(s)
        assert (np.diff(s_np) <= 1e-6).all(), "s not descending"
        sref = np.linalg.svd(np.asarray(a, dtype=np.float64), compute_uv=False)
        assert np.max(np.abs(s_np - sref)) / max(sref[0], 1e-9) < 1e-5


def test_gram_split_svd_rank_deficient_f32():
    """Regression: XLA:CPU's native f32 svd returns ~1e26 left singular
    vectors at exactly-zero singular values (measured 2026-08-19 on a
    rank-3 (4,24) matrix); the Gram-eigh split must keep u exactly
    orthonormal and vt rows zeroed at the noise cutoff, on BOTH the wide
    and tall branches."""
    import numpy as np
    import jax.numpy as jnp

    from ttipm_tpu.ops.jacobi import _gram_split_svd

    rng = np.random.RandomState(5)
    base = rng.randn(4, 24).astype(np.float32)
    # exact rank 3: project one direction out
    u0, s0, vt0 = np.linalg.svd(base, full_matrices=False)
    s0[3] = 0.0
    for a in [u0 @ np.diag(s0) @ vt0,                 # wide (4, 24)
              (u0 @ np.diag(s0) @ vt0).T]:            # tall (24, 4)
        aj = jnp.asarray(a, jnp.float32)
        u, s, vt = _gram_split_svd(aj)
        un, sn, vtn = np.asarray(u), np.asarray(s), np.asarray(vt)
        assert np.abs(un).max() < 1.5, "basis factor must stay orthonormal"
        assert np.abs(un.T @ un - np.eye(un.shape[1])).max() < 1e-5
        assert np.abs(vtn).max() < 1e3, "vt rows at s=0 must not blow up"
        recon = un @ (sn[:, None] * vtn)
        assert np.abs(recon - a).max() < 1e-4 * max(1.0, np.abs(a).max())


def test_f32_split_dispatch_avoids_native_svd():
    """f32 splits must take the Gram-eigh path on every backend (the
    native f32 lowerings are broken: TPU compiler SIGABRT, CPU garbage
    at zero singular values)."""
    import numpy as np
    import jax.numpy as jnp

    from ttipm_tpu.ops.jacobi import fast_split_svd, safe_svd

    rng = np.random.RandomState(6)
    a = np.zeros((4, 24), np.float32)
    a[:3] = rng.randn(3, 24)  # exact rank 3 with a zero row
    for fn in (fast_split_svd, safe_svd):
        u, s, vt = fn(jnp.asarray(a))
        assert float(jnp.max(jnp.abs(u))) < 1.5
        assert np.isfinite(np.asarray(vt)).all()
