"""Pallas kernel tests (interpret mode on CPU) against the XLA einsum."""

import numpy as np
import jax.numpy as jnp

from ttipm_tpu.ops.kernels import kkt_block_matvec, kkt_block_matvec_xla


def test_kkt_block_matvec_matches_einsum():
    rng = np.random.RandomState(0)
    l, s, r = 5, 3, 4
    m, n = 4, 4
    S, L, R = 3, 5, 4
    phi_l = jnp.asarray(rng.randn(l, s, r))
    A = jnp.asarray(rng.randn(s, m, n, S))
    phi_r = jnp.asarray(rng.randn(L, S, R))
    x = jnp.asarray(rng.randn(r, n, R))
    expect = np.asarray(kkt_block_matvec_xla(phi_l, A, phi_r, x))
    got = np.asarray(kkt_block_matvec(phi_l, A, phi_r, x, interpret=True))
    np.testing.assert_allclose(got, expect, atol=1e-10)


def test_schur_assemble_matches_einsum():
    from ttipm_tpu.ops.kernels import schur_assemble, schur_assemble_xla

    rng = np.random.RandomState(1)
    l = r = L = R = 8
    s = S = 6
    n = 4
    phi_l = jnp.asarray(rng.randn(l, s, r), dtype=jnp.float32)
    A = jnp.asarray(rng.randn(s, n, n, S), dtype=jnp.float32)
    phi_r = jnp.asarray(rng.randn(L, S, R), dtype=jnp.float32)
    expect = np.asarray(schur_assemble_xla(phi_l, A, phi_r))
    got = np.asarray(schur_assemble(phi_l, A, phi_r, interpret=True))
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-4)


def test_panel_qr_matches_contract():
    """panel_qr: q orthonormal, r upper triangular, q @ r == a (interpret
    mode).  Error metrics are computed in NUMPY: on hosts with AVX512-BF16
    the XLA:CPU f32 matmul at default precision is bf16-grade (measured
    qr-a 1.6e-2 vs 3.9e-6 for identical factors), which poisons jnp-based
    oracles."""
    from ttipm_tpu.ops.kernels import panel_qr

    rng = np.random.RandomState(0)
    for (m, n) in [(32, 8), (128, 32), (48, 12), (7, 3), (16, 16)]:
        a = jnp.asarray(rng.randn(m, n), dtype=jnp.float32)
        q, r = panel_qr(a, interpret=True)
        qn, rn, an = np.asarray(q), np.asarray(r), np.asarray(a)
        scale = np.abs(an).max()
        assert np.abs(qn @ rn - an).max() < 5e-6 * scale * max(m, n) ** 0.5
        assert np.abs(qn.T @ qn - np.eye(n)).max() < 5e-6 * n
        assert np.abs(np.tril(rn, -1)).max() == 0.0


def test_panel_qr_rank_deficient():
    """Zero and duplicate columns: q stays exactly orthonormal and the
    factorization exact (beta=0 reflector skips)."""
    from ttipm_tpu.ops.kernels import panel_qr

    rng = np.random.RandomState(1)
    a = rng.randn(24, 6).astype(np.float32)
    a[:, 2] = 0.0
    a[:, 4] = a[:, 1]
    q, r = panel_qr(jnp.asarray(a), interpret=True)
    qn, rn = np.asarray(q), np.asarray(r)
    assert np.isfinite(qn).all() and np.isfinite(rn).all()
    assert np.abs(qn @ rn - a).max() < 1e-5
    assert np.abs(qn.T @ qn - np.eye(6)).max() < 1e-5


def test_qr_reduced_dispatch():
    """qr_reduced: identical contract through both paths."""
    from ttipm_tpu.ops import kernels as K

    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(40, 10), dtype=jnp.float32)
    q0, r0 = K.qr_reduced(a)          # disabled -> jnp.linalg.qr
    K.set_panel_qr(True)
    try:
        q1, r1 = K.qr_reduced(a, interpret=True)
    finally:
        K.set_panel_qr(False)
    for q, r in ((q0, r0), (q1, r1)):
        qn, rn = np.asarray(q), np.asarray(r)
        assert np.abs(qn @ rn - np.asarray(a)).max() < 1e-5
        assert np.abs(qn.T @ qn - np.eye(10)).max() < 1e-5


def test_panel_cholesky_matches_contract():
    """panel_cholesky (interpret): L lower-triangular, L L^T == A, and
    identical to jnp.linalg.cholesky through the dispatch."""
    from ttipm_tpu.ops import kernels as K

    for n in (4, 12, 32, 96, 200):
        rng = np.random.RandomState(n)
        B = rng.randn(n, n).astype(np.float32)
        A = jnp.asarray(B @ B.T + n * np.eye(n, dtype=np.float32))
        L = np.asarray(K.panel_cholesky(A, interpret=True))
        assert np.allclose(L, np.tril(L))
        rel = np.linalg.norm(L @ L.T - np.asarray(A)) / np.linalg.norm(
            np.asarray(A)
        )
        assert rel < 5e-6, (n, rel)
        Lx = np.asarray(jnp.linalg.cholesky(A))
        assert np.abs(L - Lx).max() < 1e-3 * np.abs(Lx).max()


def test_cholesky_lower_dispatch():
    from ttipm_tpu.ops import kernels as K

    rng = np.random.RandomState(7)
    B = rng.randn(24, 24).astype(np.float32)
    A = jnp.asarray(B @ B.T + 24 * np.eye(24, dtype=np.float32))
    L0 = K.cholesky_lower(A)          # disabled -> jnp.linalg.cholesky
    K.set_panel_qr(True)
    try:
        L1 = K.cholesky_lower(A, interpret=True)
    finally:
        K.set_panel_qr(False)
    assert np.abs(np.asarray(L0) - np.asarray(L1)).max() < 1e-4
