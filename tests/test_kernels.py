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
