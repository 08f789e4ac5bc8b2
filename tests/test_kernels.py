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
