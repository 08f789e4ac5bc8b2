"""Mesh-sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ttipm_tpu import config
from ttipm_tpu.parallel.mesh import batched_solve_metrics, make_mesh, sharded_newton_micro


@pytest.fixture
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, kkt=2)


def test_sharded_newton_micro(mesh8):
    rng = np.random.RandomState(0)
    b, r, n, rA = 8, 3, 4, 4  # rA divisible by kkt=2

    def t(*shape):
        return jnp.asarray(rng.randn(*shape), dtype=config.dtype())

    phi_l = t(b, r, rA, r)
    eye = jnp.eye(n, dtype=config.dtype())
    A_core = t(b, rA, n, n, rA) * 0.01 + jnp.broadcast_to(
        eye[None, None, :, :, None], (b, rA, n, n, rA)
    )
    phi_r = t(b, r, rA, r)
    rhs = t(b, r, n, r)

    step = sharded_newton_micro(mesh8)
    xs, mean_res = step(phi_l, A_core, phi_r, rhs)
    assert xs.shape == rhs.shape
    assert np.isfinite(float(mean_res))
    # the psum over the kkt axis must reproduce the unsharded solve
    m = r * n * r
    B = np.einsum("qlsr,qsmnS,qLSR->qlmLrnR", phi_l, A_core, phi_r).reshape(b, m, m)
    B = B + 1e-10 * np.eye(m)
    expect = np.linalg.solve(B, np.asarray(rhs).reshape(b, m, 1))[..., 0]
    np.testing.assert_allclose(
        np.asarray(xs).reshape(b, m), expect, rtol=1e-8, atol=1e-10
    )


def test_batched_metric_reduction(mesh8):
    errs = jnp.arange(8.0, dtype=config.dtype())
    out = batched_solve_metrics(mesh8, errs)
    assert float(out) == float(errs.mean())
