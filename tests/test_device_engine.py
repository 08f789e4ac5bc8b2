"""Device-engine (host_algebra=False) coverage of the TT ops suite.

Round-4 advisor finding: the jitted/device branches of several ops in
``ttipm_tpu/ops/tt.py`` were only reachable with ``set_host_algebra(False)``
and had gone uncovered (a botched rename raised NameError there).  This file
runs every dual-dispatch op through the device engine and cross-checks the
result against the host engine / dense oracles so the two engines cannot
drift silently again.

Reference parity targets: cy_src/tt_ops_cy.pyx:21-526, src/tt_ops.py:155-395.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ttipm_tpu import config
from ttipm_tpu.ops import tt
from ttipm_tpu.ops.rounding import tt_rank_reduce


@pytest.fixture
def device_engine():
    config.set_host_algebra(False)
    try:
        yield
    finally:
        config.set_host_algebra(True)


def _rand_matrix_tt(rng, d=3, r=3):
    ranks = [1] + [r] * (d - 1) + [1]
    return [
        jnp.asarray(rng.standard_normal((ranks[k], 2, 2, ranks[k + 1])))
        for k in range(d)
    ]


def _rand_vec_tt(rng, d=3, r=3):
    ranks = [1] + [r] * (d - 1) + [1]
    return [
        jnp.asarray(rng.standard_normal((ranks[k], 2, ranks[k + 1])))
        for k in range(d)
    ]


def _dense(matrix_tt):
    return np.asarray(tt.tt_matrix_to_matrix([np.asarray(c) for c in matrix_tt]))


def test_inner_prod_and_norm_device(device_engine):
    rng = np.random.default_rng(0)
    a, b = _rand_matrix_tt(rng), _rand_matrix_tt(rng)
    got = tt.tt_inner_prod(a, b)
    want = float(np.sum(_dense(a) * _dense(b)))
    assert got == pytest.approx(want, rel=1e-10)
    assert tt.tt_norm(a) == pytest.approx(np.linalg.norm(_dense(a)), rel=1e-10)


def test_entrywise_sum_device(device_engine):
    rng = np.random.default_rng(1)
    a = _rand_matrix_tt(rng)
    assert tt.tt_entrywise_sum(a) == pytest.approx(float(_dense(a).sum()), rel=1e-10)
    v = _rand_vec_tt(rng)
    dense_v = tt.tt_to_tensor([np.asarray(c) for c in v])
    assert tt.tt_entrywise_sum(v) == pytest.approx(float(np.sum(dense_v)), rel=1e-10)


def test_diag_embed_device(device_engine):
    rng = np.random.default_rng(2)
    v = _rand_vec_tt(rng)
    diag_tt = tt.tt_diag(v)
    dense_v = np.asarray(tt.tt_to_tensor([np.asarray(c) for c in v])).reshape(-1)
    np.testing.assert_allclose(_dense(diag_tt), np.diag(dense_v), atol=1e-10)


def test_diag_op_device(device_engine):
    rng = np.random.default_rng(3)
    m = _rand_matrix_tt(rng, d=2)
    op = tt.tt_diag_op(m)
    dense_m = _dense(m)
    # Operator cores are (r, 4, 4, R): Diag(vec(M)) acting on vec'd matrices.
    op_dense = np.asarray(
        tt.tt_matrix_to_matrix([np.asarray(c) for c in op])
    )
    vec_m = dense_m.reshape(2, 2, 2, 2).transpose(0, 2, 1, 3).reshape(-1)
    np.testing.assert_allclose(np.diag(op_dense), vec_m, atol=1e-10)


def test_kron_device(device_engine):
    rng = np.random.default_rng(4)
    a, b = _rand_matrix_tt(rng, d=2, r=2), _rand_matrix_tt(rng, d=2, r=2)
    k = tt.tt_kron(a, b)
    assert [c.shape for c in k] == [(1, 4, 4, 4), (4, 4, 4, 1)]
    # Core-wise Kron: dense oracle is the mixed-product interleaved Kronecker.
    want = np.kron(_dense(a).reshape(2, 2, 2, 2), np.ones((1, 1)))
    got_first = np.asarray(k[0])
    ref_first = np.einsum(
        "rmnR,lijL->rlminjRL", np.asarray(a[0]), np.asarray(b[0])
    ).reshape(1, 4, 4, 4)
    np.testing.assert_allclose(got_first, ref_first, atol=1e-12)
    del want


def test_merge_cores_and_reshape_device(device_engine):
    rng = np.random.default_rng(5)
    a = _rand_matrix_tt(rng, d=4)
    merged = tt.tt_merge_cores(a)
    assert len(merged) == 2 and merged[0].ndim == 6
    v = _rand_vec_tt(rng, d=4)
    merged_v = tt.tt_merge_cores(v)
    assert len(merged_v) == 2 and merged_v[0].ndim == 4
    # matrix -> vector cores and back
    flat = tt.tt_reshape(a, (4,))
    assert all(c.ndim == 3 for c in flat)
    back = tt.tt_reshape(flat, (2, 2))
    np.testing.assert_allclose(_dense(back), _dense(a), atol=1e-10)


def test_reshape_merging_path_device(device_engine):
    """Target volume > core volume forces the tt_merge_cores path."""
    rng = np.random.default_rng(6)
    v = _rand_vec_tt(rng, d=4, r=2)
    wide = tt.tt_reshape(v, (2, 2))  # pairs of vector cores -> matrix cores
    assert len(wide) == 2 and all(c.ndim == 4 for c in wide)


def test_kron_lifts_device(device_engine):
    rng = np.random.default_rng(7)
    m = _rand_matrix_tt(rng, d=2, r=2)
    dense_m = _dense(m)
    ik = tt.tt_IkronM(m)
    ki = tt.tt_MkronI(m)
    # Interleaved Kron lifts: check against per-core einsum oracles.
    eye = np.eye(2).reshape(1, 2, 2, 1)
    for got, a, b in ((ik, eye, None), (ki, None, eye)):
        for gc, mc in zip(got, m):
            mc = np.asarray(mc)
            c1 = a if a is not None else mc
            c2 = b if b is not None else mc
            want = np.einsum("rmnR,lijL->rlminjRL", c1, c2).reshape(
                mc.shape[0], 4, 4, mc.shape[-1]
            )
            np.testing.assert_allclose(np.asarray(gc), want, atol=1e-12)
    del dense_m


def test_add_sub_scale_roundtrip_device(device_engine):
    rng = np.random.default_rng(8)
    a, b = _rand_matrix_tt(rng), _rand_matrix_tt(rng)
    s = tt.tt_add(a, b)
    np.testing.assert_allclose(_dense(s), _dense(a) + _dense(b), atol=1e-10)
    d = tt.tt_sub(a, b)
    np.testing.assert_allclose(_dense(d), _dense(a) - _dense(b), atol=1e-10)
    r = tt_rank_reduce(s, 1e-12)
    np.testing.assert_allclose(_dense(r), _dense(s), atol=1e-8)
