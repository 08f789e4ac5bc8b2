"""Rank-bucketing (padded static shapes) correctness: padding must never
change represented values, only shapes."""

import numpy as np
import pytest

from ttipm_tpu import config
from ttipm_tpu.ops.random import tt_random_gaussian
from ttipm_tpu.ops.rounding import tt_psd_rank_reduce, tt_rank_reduce
from ttipm_tpu.ops.products import tt_fast_mat_mat_mul
from ttipm_tpu.ops.tt import (
    tt_add,
    tt_l2_dist,
    tt_matrix_to_matrix,
    tt_ranks,
    tt_scale,
)


@pytest.fixture
def bucketed():
    config.set_rank_bucket(4)
    yield
    config.set_rank_bucket(1)


def test_bucketed_rounding_value_exact(bucketed):
    A = tt_add(
        tt_random_gaussian([3] * 4, (2, 2)),
        tt_scale(1e-9, tt_random_gaussian([2] * 4, (2, 2))),
    )
    Ad = np.asarray(tt_matrix_to_matrix(A))
    R = tt_rank_reduce(A, 1e-6)
    np.testing.assert_allclose(np.asarray(tt_matrix_to_matrix(R)), Ad, atol=1e-5)
    # ranks are bucket multiples (or <= 2)
    for r in tt_ranks(R):
        assert r <= 2 or r % 4 == 0
    # idempotent shapes: rounding again keeps the same bucketed ranks
    R2 = tt_rank_reduce(R, 1e-6)
    assert tt_ranks(R2) == tt_ranks(R)


def test_bucketed_products_match_exact(bucketed):
    A = tt_random_gaussian([3] * 3, (2, 2))
    B = tt_random_gaussian([3] * 3, (2, 2))
    Ad = np.asarray(tt_matrix_to_matrix(A))
    Bd = np.asarray(tt_matrix_to_matrix(B))
    C = tt_fast_mat_mat_mul(A, B, 1e-10)
    np.testing.assert_allclose(np.asarray(tt_matrix_to_matrix(C)), Ad @ Bd, atol=1e-8)


def test_bucketed_psd_rounding(bucketed):
    from ttipm_tpu.ops.tt import tt_matrix_svd

    B = tt_random_gaussian([3] * 3, (2, 2))
    Bd = np.asarray(tt_matrix_to_matrix(B))
    Pd = Bd.T @ Bd + 1e-8 * np.eye(Bd.shape[0])
    P = tt_matrix_svd(Pd)
    R = tt_psd_rank_reduce(P, 1e-3)
    eigs = np.linalg.eigvalsh(np.asarray(tt_matrix_to_matrix(R)))
    assert eigs.min() >= -1e-8
