"""Checkpoint/resume round-trip tests."""

import os

import numpy as np

from ttipm_tpu.ops.random import tt_random_gaussian
from ttipm_tpu.ops.tt import tt_l2_dist
from ttipm_tpu.utils.checkpoint import load_ipm_checkpoint, save_ipm_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    X = tt_random_gaussian([3, 2], (2, 2))
    Y = tt_random_gaussian([2, 2], (4,))
    Z = tt_random_gaussian([3, 3], (2, 2))
    path = os.path.join(tmp_path, "ck.npz")
    save_ipm_checkpoint(path, X, Y, Z, None, iteration=7,
                        scalars={"eta": 1e-3, "mu": 0.5})
    state = load_ipm_checkpoint(path)
    assert state["iteration"] == 7
    assert state["scalars"]["mu"] == 0.5
    assert state["T"] is None
    # the npz round-trip is bitwise; assert per-core exact equality
    # (tt_l2_dist's rank-additive inner-product expansion carries
    # summation-order cancellation noise ~eps*||X||^2, so a tiny absolute
    # threshold on it is the wrong oracle for "identical trains")
    for a, b in zip(state["X"], X):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(state["Y"], Y):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(state["Z"], Z):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_overwrite_atomic(tmp_path):
    X = tt_random_gaussian([2], (2, 2))
    Y = tt_random_gaussian([2], (4,))
    Z = tt_random_gaussian([2], (2, 2))
    path = os.path.join(tmp_path, "ck.npz")
    save_ipm_checkpoint(path, X, Y, Z, iteration=1)
    save_ipm_checkpoint(path, X, Y, Z, iteration=2)
    assert load_ipm_checkpoint(path)["iteration"] == 2
    # no stray temp files
    assert [f for f in os.listdir(tmp_path) if f.endswith(".tmp")] == []
