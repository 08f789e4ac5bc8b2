"""Capture real IPM Newton systems from a CPU maxcut run for TPU replay.

Runs maxcut d3 on the CPU backend, pickling the inputs AND the CPU
solution of the first N calls to tt_restarted_block_amen_fused into
/tmp/ttipm_kkt/.  scripts/tpu_replay_kkt.py replays them on the chip.
"""
import os
import pickle
import sys

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from ttipm_tpu import config as cfg

cfg.enable_persistent_cache()

from ttipm_tpu.solvers import fused
from ttipm_tpu.ipm import tt_ipm
from ttipm_tpu.models.maxcut import create_problem
from ttipm_tpu.ops.tt import tt_reshape, tt_inner_prod

OUT = "/tmp/ttipm_kkt"
os.makedirs(OUT, exist_ok=True)
N_CAPTURE = int(os.environ.get("N_CAPTURE", "4"))

orig = fused.tt_restarted_block_amen_fused
count = [0]


def _tt_np(tt):
    return [np.asarray(c) for c in tt]


def capture(block_A, block_b, **kwargs):
    idx = count[0]
    result = orig(block_A, block_b, **kwargs)
    if idx < N_CAPTURE:
        x_cores, res = result
        blob = {
            "A_data": {k: _tt_np(v) for k, v in block_A._data.items()},
            "A_aliases": dict(block_A._aliases),
            "A_transposes": dict(block_A._transposes),
            "b_data": {k: _tt_np(v) for k, v in block_b._data.items()},
            "kwargs": {
                k: (_tt_np(v) if k == "x0" and v is not None else v)
                for k, v in kwargs.items()
            },
            "cpu_x": _tt_np(x_cores),
            "cpu_res": float(res),
        }
        with open(f"{OUT}/kkt_{idx:02d}.pkl", "wb") as f:
            pickle.dump(blob, f)
        print(f"captured call {idx}: res={res:.3e}", flush=True)
    count[0] += 1
    return result


fused.tt_restarted_block_amen_fused = capture

np.random.seed(319)
obj_tt, L_tt, bias_tt, lag_y = create_problem(3, 1)
lag_maps = {"y": tt_reshape(lag_y, (4, 4))}
X, Y, T, Z, info = tt_ipm(
    lag_maps, obj_tt, L_tt, bias_tt,
    max_iter=22, gap_tol=3e-4, op_tol=1e-4, abs_tol=1e-3,
    warm_up=3, aho_direction=False, mals_restarts=2, max_refinement=5,
    lambdaStar=1.0,
)
print("slackness:", abs(float(np.asarray(tt_inner_prod(Z, X)))))
print(f"captured {min(count[0], N_CAPTURE)} systems to {OUT}")
