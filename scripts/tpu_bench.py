"""Canonical on-chip benchmark: heterogeneous offload + f32 profile +
whole-solve device loop, maxcut d3..dN, one JSON line per solve.

The tunneled TPU's compile service is flaky (helper SIGABRTs, see
solvers/fused.py::_dispatch_retry); this script is built to be re-run —
successfully compiled programs persist in the XLA cache, so every rerun
makes monotone progress until the grid completes.

Usage:  JAX_PLATFORMS= python scripts/tpu_bench.py [dims ...]
Output: results/tpu_bench.jsonl  (appended)
"""

import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LEVEL", "3")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu,axon")

import jax.numpy as jnp
import numpy as np

from ttipm_tpu import config as cfg

cfg.enable_persistent_cache()
cfg.set_offload("axon")
cfg.set_dtype(jnp.float32)
# Native-dtype step-size pencils: required by the whole-eigen device
# program (f64 would lower to Jacobi rotation loops, 19-min remote
# compiles); e2e-validated on CPU with the scale-aware penalty floor
# (maxcut d3/d4/d5 converge, BASELINE.md round 3).
cfg.set_eigen_dtype("native")

from ttipm_tpu.ipm import tt_ipm
from ttipm_tpu.models.maxcut import create_problem
from ttipm_tpu.ops.tt import tt_inner_prod, tt_reshape

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "tpu_bench.jsonl")


def solve(dim: int, seed: int = 319):
    np.random.seed(seed)
    obj_tt, L_tt, bias_tt, lag_y = create_problem(dim, 1)
    t0 = time.time()
    X, Y, T, Z, info = tt_ipm(
        {"y": tt_reshape(lag_y, (4, 4))}, obj_tt, L_tt, bias_tt,
        max_iter=22, gap_tol=3e-4, op_tol=1e-4, abs_tol=1e-3, warm_up=3,
        aho_direction=False, mals_restarts=2, max_refinement=5,
        lambdaStar=1.0, verbose=True,
    )
    elapsed = time.time() - t0
    slack = abs(float(tt_inner_prod(X, Z)))
    return {"problem": "maxcut", "dim": dim, "seed": seed,
            "platform": "offload-f32", "time_s": round(elapsed, 2),
            "slackness": float(f"{slack:.4e}"),
            "iters": int(info["num_iters"]),
            "converged": bool(slack < 1e-3)}


def _config_seed(dim: int) -> int:
    import yaml

    path = os.path.join(os.path.dirname(OUT), "..", "configs",
                        f"maxcut_{dim}.yaml")
    try:
        with open(os.path.normpath(path)) as fh:
            return int(yaml.safe_load(fh)["seeds"][0])
    except Exception:
        return 319


def main():
    dims = [int(a) for a in sys.argv[1:]] or [3, 4, 5]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for dim in dims:
        try:
            rec = solve(dim, _config_seed(dim))
        except Exception as e:  # noqa: BLE001 — record the failure and go on
            rec = {"problem": "maxcut", "dim": dim,
                   "platform": "offload-f32", "error": str(e)[:200]}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as fh:
            fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
