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

# The reference publishes no benchmark numbers (BASELINE.md: results/ is
# gitignored, README has reproduction commands only) and its PETSc/Cython
# build cannot run in this image, so there is NO measured baseline:
# vs_baseline is reported as null per the benchmarking protocol
# (src/utils.py:300-321) until a measured reference number exists.
# BASELINE.md carries this repo's own measured grid for regression
# tracking instead.

DEFAULT_GRID = "3:2,5:2,6:1,8:1"  # dim:seeds pairs
SEED_POOL = [319, 9313, 332, 261, 266]


def _solve_once(dim: int, seed: int):
    import time

    import numpy as np

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
    slack = abs(float(tt_inner_prod(X, Z)))
    return elapsed, slack, int(info["num_iters"])


def main() -> int:
    grid_spec = os.environ.get("BENCH_GRID", DEFAULT_GRID)
    platform = os.environ.get("BENCH_PLATFORM", "cpu")
    if platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_backend_optimization_level" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_backend_optimization_level=0"
            ).strip()

    import jax

    offload = platform in ("offload", "offload-f32")
    if offload:
        # heterogeneous mode: host orchestration + cheap TT algebra on the
        # local CPU backend, fused sweep/eigen programs on the TPU
        jax.config.update("jax_platforms", "cpu,axon")
    elif platform:
        jax.config.update("jax_platforms", platform)

    from ttipm_tpu import config as ttipm_config

    ttipm_config.enable_persistent_cache()
    if offload:
        ttipm_config.set_offload("axon")
    if platform == "offload-f32":
        # TPU performance profile: MXU-native f32 (highest matmul
        # precision), whole-solve device loop, eps floors rescaled
        import jax.numpy as jnp

        ttipm_config.set_dtype(jnp.float32)

    all_ok = True
    times = []
    for part in grid_spec.split(","):
        dim_s, _, nseeds_s = part.partition(":")
        dim = int(dim_s)
        nseeds = int(nseeds_s or "1")
        dim_times = []
        for seed in SEED_POOL[:nseeds]:
            elapsed, slack, iters = _solve_once(dim, seed)
            converged = slack < 1e-3
            all_ok = all_ok and converged
            dim_times.append(elapsed)
            print(
                json.dumps(
                    {
                        "metric": f"maxcut_d{dim}_seed{seed}_solve_seconds",
                        "value": round(elapsed, 3),
                        "unit": "s",
                        "slackness": float(f"{slack:.3e}"),
                        "iters": iters,
                        "converged": converged,
                        "platform": platform,
                        "vs_baseline": None,
                    }
                ),
                flush=True,
            )
        times.append(
            {
                "dim": dim,
                "mean": float(np.mean(dim_times)),
                "std": float(np.std(dim_times)),
            }
        )

    geomean = float(np.exp(np.mean([np.log(t["mean"]) for t in times])))
    # the driver parses the LAST stdout line
    print(
        json.dumps(
            {
                "metric": "maxcut_grid_geomean_seconds",
                "value": round(geomean, 3),
                "unit": "s",
                "grid": times,
                "platform": platform,
                "converged_all": all_ok,
                "vs_baseline": None,
            }
        ),
        flush=True,
    )
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
