#!/usr/bin/env python
"""Checkpointed long-run driver for a single (problem, dim, seed) solve.

For runs whose wall clock exceeds one session (the reference budgets
40000*d s per run, e.g. ~77h for graphm n=3; tt_ipm.sh:41,99-107), this
driver resumes from the last on-disk checkpoint automatically, so the
round driver can kill and restart it freely.

Usage:
    python scripts/long_run.py --problem graphm --dim 3 [--seed-index 0]
                               [--rank 1] [--out results/long]

Writes results/long/<problem>_<dim>_s<idx>/:
    ckpt.npz       — iterates + scalar state, every iteration
    result.json    — final metrics (reference schema fields)
    run.log        — appended per attempt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import yaml

# The session env may pin JAX_PLATFORMS=axon (the TPU tunnel); a multi-hour
# checkpointed run must not silently route eager TT algebra over the
# tunnel.  A sitecustomize hook may have imported jax already, so set the
# config post-import rather than relying on the env var.
import jax

jax.config.update(
    "jax_platforms", os.environ.get("LONGRUN_PLATFORM", "cpu")
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", required=True)
    ap.add_argument("--dim", type=int, required=True)
    ap.add_argument("--seed-index", type=int, default=0)
    ap.add_argument("--rank", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(REPO, "results", "long"))
    args = ap.parse_args()

    cfg_path = os.path.join(REPO, "configs", f"{args.problem}_{args.dim}.yaml")
    with open(cfg_path) as fh:
        config = dict(yaml.safe_load(fh))
    seed = config["seeds"][args.seed_index]

    name = f"{args.problem}_{args.dim}_s{args.seed_index}"
    workdir = os.path.join(args.out, name)
    os.makedirs(workdir, exist_ok=True)
    ckpt = os.path.join(workdir, "ckpt.npz")
    result_path = os.path.join(workdir, "result.json")
    if os.path.exists(result_path):
        print(f"[long_run] {name}: result.json exists, nothing to do")
        return 0

    from ttipm_tpu import config as ttipm_config

    ttipm_config.enable_persistent_cache()

    from ttipm_tpu.ipm import IneqStatus, tt_ipm
    from ttipm_tpu.ops.products import tt_fast_matrix_vec_mul
    from ttipm_tpu.ops.rounding import tt_rank_reduce
    from ttipm_tpu.ops.tt import (
        tt_add, tt_inner_prod, tt_reshape, tt_sub, tt_transpose,
    )
    from ttipm_tpu.utils.runner import load_problem

    np.random.seed(seed)
    t1 = time.time()
    problem = load_problem(args.problem)(config["dim"], args.rank)
    if len(problem) == 5:
        obj_tt, L_op_tt, bias_tt, ineq_mask, lag_maps = problem
    else:
        obj_tt, L_op_tt, bias_tt, lag_y = problem
        ineq_mask = None
        lag_maps = {"y": lag_y}
    lag_maps = {k: tt_reshape(v, (4, 4)) for k, v in lag_maps.items()}
    obj_tt = tt_reshape(obj_tt, (4,))
    bias_tt = tt_reshape(bias_tt, (4,))
    creation_s = time.time() - t1

    resume = ckpt if os.path.exists(ckpt) else None
    if resume:
        print(f"[long_run] {name}: resuming from {ckpt}", flush=True)
    t2 = time.time()
    X_tt, Y_tt, T_tt, Z_tt, info = tt_ipm(
        lag_maps, obj_tt, L_op_tt, bias_tt,
        ineq_mask=ineq_mask,
        max_iter=config["max_iter"],
        verbose=config.get("verbose", False),
        gap_tol=float(config["gap_tol"]),
        op_tol=float(config["op_tol"]),
        warm_up=config["warm_up"],
        abs_tol=float(config["abs_tol"]),
        aho_direction=False,
        mals_restarts=config["mals_restarts"],
        max_refinement=config["max_refinement"],
        lambdaStar=float(config.get("lambdaStar", 1)),
        lambdaStarIneq=float(config.get("lambdaStarIneq", 1)),
        checkpoint_path=ckpt,
        checkpoint_every=1,
        resume_from=resume,
    )
    solve_s = time.time() - t2

    slack = abs(float(tt_inner_prod(X_tt, Z_tt)))
    primal_res = tt_rank_reduce(
        tt_sub(tt_fast_matrix_vec_mul(L_op_tt, tt_reshape(X_tt, (4,))),
               bias_tt),
        eps=1e-12,
    )
    primal_err = float(tt_inner_prod(primal_res, primal_res))
    dual_res = tt_rank_reduce(
        tt_sub(
            tt_fast_matrix_vec_mul(
                tt_transpose(L_op_tt), tt_reshape(Y_tt, (4,)), eps=1e-12
            ),
            tt_rank_reduce(tt_add(tt_reshape(Z_tt, (4,)), obj_tt), eps=1e-12),
        ),
        eps=1e-12,
    )
    if info["status"].ineq_status is IneqStatus.ACTIVE:
        dual_res = tt_rank_reduce(
            tt_sub(dual_res, tt_reshape(T_tt, (4,))), eps=1e-12
        )
    dual_err = float(tt_inner_prod(dual_res, dual_res))

    result = {
        "name": name, "seed": seed, "rank": args.rank,
        "creation_s": round(creation_s, 2),
        "solve_s_last_attempt": round(solve_s, 2),
        "num_iters": int(info["num_iters"]),
        "complementary_slackness": slack,
        "feasibility_error": primal_err,
        "dual_feasibility_error": dual_err,
        "converged": bool(slack < float(config["abs_tol"])),
        "ranksX": [int(r) for r in info["ranksX"]],
        "ranksZ": [int(r) for r in info["ranksZ"]],
    }
    with open(result_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"[long_run] {name}: {json.dumps(result)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
