"""Experiment harness: YAML-configured benchmark runs with the reference's
metric schema, seed-resampling policy and results JSON.

Parity: /root/reference/src/utils.py:13-321.  CLI:

    python -m ttipm_tpu.utils.runner --problem maxcut \
        --config configs/maxcut_5.yaml [--rank 1] [--track_mem] [--platform cpu]

Differences from the reference: the problem family is selected by flag
(the reference dispatches by which script you invoke); device-memory
tracking reads JAX's live-buffer stats instead of process RSS when a
device backend is active.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import time
from typing import Callable, Dict, Optional

import numpy as np
import yaml

PROBLEMS = ("maxcut", "corr_clust", "max_stable_set", "graphm")


def load_problem(name: str) -> Callable:
    if name == "maxcut":
        from ttipm_tpu.models.maxcut import create_problem
    elif name == "corr_clust":
        from ttipm_tpu.models.corr_clust import create_problem
    elif name == "max_stable_set":
        from ttipm_tpu.models.max_stable_set import create_problem
    elif name == "graphm":
        from ttipm_tpu.models.graphm import create_problem
    else:
        raise ValueError(f"unknown problem {name!r}; choose from {PROBLEMS}")
    return create_problem


def _device_peak_mem_mb() -> float:
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return stats["peak_bytes_in_use"] / 1e6
    except Exception:
        pass
    return float("nan")


def _peak_mem_mb(rss_tracker) -> float:
    """Reference metric: peak process-tree RSS delta over the solve
    (src/utils.py:292-297).  On a device backend the device buffer peak is
    reported when it exceeds host RSS growth (the iterates live on-chip)."""
    rss = rss_tracker.peak_delta_mb if rss_tracker is not None else float("nan")
    dev = _device_peak_mem_mb()
    import jax

    if jax.default_backend() != "cpu" and np.isfinite(dev):
        return max(rss, dev) if np.isfinite(rss) else dev
    return rss


def run_and_record(seed, s_i, rank, config, args, create_problem_fn, rec):
    """One seeded solve + metric extraction (src/utils.py:245-321)."""
    from ttipm_tpu.ipm import IneqStatus, tt_ipm
    from ttipm_tpu.ops.products import tt_fast_matrix_vec_mul
    from ttipm_tpu.ops.rounding import tt_rank_reduce
    from ttipm_tpu.ops.tt import (
        tt_add,
        tt_inner_prod,
        tt_reshape,
        tt_sub,
        tt_transpose,
    )

    rss_tracker = None
    if args.track_mem:
        from ttipm_tpu.utils.memtrack import PeakRSSTracker

        rss_tracker = PeakRSSTracker().__enter__()

    np.random.seed(seed)
    t1 = time.time()
    problem = create_problem_fn(config["dim"], rank)
    if len(problem) == 5:
        obj_tt, L_op_tt, bias_tt, ineq_mask, lag_maps = problem
    else:
        obj_tt, L_op_tt, bias_tt, lag_y = problem
        ineq_mask = None
        lag_maps = {"y": lag_y}
    lag_maps = {k: tt_reshape(v, (4, 4)) for k, v in lag_maps.items()}
    obj_tt = tt_reshape(obj_tt, (4,))
    bias_tt = tt_reshape(bias_tt, (4,))
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
    )
    t3 = time.time()

    rec["problem_creation_times"][s_i] = t2 - t1
    rec["runtimes"][s_i] = t3 - t2
    rec["complementary_slackness"][s_i] = abs(tt_inner_prod(X_tt, Z_tt))
    primal_res = tt_rank_reduce(
        tt_sub(
            tt_fast_matrix_vec_mul(L_op_tt, tt_reshape(X_tt, (4,))), bias_tt
        ),
        eps=1e-12,
    )
    rec["feasibility_errors"][s_i] = tt_inner_prod(primal_res, primal_res)
    dual_res = tt_rank_reduce(
        tt_sub(
            tt_fast_matrix_vec_mul(tt_transpose(L_op_tt), tt_reshape(Y_tt, (4,)), eps=1e-12),
            tt_rank_reduce(tt_add(tt_reshape(Z_tt, (4,)), obj_tt), eps=1e-12),
        ),
        eps=1e-12,
    )
    if info["status"].ineq_status is IneqStatus.ACTIVE:
        dual_res = tt_rank_reduce(
            tt_sub(dual_res, tt_reshape(T_tt, (4,))), eps=1e-12
        )
    rec["dual_feasibility_errors"][s_i] = tt_inner_prod(dual_res, dual_res)
    rec["num_iters"][s_i] = info["num_iters"]
    rec["ranksX"][s_i, :] = info["ranksX"]
    rec["ranksY"][s_i, :] = info["ranksY"]
    rec["ranksZ"][s_i, :] = info["ranksZ"]
    if rec.get("ranksT") is not None:
        rec["ranksT"][s_i, :] = info["ranksT"]
    if args.track_mem:
        rss_tracker.__exit__()
        rec["memory"][s_i] = _peak_mem_mb(rss_tracker)

    print(
        f"Convergence after {rec['num_iters'][s_i]:.0f} iterations. "
        f"Compl slackness: {rec['complementary_slackness'][s_i]:.4e}. "
        f"Feasibility error: {rec['feasibility_errors'][s_i]:.4e}. "
        f"Dual feasibility error: {rec['dual_feasibility_errors'][s_i]:.4e}. "
        f"Time: {rec['runtimes'][s_i]:.2f}s.",
        flush=True,
    )
    return rec["feasibility_errors"][s_i], rec["complementary_slackness"][s_i]


def run_experiment(create_problem_fn=None, argv=None, problem_name=None):
    parser = argparse.ArgumentParser(description="TT-IPM experiment runner")
    parser.add_argument("--problem", type=str, default=problem_name, choices=PROBLEMS)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--rank", type=int, default=1)
    parser.add_argument("--track_mem", action="store_true")
    parser.add_argument("--platform", type=str,
                        default=os.environ.get("TTIPM_PLATFORM", "cpu"),
                        help="jax platform (cpu / axon / tpu).  Defaults to "
                             "cpu ($TTIPM_PLATFORM overrides): eager TT "
                             "orchestration over a tunneled remote TPU pays "
                             "~100ms latency per op, so 'axon' is only "
                             "useful on a directly-attached chip.  Pass "
                             "'default' to keep the session backend.")
    parser.add_argument("--no_resample", action="store_true",
                        help="disable pathological-seed resampling")
    parser.add_argument("--solver", type=str, default="ttipm",
                        choices=("ttipm", "scs", "sdpa", "cgal", "scgal",
                                 "manopt"),
                        help="ttipm (default) runs the TT-IPM; any other "
                             "value dispatches to the dense baseline "
                             "runner (utils/baseline_runner.py)")
    args = parser.parse_args(argv)

    if args.solver != "ttipm":
        from ttipm_tpu.utils.baseline_runner import run_baseline_experiment

        baseline_argv = ["--problem", args.problem or problem_name,
                         "--solver", args.solver,
                         "--config", args.config,
                         "--rank", str(args.rank)]
        if args.track_mem:
            baseline_argv.append("--track_mem")
        return run_baseline_experiment(baseline_argv)

    if args.platform and args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ttipm_tpu import config as ttipm_config

    ttipm_config.enable_persistent_cache()

    if create_problem_fn is None:
        if args.problem is None:
            parser.error("--problem is required")
        create_problem_fn = load_problem(args.problem)

    with open(args.config, "r") as fh:
        config = yaml.safe_load(fh)

    num_seeds = len(config["seeds"])
    dim = config["dim"]
    n_bonds = 2 * dim if (args.problem == "graphm") else dim - 1

    rec: Dict[str, np.ndarray] = {
        "problem_creation_times": np.zeros(num_seeds),
        "runtimes": np.zeros(num_seeds),
        "memory": np.zeros(num_seeds),
        "complementary_slackness": np.zeros(num_seeds),
        "feasibility_errors": np.zeros(num_seeds),
        "dual_feasibility_errors": np.zeros(num_seeds),
        "num_iters": np.zeros(num_seeds),
        "ranksX": np.zeros((num_seeds, n_bonds)),
        "ranksY": np.zeros((num_seeds, n_bonds)),
        "ranksZ": np.zeros((num_seeds, n_bonds)),
        "ranksT": np.zeros((num_seeds, n_bonds)),
    }

    used_seeds = set(config["seeds"])
    for s_i, seed in enumerate(config["seeds"]):
        print(f"Running seed {seed}", flush=True)
        feas, slack = run_and_record(seed, s_i, args.rank, config, args,
                                     create_problem_fn, rec)
        new_seed = seed
        while (not args.no_resample) and ((feas > 1e-3) or (slack > 1e-3)):
            # Pathological-seed resampling (src/utils.py:67-84); unlike the
            # reference we do not rewrite the YAML on disk.
            print(
                f"Seed {new_seed} is pathological (feas {feas:.2e}, "
                f"slack {slack:.2e}); drawing a new seed.",
                flush=True,
            )
            new_seed = int(np.random.randint(0, 2**10))
            while new_seed in used_seeds:
                new_seed = int(np.random.randint(0, 2**10))
            used_seeds.add(new_seed)
            config["seeds"][s_i] = new_seed
            feas, slack = run_and_record(new_seed, s_i, args.rank, config, args,
                                         create_problem_fn, rec)

    print_results_summary(config, args, rec)
    save_results_summary(config, args, rec)
    return rec


def _fmt_ranks(mean, std, precision=1):
    if mean is None:
        return "N/A"
    parts = [f"{m:.{precision}f}±{s:.{precision}f}" for m, s in zip(mean, std)]
    return "[" + ", ".join(parts) + "]"


def print_results_summary(config, args, rec):
    """Formatted metric table (src/utils.py:118-207)."""
    print("\n" + "=" * 80)
    print(f"{'FINAL RESULTS SUMMARY':^80}")
    print("=" * 80)
    rt = np.asarray(rec["runtimes"], dtype=np.float64)
    q1, q3 = np.nanpercentile(rt, [25, 75])

    rows = [
        ("Solution Time (s)", f"{np.nanmean(rt):.3f} ± {np.nanstd(rt):.3f}"),
        ("Runtime Median [IQR] (s)", f"{np.nanmedian(rt):.3f} [{q3-q1:.3f}]"),
        ("Worst Runtime (s)", f"{np.nanmax(rt):.3f}"),
        ("Problem Creation (s)",
         f"{np.nanmean(rec['problem_creation_times']):.3f} ± "
         f"{np.nanstd(rec['problem_creation_times']):.3f}"),
        ("Iterations",
         f"{np.nanmean(rec['num_iters']):.1f} ± {np.nanstd(rec['num_iters']):.1f}"),
        ("Feasibility Error",
         f"{np.nanmean(rec['feasibility_errors']):.2e} ± "
         f"{np.nanstd(rec['feasibility_errors']):.2e}"),
        ("Dual Feasibility Error",
         f"{np.nanmean(rec['dual_feasibility_errors']):.2e} ± "
         f"{np.nanstd(rec['dual_feasibility_errors']):.2e}"),
        ("Duality Gap",
         f"{np.nanmean(rec['complementary_slackness']):.2e} ± "
         f"{np.nanstd(rec['complementary_slackness']):.2e}"),
    ]
    if args.track_mem:
        rows.append(("Peak Device Memory (MB)",
                     f"{np.nanmean(rec['memory']):.3f} ± {np.nanstd(rec['memory']):.3f}"))
    print(f"  {'Metric':<28} | {'Value':>25}")
    print(f"  {'-'*28} | {'-'*25}")
    for name, value in rows:
        print(f"  {name:<28} | {value:>25}")
    print(f"  {'-'*28} | {'-'*25}")
    print("  Rank Statistics")
    for key in ("ranksX", "ranksY", "ranksZ", "ranksT"):
        arr = rec.get(key)
        if arr is None:
            continue
        print(f"    {key:<24}: {_fmt_ranks(np.nanmean(arr, 0), np.nanstd(arr, 0))}")
    print("=" * 80, flush=True)


def save_results_summary(config, args, rec, filename: Optional[str] = None):
    """Results JSON with the reference's schema (src/utils.py:210-243)."""
    cfg_tag = os.path.splitext(os.path.basename(args.config))[0]
    base = (
        f"{cfg_tag}_trackmem_{args.track_mem}"
        f"_seeds_{'-'.join(map(str, config.get('seeds', [])))}"
        f"_ranks_{args.rank}.json"
    )
    base = re.sub(r"[^a-zA-Z0-9_.-]", "_", base)
    results_dir = os.path.join(os.getcwd(), "results")
    os.makedirs(results_dir, exist_ok=True)
    if filename is None:
        filename = os.path.join(results_dir, base)
    data = {
        "config_str": str(config),
        "args_str": str(vars(args)),
        "runtimes": [rec["runtimes"].tolist()],
        "problem_creation_times": [rec["problem_creation_times"].tolist()],
        "num_iters": [rec["num_iters"].tolist()],
        "feasibility_errors": [rec["feasibility_errors"].tolist()],
        "dual_feasibility_errors": [rec["dual_feasibility_errors"].tolist()],
        "complementary_slackness": [rec["complementary_slackness"].tolist()],
        "ranksX": [rec["ranksX"].tolist()],
        "ranksY": [rec["ranksY"].tolist()],
        "ranksZ": [rec["ranksZ"].tolist()],
        "ranksT": [rec["ranksT"].tolist()] if rec.get("ranksT") is not None else [],
        "memory": [rec["memory"].tolist()],
    }
    with open(filename, "w") as fh:
        json.dump(data, fh, indent=2)
    print(f"results written to {filename}")


if __name__ == "__main__":
    import sys

    # Suppress the XLA:CPU AOT loader's per-entry E-spam (see bench.py /
    # ttipm_tpu/config.py); TSL latches the env var at jax import, which a
    # sitecustomize hook performs before this module runs, so a re-exec
    # with the var set is the only reliable switch.
    if (
        os.environ.get("TF_CPP_MIN_LOG_LEVEL") != "3"
        and os.environ.get("TTIPM_NO_REEXEC") is None
    ):
        os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
        os.environ["TTIPM_NO_REEXEC"] = "1"
        os.execv(
            sys.executable,
            [sys.executable, "-m", "ttipm_tpu.utils.runner"] + sys.argv[1:],
        )
    run_experiment()
