"""Parametrised baseline runner: one module replacing the reference's ten
per-problem baseline scripts.

Role parity: /root/reference/psd_system/{maxcut,corr_clust,
max_stable_set,graphm}/*_{scs,sdpa,scgal,manopt}.py (~1,550 LoC of
near-identical copies).  Here the problem is densified once per
(problem, solver) pair and dispatched; the retry-with-new-seed loop
(maxcut_scs.py:45-95), metric schema, and summary table match the
reference.

CLI:
    python -m ttipm_tpu.utils.baseline_runner --problem maxcut \
        --solver scs|sdpa|cgal|scgal|manopt --config configs/maxcut_5.yaml \
        [--rank 1] [--track_mem]

(equivalently ``python -m ttipm_tpu.utils.runner --solver scs ...``).

Solver availability mirrors the reference: scs/sdpa for every family,
cgal/scgal for maxcut and max_stable_set (maxcut_scgal.py,
max_stable_set_scgal.py), manopt (native Riemannian trust regions,
models/riemannian.py) for maxcut (maxcut_manopt.py).  scs/sdpa need the
optional packages; the encodings themselves are always built and
validated (models/conic.py).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, Optional

import numpy as np
import yaml

from ttipm_tpu.models import conic

SOLVERS = ("scs", "sdpa", "splitting", "cgal", "scgal", "manopt")

_SUPPORTED = {
    "maxcut": set(SOLVERS),
    "corr_clust": {"scs", "sdpa", "splitting"},
    "max_stable_set": {"scs", "sdpa", "splitting", "cgal", "scgal"},
    "graphm": {"scs", "sdpa", "splitting"},
}


def build_dense_problem(problem: str, dim: int, rank: int) -> Dict:
    """Densify the TT problem family into a ConicSDP plus the auxiliary
    data the CGAL-family solvers need.  Must be called after
    ``np.random.seed`` (graph sampling matches the TT runner's seed)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ttipm_tpu.ops.random import tt_random_graph
    from ttipm_tpu.ops.rounding import tt_rank_reduce
    from ttipm_tpu.ops.tt import tt_matrix_to_matrix, tt_reshape

    if problem == "maxcut":
        from ttipm_tpu.models.maxcut import tt_obj_matrix

        C = np.asarray(tt_matrix_to_matrix(tt_reshape(
            tt_obj_matrix(rank, dim), (2, 2))), dtype=float)
        prob = conic.maxcut_conic(C)
        n = C.shape[0]
        constraints = [np.outer(np.eye(n)[i], np.eye(n)[i]) for i in range(n)]
        bias = np.ones((n, 1))
        trace_param = float(2 ** dim)
        return {"C": C, "conic": prob, "constraints": constraints,
                "bias": bias, "trace_params": (trace_param, trace_param)}

    if problem == "corr_clust":
        from ttipm_tpu.models.corr_clust import tt_obj_matrix_and_ineq_mask

        obj_tt, mask_tt = tt_obj_matrix_and_ineq_mask(rank, dim)
        C = np.asarray(tt_matrix_to_matrix(obj_tt), dtype=float)
        mask = np.round(np.asarray(tt_matrix_to_matrix(mask_tt)), 1)
        prob = conic.corr_clust_conic(C, mask, beta=0.0)
        return {"C": C, "conic": prob, "mask": mask}

    if problem == "max_stable_set":
        G = tt_rank_reduce(tt_random_graph(dim, rank))
        adj = np.round(np.asarray(tt_matrix_to_matrix(G)), 1)
        n = adj.shape[0]
        C = np.ones((n, n))
        prob = conic.max_stable_set_conic(C, adj)
        # CGAL form: per-edge selectors + trace(X) = 1
        constraints = []
        bias_list = []
        ii, jj = np.nonzero(np.triu(adj))
        for i, j in zip(ii.tolist(), jj.tolist()):
            A = np.zeros((n, n))
            A[i, j] = A[j, i] = 0.5 * adj[i, j]
            constraints.append(A)
            bias_list.append(0.0)
        constraints.append(np.eye(n))
        bias_list.append(1.0)
        return {"C": C, "conic": prob, "adj": adj,
                "constraints": constraints,
                "bias": np.asarray(bias_list).reshape(-1, 1),
                "trace_params": (1.0, 1.0)}

    if problem == "graphm":
        n_g = 2 ** dim
        G_A = np.asarray(tt_matrix_to_matrix(tt_random_graph(dim, rank)))
        G_B = np.asarray(tt_matrix_to_matrix(tt_random_graph(dim, rank)))
        q = n_g * n_g
        C = np.zeros((q + 1, q + 1))
        C[:q, :q] = np.kron(G_B, G_A)
        prob = conic.graphm_conic(C, n_g)
        return {"C": C, "conic": prob, "n_graph": n_g}

    raise ValueError(f"unknown problem {problem!r}")


def solve_baseline(solver: str, problem: str, dense: Dict, config: Dict,
                   verbose: bool = False, seed: Optional[int] = None) -> Dict:
    """Dispatch one densified instance; returns at least x_matrix,
    objective, iterations, and (when the solver exposes duals) z_matrix."""
    dim = config["dim"]
    prob: conic.ConicSDP = dense["conic"]
    if solver == "scs":
        sol = conic.solve_scs(prob, eps=1e-5 / dim, verbose=verbose)
    elif solver == "splitting":
        # native in-image SCS-class ADMM (conic.solve_splitting): the
        # cross-solver ground-truth axis that needs no pip wheel
        return conic.solve_splitting(prob, tol=1e-7, verbose=verbose)
    elif solver == "sdpa":
        sol = conic.solve_sdpa(prob)
    elif solver in ("cgal", "scgal"):
        from ttipm_tpu.models.baselines import cgal, sketchy_cgal

        trace_param = dense["trace_params"][1]
        C = dense["C"].copy()
        # reference scaling: ||C|| = trace budget (maxcut_scgal.py:45-46)
        C *= trace_param / max(np.linalg.norm(C), 1e-300)
        num_iter = 1000 * 2 ** dim
        if solver == "cgal":
            X, gaps, info = cgal(
                -C, dense["constraints"], dense["bias"],
                dense["trace_params"], gap_tol=0.1, num_iter=num_iter,
                verbose=verbose)
        else:
            sketch = 2 * int(np.ceil(np.sqrt(2 * (2 ** dim + 1))))
            X, gaps, info = sketchy_cgal(
                -C, dense["constraints"], dense["bias"],
                dense["trace_params"], gap_tol=0.1, num_iter=num_iter,
                R=sketch, verbose=verbose)
        return {"x_matrix": X, "objective": float(np.sum(dense["C"] * X)),
                "iterations": info.get("num_iters", len(gaps)),
                "gap": gaps[-1] if len(gaps) else np.nan}
    elif solver == "manopt":
        from ttipm_tpu.models.riemannian import solve_maxcut_manopt

        res = solve_maxcut_manopt(
            dense["C"],
            rank=config.get("riem_rank"),
            max_iterations=int(config.get("riem_max_iter", 500)),
            min_gradient_norm=float(config.get(
                "riem_min_grad_norm", config.get("gap_tol", 1e-6))),
            seed=seed, verbose=verbose)
        return res
    else:
        raise ValueError(f"unknown solver {solver!r}")
    return sol


def run_baseline_experiment(argv=None) -> Dict:
    parser = argparse.ArgumentParser(description="SDP baseline runner")
    parser.add_argument("--problem", required=True,
                        choices=tuple(_SUPPORTED))
    parser.add_argument("--solver", required=True, choices=SOLVERS)
    parser.add_argument("--config", required=True)
    parser.add_argument("--rank", type=int, default=1)
    parser.add_argument("--track_mem", action="store_true")
    args = parser.parse_args(argv)

    if args.solver not in _SUPPORTED[args.problem]:
        parser.error(
            f"{args.solver} is not run for {args.problem} in the reference "
            f"protocol; choose from {sorted(_SUPPORTED[args.problem])}")

    with open(args.config) as fh:
        config = dict(yaml.safe_load(fh))

    num_seeds = len(config["seeds"])
    rec = {
        "problem_creation_times": np.zeros(num_seeds),
        "runtimes": np.zeros(num_seeds),
        "memory": np.zeros(num_seeds),
        "complementary_slackness": np.full(num_seeds, np.nan),
        "feasibility_errors": np.zeros(num_seeds),
        "dual_feasibility_errors": np.full(num_seeds, np.nan),
        "num_iters": np.zeros(num_seeds),
        "objective": np.zeros(num_seeds),
        "num_failed_seeds": 0,
    }

    for s_i, seed in enumerate(config["seeds"]):
        for attempt in range(3):  # retry-with-new-seed (maxcut_scs.py:45-95)
            current_seed = seed if attempt == 0 else int(
                np.random.randint(0, 10000))
            if attempt:
                print(f"Trying with new random seed: {current_seed}",
                      flush=True)
            np.random.seed(current_seed)
            try:
                def build_and_solve():
                    t1 = time.time()
                    dense = build_dense_problem(
                        args.problem, config["dim"], args.rank)
                    t2 = time.time()
                    sol = solve_baseline(
                        args.solver, args.problem, dense, config,
                        verbose=config.get("verbose", False),
                        seed=current_seed)
                    t3 = time.time()
                    return dense, sol, t2 - t1, t3 - t2

                if args.track_mem:
                    from ttipm_tpu.utils.memtrack import measure_peak_rss

                    peak_mb, payload = measure_peak_rss(build_and_solve)
                    rec["memory"][s_i] = peak_mb
                else:
                    payload = build_and_solve()
                dense, sol, t_create, t_solve = payload
                break
            except Exception as e:  # noqa: BLE001 — per-seed failure
                print(f"{type(e).__name__}: {e}", flush=True)
                if attempt == 2:
                    rec["num_failed_seeds"] += 1
        else:
            continue

        prob = dense["conic"]
        X = np.asarray(sol["x_matrix"])
        rec["problem_creation_times"][s_i] = t_create
        rec["runtimes"][s_i] = t_solve
        rec["objective"][s_i] = sol.get(
            "objective", float(np.sum(prob.C * X)))
        rec["num_iters"][s_i] = float(sol.get("iterations", 0))
        eq_res = prob.eq_residual(X)
        ineq_vio = prob.ineq_violation(X)
        rec["feasibility_errors"][s_i] = (
            float(eq_res @ eq_res) + float(ineq_vio @ ineq_vio))
        if sol.get("z_matrix") is not None:
            Z = np.asarray(sol["z_matrix"])
            rec["complementary_slackness"][s_i] = abs(float(np.sum(X * Z)))

        print(
            f"[{args.solver}] seed {current_seed}: obj "
            f"{rec['objective'][s_i]:.6e}, feas "
            f"{rec['feasibility_errors'][s_i]:.3e}, "
            f"iters {rec['num_iters'][s_i]:.0f}, "
            f"time {t_solve:.2f}s", flush=True)

    _print_summary(args, config, rec)
    _save_summary(args, config, rec)
    return rec


def _print_summary(args, config, rec) -> None:
    print(f"\n=== {args.problem} dim {config['dim']} — {args.solver} ===")
    for key in ("runtimes", "problem_creation_times", "objective",
                "feasibility_errors", "num_iters", "memory"):
        vals = rec[key]
        print(f"  {key}: mean {np.nanmean(vals):.4e} ± "
              f"{np.nanstd(vals):.4e}  median {np.nanmedian(vals):.4e} "
              f" worst {np.nanmax(vals):.4e}")
    print(f"  failed seeds: {rec['num_failed_seeds']}")


def _save_summary(args, config, rec) -> None:
    results_dir = os.path.join(os.getcwd(), "results")
    os.makedirs(results_dir, exist_ok=True)
    payload = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
               for k, v in rec.items()}
    payload["config"] = config
    payload["solver"] = args.solver
    payload["problem"] = args.problem
    out = os.path.join(
        results_dir,
        f"{args.problem}_{config['dim']}_{args.solver}_rank{args.rank}.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=2, sort_keys=True)
    print(f"results written to {out}")


if __name__ == "__main__":
    run_baseline_experiment()
