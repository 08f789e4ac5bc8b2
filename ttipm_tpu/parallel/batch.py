"""Process-parallel seed batches.

The reference scales out by submitting independent seeds/dims as HTCondor
jobs (SURVEY.md §2.3).  On a single host this module runs a config's
seeds as parallel worker processes (each with its own JAX runtime); on a
TPU pod slice the same axis becomes the mesh's ``seeds`` dimension
(``ttipm_tpu.parallel.mesh``).

Usage:
    python -m ttipm_tpu.parallel.batch --problem maxcut \
        --config configs/maxcut_5.yaml --workers 2 [--rank 1]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
from typing import List


def _worker(problem: str, config_path: str, seed: int, rank: int,
            platform: str, out_path: str) -> None:
    # Fresh process: pin the backend before jax initializes anything.
    os.environ.setdefault(
        "XLA_FLAGS",
        "--xla_backend_optimization_level=0" if platform == "cpu" else "",
    )
    import jax

    jax.config.update("jax_platforms", platform)
    import numpy as np
    import yaml

    from ttipm_tpu.utils import runner

    with open(config_path) as fh:
        config = dict(yaml.safe_load(fh))
    config["seeds"] = [seed]

    create_problem = runner.load_problem(problem)
    rec = {
        "problem_creation_times": np.zeros(1),
        "runtimes": np.zeros(1),
        "memory": np.zeros(1),
        "complementary_slackness": np.zeros(1),
        "feasibility_errors": np.zeros(1),
        "dual_feasibility_errors": np.zeros(1),
        "num_iters": np.zeros(1),
        "ranksX": np.zeros((1, 2 * config["dim"] if problem == "graphm" else config["dim"] - 1)),
        "ranksY": np.zeros((1, 2 * config["dim"] if problem == "graphm" else config["dim"] - 1)),
        "ranksZ": np.zeros((1, 2 * config["dim"] if problem == "graphm" else config["dim"] - 1)),
        "ranksT": np.zeros((1, 2 * config["dim"] if problem == "graphm" else config["dim"] - 1)),
    }

    class _Args:
        track_mem = False

    try:
        feas, slack = runner.run_and_record(
            seed, 0, rank, config, _Args(), create_problem, rec
        )
        result = {
            "seed": seed,
            "ok": True,
            "runtime": float(rec["runtimes"][0]),
            "num_iters": float(rec["num_iters"][0]),
            "slackness": float(rec["complementary_slackness"][0]),
            "feasibility_error": float(feas),
            "dual_feasibility_error": float(rec["dual_feasibility_errors"][0]),
        }
    except Exception as e:  # worker crash is a per-seed failure, not fatal
        result = {"seed": seed, "ok": False, "error": f"{type(e).__name__}: {e}"}
    tmp = out_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(result, fh)
    os.replace(tmp, out_path)


def run_batch(problem: str, config_path: str, seeds: List[int], rank: int = 1,
              workers: int = 2, platform: str = "cpu") -> List[dict]:
    """Solve ``seeds`` in parallel worker processes; returns per-seed
    result dicts."""
    import tempfile
    import time

    ctx = mp.get_context("spawn")
    # Results travel via per-seed JSON files: mp.Queue proved lossy under
    # this session's sitecustomize-managed runtime, and files make a
    # crashed worker observable as a missing result rather than a hang.
    out_dir = tempfile.mkdtemp(prefix="ttipm_batch_")
    # Children inherit os.environ at spawn.  In TPU sessions a
    # sitecustomize hook registers the device plugin in EVERY python
    # process and blocks claiming the chip the parent already holds —
    # strip it so CPU workers start cleanly.
    saved_env = {
        k: os.environ.pop(k)
        for k in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")
        if k in os.environ
    }
    os.environ["JAX_PLATFORMS"] = platform
    try:
        pending = list(seeds)
        running = []  # (process, seed, out_path)
        done = []
        while pending or running:
            while pending and len(running) < workers:
                seed = pending.pop(0)
                out_path = os.path.join(out_dir, f"seed_{seed}.json")
                p = ctx.Process(
                    target=_worker,
                    args=(problem, config_path, seed, rank, platform, out_path),
                )
                p.start()
                running.append((p, seed, out_path))
            time.sleep(1.0)
            still = []
            for p, seed, out_path in running:
                if p.is_alive():
                    still.append((p, seed, out_path))
                else:
                    p.join()
                    done.append((seed, out_path, p.exitcode))
            running = still
        results = []
        for seed, out_path, exitcode in done:
            if os.path.exists(out_path):
                with open(out_path) as fh:
                    results.append(json.load(fh))
            else:
                results.append(
                    {"seed": seed, "ok": False,
                     "error": f"worker exited with code {exitcode} and no result"}
                )
        return results
    finally:
        os.environ.pop("JAX_PLATFORMS", None)
        os.environ.update(saved_env)


def main(argv=None):
    parser = argparse.ArgumentParser(description="parallel seed batch runner")
    parser.add_argument("--problem", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--rank", type=int, default=1)
    parser.add_argument("--workers", type=int, default=2)
    parser.add_argument("--platform", type=str, default="cpu")
    args = parser.parse_args(argv)

    import yaml

    with open(args.config) as fh:
        seeds = yaml.safe_load(fh)["seeds"]
    results = run_batch(args.problem, args.config, seeds, args.rank,
                        args.workers, args.platform)
    print(json.dumps(results, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
