#!/usr/bin/env python
"""Round-2 benchmark-grid driver.

Covers the reference protocol grid (SURVEY.md §6: maxcut d∈{3,5..13},
corr_clust d∈{2..11}, max_stable_set d∈{2,6..11}, graphm n∈{2,3,4}) on the
CPU backend, one seeded run per subprocess (crash-isolated, per-run
timeout), breadth-first: every (problem, dim) once before extra seeds.

Each run executes ``python -m ttipm_tpu.utils.runner`` with a temp
single-seed config in its own working dir under results/grid_r2/ and the
driver records a one-line JSON verdict per run in
results/grid_r2/grid_log.jsonl.

Usage:  python scripts/grid_r2.py [--deadline-hours 11] [--start-at NAME]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (problem, dim, seed_index, timeout_s).  Breadth first; timeouts are
# this session's wall-clock budget, not the reference's 40000*d.
PHASE_A = [
    ("maxcut", 9, 0, 3600),
    ("corr_clust", 6, 0, 3600),
    ("max_stable_set", 7, 0, 5400),
    ("maxcut", 10, 0, 5400),
    ("corr_clust", 7, 0, 5400),
    ("max_stable_set", 8, 0, 7200),
    ("corr_clust", 8, 0, 7200),
    ("maxcut", 11, 0, 9000),
    ("corr_clust", 9, 0, 9000),
    ("max_stable_set", 9, 0, 9000),
    ("corr_clust", 10, 0, 10800),
    ("maxcut", 12, 0, 14400),
    ("max_stable_set", 10, 0, 10800),
    ("corr_clust", 11, 0, 14400),
    ("max_stable_set", 11, 0, 14400),
    ("maxcut", 13, 0, 21600),
    ("graphm", 3, 0, 21600),
]
# Extra seeds on the dims the round-1 table already reached, to give the
# mean±std the protocol asks for.
PHASE_B = [
    ("maxcut", 9, 1, 3600),
    ("corr_clust", 6, 1, 3600),
    ("maxcut", 9, 2, 3600),
    ("corr_clust", 6, 2, 3600),
    ("max_stable_set", 7, 1, 5400),
    ("maxcut", 10, 1, 5400),
    ("corr_clust", 7, 1, 5400),
    ("maxcut", 10, 2, 5400),
    ("corr_clust", 7, 2, 5400),
    ("max_stable_set", 7, 2, 5400),
]


def run_one(problem: str, dim: int, seed_idx: int, timeout_s: int,
            log_path: str, out_root: str = "grid_r2") -> dict:
    cfg_path = os.path.join(REPO, "configs", f"{problem}_{dim}.yaml")
    with open(cfg_path) as fh:
        config = dict(yaml.safe_load(fh))
    seeds = config["seeds"]
    if seed_idx >= len(seeds):
        return {"skipped": f"no seed index {seed_idx}"}
    seed = seeds[seed_idx]
    config["seeds"] = [seed]
    config["verbose"] = True

    name = f"{problem}_{dim}_s{seed_idx}"
    workdir = os.path.join(REPO, "results", out_root, name)
    os.makedirs(workdir, exist_ok=True)
    tmp_cfg = os.path.join(workdir, "config.yaml")
    with open(tmp_cfg, "w") as fh:
        yaml.safe_dump(config, fh)

    env = dict(os.environ)
    # CPU-only children: never claim the session TPU the foreground holds.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["TF_CPP_MIN_LOG_LEVEL"] = "3"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("XLA_FLAGS", "--xla_backend_optimization_level=0")

    t0 = time.time()
    out = {"name": name, "problem": problem, "dim": dim, "seed": seed,
           "seed_index": seed_idx, "timeout_s": timeout_s}
    with open(log_path, "w") as logf:
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "ttipm_tpu.utils.runner",
                 "--problem", problem, "--config", tmp_cfg,
                 "--rank", "1", "--platform", "cpu", "--no_resample"],
                cwd=workdir, env=env, timeout=timeout_s,
                stdout=logf, stderr=subprocess.STDOUT,
            )
            out["exit_code"] = proc.returncode
            out["timed_out"] = False
        except subprocess.TimeoutExpired:
            out["exit_code"] = None
            out["timed_out"] = True
    out["wall_s"] = round(time.time() - t0, 1)

    # Pull the runner's JSON results (written under workdir/results/).
    res_dir = os.path.join(workdir, "results")
    if os.path.isdir(res_dir):
        for fn in sorted(os.listdir(res_dir)):
            if fn.endswith(".json"):
                with open(os.path.join(res_dir, fn)) as fh:
                    out["results"] = json.load(fh)
                out["results_file"] = os.path.join(res_dir, fn)
                break
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline-hours", type=float, default=11.0)
    ap.add_argument("--start-at", type=str, default=None,
                    help="skip entries before this name, e.g. maxcut_11_s0")
    args = ap.parse_args()

    deadline = time.time() + args.deadline_hours * 3600
    grid_dir = os.path.join(REPO, "results", "grid_r2")
    os.makedirs(grid_dir, exist_ok=True)
    log_jsonl = os.path.join(grid_dir, "grid_log.jsonl")

    started = args.start_at is None
    for problem, dim, seed_idx, timeout_s in PHASE_A + PHASE_B:
        name = f"{problem}_{dim}_s{seed_idx}"
        if not started:
            if name == args.start_at:
                started = True
            else:
                continue
        # Skip runs already recorded (resume support).
        if os.path.exists(log_jsonl):
            with open(log_jsonl) as fh:
                if any(json.loads(l).get("name") == name and
                       json.loads(l).get("exit_code") == 0
                       for l in fh if l.strip()):
                    print(f"[grid] {name}: already done, skipping", flush=True)
                    continue
        remaining = deadline - time.time()
        if remaining < 300:
            print("[grid] deadline reached, stopping", flush=True)
            break
        budget = int(min(timeout_s, remaining))
        print(f"[grid] running {name} (timeout {budget}s)", flush=True)
        rec = run_one(problem, dim, seed_idx, budget,
                      os.path.join(grid_dir, name + ".log"))
        with open(log_jsonl, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        status = ("timeout" if rec.get("timed_out")
                  else f"exit={rec.get('exit_code')}")
        print(f"[grid] {name}: {status} in {rec.get('wall_s')}s", flush=True)


if __name__ == "__main__":
    main()
