#!/usr/bin/env python
"""Round-4 protocol grid: multi-seed statistics + top-of-grid completion.

The round-3 verdict's items 5 and 10: populate the reference's reporting
fields (mean±std / median[IQR] over seeds, /root/reference/src/utils.py:
118-207) at protocol scale — 3 seeds for the mid dims of every family —
and finish the top of the grid (maxcut 11-13, corr_clust 11,
max_stable_set 11, graphm 2-3) that previous rounds timed out on.

Reuses the crash-isolated subprocess runner of grid_r2.py; records under
results/grid_r4/.  Resumable: seeds already logged with exit 0 are
skipped.

Usage:  python scripts/grid_r4.py [--deadline-hours 6] [--phase all|stats|top]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import grid_r2


# Multi-seed statistics phase: 3 seeds per (problem, dim).
STATS = []
for _d in [3, 5, 6, 7, 8, 9, 10]:
    for _s in range(3):
        STATS.append(("maxcut", _d, _s, 1800))
for _d in [3, 4, 5, 6, 7, 8, 9, 10]:
    for _s in range(3):
        STATS.append(("corr_clust", _d, _s, 1800))
for _d in [6, 7, 8, 9, 10]:
    for _s in range(3):
        STATS.append(("max_stable_set", _d, _s, 1800))

# Top-of-grid phase: the dims previous rounds never finished.
TOP = [
    ("maxcut", 11, 0, 3600),
    ("corr_clust", 11, 0, 5400),
    ("max_stable_set", 11, 0, 5400),
    ("maxcut", 12, 0, 7200),
    ("graphm", 2, 0, 7200),
    ("maxcut", 13, 0, 14400),
    ("graphm", 3, 0, 28800),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline-hours", type=float, default=6.0)
    ap.add_argument("--phase", choices=["all", "stats", "top"],
                    default="all")
    ap.add_argument("--start-at", type=str, default=None)
    args = ap.parse_args()

    plan = {"all": STATS + TOP, "stats": STATS, "top": TOP}[args.phase]
    deadline = time.time() + args.deadline_hours * 3600
    grid_dir = os.path.join(REPO, "results", "grid_r4")
    os.makedirs(grid_dir, exist_ok=True)
    log_jsonl = os.path.join(grid_dir, "grid_log.jsonl")

    # point the shared runner at the round-4 directory
    started = args.start_at is None
    for problem, dim, seed_idx, timeout_s in plan:
        name = f"{problem}_{dim}_s{seed_idx}"
        if not started:
            if name == args.start_at:
                started = True
            else:
                continue
        if os.path.exists(log_jsonl):
            with open(log_jsonl) as fh:
                done = any(
                    json.loads(l).get("name") == name
                    and json.loads(l).get("exit_code") == 0
                    for l in fh if l.strip()
                )
            if done:
                print(f"[grid4] {name}: already done", flush=True)
                continue
        remaining = deadline - time.time()
        if remaining < 120:
            print("[grid4] deadline reached, stopping", flush=True)
            break
        budget = int(min(timeout_s, remaining))
        print(f"[grid4] running {name} (timeout {budget}s)", flush=True)
        rec = grid_r2.run_one(problem, dim, seed_idx, budget,
                              os.path.join(grid_dir, name + ".log"),
                              out_root="grid_r4")
        rec["grid"] = "r4"
        with open(log_jsonl, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        status = ("timeout" if rec.get("timed_out")
                  else f"exit={rec.get('exit_code')}")
        print(f"[grid4] {name}: {status} in {rec.get('wall_s')}s",
              flush=True)


if __name__ == "__main__":
    main()
