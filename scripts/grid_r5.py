#!/usr/bin/env python
"""Round-5 protocol grid: hard-seed validation + grid completion.

Phase "hard": the round-4 hard seeds (maxcut d6 s54, d9 s9313, d10
s23/s235, corr_clust d6 s764/s324, corr_clust d7 s493) re-run against the
round-5 fixes (un-stuck fused fallback, basis-limited ragged early break,
ALS warm-start product cache) — VERDICT.md round-4 item 1.

Phase "top": the never-finished top of the grid — corr_clust d11,
max_stable_set d11, maxcut d12 (resume)/d13, graphm n=3 — VERDICT.md
round-4 item 2.

Reuses the crash-isolated subprocess runner of grid_r2.py; records under
results/grid_r5/.  Resumable: runs already logged with exit 0 are skipped.

Usage:  python scripts/grid_r5.py [--deadline-hours 6] [--phase hard|top|all]
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

# (problem, dim, seed_index, timeout_s); seed indices address the same
# configs/ seed lists grid_r4 used, so the hard seeds match r4's rows.
HARD = [
    ("maxcut", 6, 1, 1500),       # seed 54  (r4: 997 s / timeout)
    ("maxcut", 9, 1, 1500),       # seed 9313 (r4: 889 s; ref mean 48 s)
    ("maxcut", 9, 0, 900),        # seed 395 (r4: 71 s — no-regression row)
    ("maxcut", 9, 2, 900),        # seed 332 (r4: 36 s — no-regression row)
    ("maxcut", 10, 1, 2400),      # seed 23  (r4: timeout 1800)
    ("maxcut", 10, 2, 2400),      # seed 235 (r4: timeout 1800)
    ("corr_clust", 6, 0, 1500),   # seed 764 (r4: 672 s; ref mean 37 s)
    ("corr_clust", 6, 2, 1500),   # seed 324 (r4: 749 s)
    ("corr_clust", 7, 1, 2400),   # seed 493 (r4: timeout 1547)
]

TOP = [
    ("corr_clust", 11, 0, 10800),
    ("max_stable_set", 11, 0, 7200),
    ("maxcut", 13, 0, 14400),
    ("graphm", 3, 0, 21600),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline-hours", type=float, default=6.0)
    ap.add_argument("--phase", choices=["all", "hard", "top"],
                    default="hard")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated run names (e.g. maxcut_9_s1)")
    args = ap.parse_args()

    plan = {"all": HARD + TOP, "hard": HARD, "top": TOP}[args.phase]
    if args.only:
        names = set(args.only.split(","))
        plan = [p for p in plan if f"{p[0]}_{p[1]}_s{p[2]}" in names]
    deadline = time.time() + args.deadline_hours * 3600
    grid_dir = os.path.join(REPO, "results", "grid_r5")
    os.makedirs(grid_dir, exist_ok=True)
    log_jsonl = os.path.join(grid_dir, "grid_log.jsonl")

    for problem, dim, seed_idx, timeout_s in plan:
        name = f"{problem}_{dim}_s{seed_idx}"
        if os.path.exists(log_jsonl):
            with open(log_jsonl) as fh:
                done = any(
                    json.loads(l).get("name") == name
                    and json.loads(l).get("exit_code") == 0
                    for l in fh if l.strip()
                )
            if done:
                print(f"[grid_r5] {name}: already done, skipping", flush=True)
                continue
        remaining = deadline - time.time()
        if remaining < min(timeout_s, 600):
            print(f"[grid_r5] deadline reached before {name}", flush=True)
            break
        budgeted = int(min(timeout_s, max(remaining, 600)))
        log_path = os.path.join(grid_dir, f"{name}.log")
        print(f"[grid_r5] running {name} (timeout {budgeted}s)", flush=True)
        out = grid_r2.run_one(problem, dim, seed_idx, budgeted, log_path,
                              out_root="grid_r5")
        with open(log_jsonl, "a") as fh:
            fh.write(json.dumps(out) + "\n")
        rt = None
        if isinstance(out.get("results"), dict):
            rt = out["results"].get("runtimes")
        print(f"[grid_r5] {name}: exit={out.get('exit_code')} "
              f"timeout={out.get('timed_out')} wall={out.get('wall_s')} "
              f"runtimes={rt}", flush=True)


if __name__ == "__main__":
    main()
