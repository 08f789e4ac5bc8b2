#!/usr/bin/env python
"""Round-5 clean solo re-runs (one at a time, idle box) for BASELINE.md."""
import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
import grid_r2

PLAN = [
    ("maxcut", 9, 0, 900),
    ("maxcut", 9, 1, 900),
    ("maxcut", 9, 2, 900),
    ("maxcut", 6, 1, 900),
    ("corr_clust", 6, 0, 900),
    ("corr_clust", 6, 1, 900),
    ("corr_clust", 6, 2, 900),
    ("maxcut", 10, 1, 2400),
]

def main():
    grid_dir = os.path.join(REPO, "results", "grid_r5_clean")
    os.makedirs(grid_dir, exist_ok=True)
    log_jsonl = os.path.join(grid_dir, "grid_log.jsonl")
    for problem, dim, seed_idx, timeout_s in PLAN:
        name = f"{problem}_{dim}_s{seed_idx}"
        if os.path.exists(log_jsonl) and any(
            json.loads(l).get("name") == name and json.loads(l).get("exit_code") == 0
            for l in open(log_jsonl) if l.strip()
        ):
            continue
        log_path = os.path.join(grid_dir, f"{name}.log")
        print(f"[clean] running {name}", flush=True)
        out = grid_r2.run_one(problem, dim, seed_idx, timeout_s, log_path,
                              out_root="grid_r5_clean")
        with open(log_jsonl, "a") as fh:
            fh.write(json.dumps(out) + "\n")
        rt = (out.get("results") or {}).get("runtimes")
        print(f"[clean] {name}: exit={out.get('exit_code')} "
              f"timeout={out.get('timed_out')} wall={out.get('wall_s')} rt={rt}",
              flush=True)

if __name__ == "__main__":
    main()
