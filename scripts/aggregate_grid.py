#!/usr/bin/env python
"""Aggregate a grid directory's per-seed runner JSONs into the protocol's
multi-seed statistics (mean±std, median [IQR], worst — the reference's
reporting fields, /root/reference/src/utils.py:118-207).

Usage: python scripts/aggregate_grid.py [results/grid_r4]
Writes <dir>/SUMMARY.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "results", "grid_r4"
    )
    buckets = defaultdict(lambda: defaultdict(list))
    for name in sorted(os.listdir(root)):
        res_dir = os.path.join(root, name, "results")
        if not os.path.isdir(res_dir):
            continue
        problem, dim = name.rsplit("_s", 1)[0].rsplit("_", 1)
        for fn in sorted(os.listdir(res_dir)):
            if not fn.endswith(".json"):
                continue
            with open(os.path.join(res_dir, fn)) as fh:
                rec = json.load(fh)
            key = (problem, int(dim))
            try:
                buckets[key]["time_s"].append(float(rec["runtimes"][0][0]))
                buckets[key]["slackness"].append(
                    float(rec["complementary_slackness"][0][0])
                )
                buckets[key]["iters"].append(float(rec["num_iters"][0][0]))
                if rec.get("primal_errors"):
                    buckets[key]["primal"].append(
                        float(rec["primal_errors"][0][0])
                    )
                if rec.get("dual_errors"):
                    buckets[key]["dual"].append(
                        float(rec["dual_errors"][0][0])
                    )
            except (KeyError, IndexError, TypeError):
                continue
            break

    summary = {}
    lines = [
        "| problem | dim | seeds | time mean±std (s) | median [IQR] | "
        "worst | iters | worst slack | all conv |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for (problem, dim) in sorted(buckets):
        vals = buckets[(problem, dim)]
        t = np.asarray(vals["time_s"], dtype=float)
        sl = np.asarray(vals["slackness"], dtype=float)
        it = np.asarray(vals["iters"], dtype=float)
        if not len(t):
            continue
        q1, med, q3 = np.percentile(t, [25, 50, 75])
        entry = {
            "seeds": len(t),
            "mean_s": round(float(t.mean()), 2),
            "std_s": round(float(t.std()), 2),
            "median_s": round(float(med), 2),
            "iqr_s": [round(float(q1), 2), round(float(q3), 2)],
            "worst_s": round(float(t.max()), 2),
            "mean_iters": round(float(it.mean()), 1),
            "worst_slackness": float(f"{sl.max():.3e}"),
            "converged_all": bool((sl < 1e-3).all()),
        }
        summary.setdefault(problem, {})[str(dim)] = entry
        lines.append(
            f"| {problem} | {dim} | {entry['seeds']} | "
            f"{entry['mean_s']}±{entry['std_s']} | "
            f"{entry['median_s']} [{entry['iqr_s'][0]},{entry['iqr_s'][1]}]"
            f" | {entry['worst_s']} | {entry['mean_iters']} | "
            f"{entry['worst_slackness']} | {entry['converged_all']} |"
        )

    with open(os.path.join(root, "SUMMARY.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print("\n".join(lines))
    print(f"\nwrote {os.path.join(root, 'SUMMARY.json')}")


if __name__ == "__main__":
    main()
