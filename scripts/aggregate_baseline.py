#!/usr/bin/env python
"""Aggregate results/ref_baseline/*.json (measured REFERENCE runs, see
scripts/ref_baseline.py) into the committed BASELINE_MEASURED.json that
bench.py uses for vs_baseline when fresh results are absent."""

from __future__ import annotations

import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "results", "ref_baseline")
DST = os.path.join(REPO, "BASELINE_MEASURED.json")


def main() -> None:
    # Merge into the committed file: sessions run on fresh disks, so the
    # results/ dir holds only this session's runs — prior measured dims
    # must survive unless re-measured.
    out = {}
    if os.path.exists(DST):
        with open(DST) as fh:
            prior = json.load(fh)
        out = {k: v for k, v in prior.items() if k != "host"}
    host = {
        "cpus": os.cpu_count(),
        "note": (
            "Reference implementation (generated Cython .cpp compiled with "
            "g++, scipy-lgmres petsc4py shim) run on this session's host; "
            "see scripts/ref_baseline.py.  Times are mean seconds over the "
            "staged config's seeds."
        ),
    }
    for fn in sorted(os.listdir(SRC)):
        if not fn.endswith(".json"):
            continue
        with open(os.path.join(SRC, fn)) as fh:
            rec = json.load(fh)
        res = rec.get("results")
        problem, dim = rec["problem"], str(rec["dim"])
        entry = {"exit": rec["exit"], "wall_s": rec["wall_s"]}
        if res:
            times = np.asarray(res["runtimes"][0], dtype=float)
            slack = np.asarray(res["complementary_slackness"][0], dtype=float)
            iters = np.asarray(res["num_iters"][0], dtype=float)
            entry.update(
                mean_s=round(float(times.mean()), 3),
                std_s=round(float(times.std()), 3),
                median_s=round(float(np.median(times)), 3),
                worst_s=round(float(times.max()), 3),
                seeds=len(times),
                mean_iters=round(float(iters.mean()), 2),
                worst_slackness=float(f"{slack.max():.3e}"),
                converged_all=bool((slack < 1e-3).all()),
            )
        # don't let a timeout/failure record clobber a prior full result
        # (match the population check above: empty-but-not-None results —
        # {} or [] — are failures too)
        prior_entry = out.get(problem, {}).get(dim)
        if not res and prior_entry and "mean_s" in prior_entry:
            continue
        out.setdefault(problem, {})[dim] = entry
    payload = {"host": host, **out}
    with open(DST, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
