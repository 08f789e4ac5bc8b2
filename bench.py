"""Benchmark entry point: solves MaxCut instances end-to-end and prints
ONE JSON line per solve plus a final grid-summary line
{"metric", "value", "unit", "vs_baseline"}.

Protocol follows BASELINE.md: wall clock of ``tt_ipm`` per seed on the
configs/ grid; convergence requires complementary slackness < abs_tol;
per-dim solver hyperparameters (max_iter etc.) come from the same
configs/maxcut_<dim>.yaml the reference runs
(/root/reference/src/utils.py:300-321).

``vs_baseline`` is MEASURED: scripts/ref_baseline.py builds the actual
reference implementation (its generated Cython .cpp compiled with g++, a
scipy-lgmres petsc4py shim) and runs it on the same host; per-dim
reference mean runtimes are stored in BASELINE_MEASURED.json (committed)
and results/ref_baseline/*.json (fresh runs).  vs_baseline = reference
mean seconds / our seconds (>1 means we are faster).

Fail-safety (round-4): the grid runs under a wall-clock budget
(BENCH_BUDGET_S, default 1500 s).  Before each solve the projected cost
(from the measured reference mean and the worst observed our/ref ratio so
far) is checked against the remaining budget and the dim is skipped
rather than blowing the driver timeout; each per-solve JSON line is
emitted as it completes, and the final summary line is ALWAYS emitted
(try/finally), covering whatever part of the grid finished.

Platform selection: CPU grid by default (the honest, completable
capture).  BENCH_PLATFORM=offload-f32 opts into the on-chip grid; the
budget guard applies there too.

Env knobs: BENCH_GRID ("dim:seeds,..."), BENCH_PLATFORM
(cpu | offload | offload-f32), BENCH_BUDGET_S.
"""

from __future__ import annotations

import json
import os
import sys
import time

# The XLA:CPU AOT cache loader logs a ~2KB machine-feature "mismatch" error
# per loaded entry (a pseudo-feature comparison wart; entries load and run
# correctly — ttipm_tpu/config.py).  TSL latches TF_CPP_MIN_LOG_LEVEL when
# jax first imports, which a sitecustomize hook may do before this file
# runs, so suppression needs a re-exec with the env var set.
if (
    os.environ.get("TF_CPP_MIN_LOG_LEVEL") != "3"
    and os.environ.get("TTIPM_NO_REEXEC") is None
):
    os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
    os.environ["TTIPM_NO_REEXEC"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

# dim:seeds pairs; 3 seeds at d6-8 because the measured reference means
# at those dims aggregate 5 seeds with large spread (std ~ mean) — a
# single-seed numerator against a multi-seed reference mean is biased by
# seed luck in either direction
# Round-5: the grid extends into the formerly-weak top dims (VERDICT r4
# item 9) — d9/d10 rows are budget-guarded like everything else, so a
# slow host degrades to "skipped" lines rather than a blown timeout.
DEFAULT_GRID = "3:2,5:2,6:3,7:3,8:3,9:2,10:1"


def _load_config(dim: int):
    """configs/maxcut_<dim>.yaml — seeds and solver hyperparameters, so our
    runs stay seed- and budget-comparable with the measured reference."""
    import yaml

    path = os.path.join(REPO, "configs", f"maxcut_{dim}.yaml")
    try:
        with open(path) as fh:
            return yaml.safe_load(fh)
    except Exception:
        return {"seeds": [319, 9313, 332, 261, 266]}


def _ref_baseline_mean(dim: int):
    """Measured reference mean solve seconds for maxcut at ``dim``."""
    fresh = os.path.join(REPO, "results", "ref_baseline",
                         f"maxcut_{dim}.json")
    committed = os.path.join(REPO, "BASELINE_MEASURED.json")
    try:
        with open(fresh) as fh:
            times = json.load(fh)["results"]["runtimes"][0]
        return float(np.mean(times))
    except Exception:
        pass
    try:
        with open(committed) as fh:
            rec = json.load(fh)["maxcut"].get(str(dim))
        return float(rec["mean_s"]) if rec else None
    except Exception:
        return None


def _solve_once(dim: int, seed: int, cfg: dict):
    from ttipm_tpu.models.maxcut import create_problem
    from ttipm_tpu.ipm import tt_ipm
    from ttipm_tpu.ops.tt import tt_inner_prod, tt_reshape

    np.random.seed(seed)
    obj_tt, L_tt, bias_tt, lag_y = create_problem(dim, 1)
    lag_maps = {"y": tt_reshape(lag_y, (4, 4))}
    t0 = time.time()
    X, Y, T, Z, info = tt_ipm(
        lag_maps, obj_tt, L_tt, bias_tt,
        max_iter=int(cfg.get("max_iter", 22)),
        gap_tol=float(cfg.get("gap_tol", 3e-4)),
        op_tol=float(cfg.get("op_tol", 1e-4)),
        abs_tol=float(cfg.get("abs_tol", 1e-3)),
        warm_up=int(cfg.get("warm_up", 3)),
        aho_direction=False,
        mals_restarts=int(cfg.get("mals_restarts", 2)),
        max_refinement=int(cfg.get("max_refinement", 5)),
        lambdaStar=float(cfg.get("lambdaStar", 1.0)),
        verbose=False,
    )
    elapsed = time.time() - t0
    slack = abs(float(tt_inner_prod(X, Z)))
    return elapsed, slack, int(info["num_iters"])


def main() -> int:
    platform = os.environ.get("BENCH_PLATFORM", "") or "cpu"
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    # On-chip default grid: the dims whose programs scripts/tpu_bench.py
    # pre-compiled into the persistent cache (a cold remote compile costs
    # ~2 min/program over the flaky tunnel and would dominate the bench).
    default_grid = "3:1,4:1" if platform == "offload-f32" else DEFAULT_GRID
    grid_spec = os.environ.get("BENCH_GRID", default_grid)
    if platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_backend_optimization_level" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_backend_optimization_level=0"
            ).strip()

    import jax

    offload = platform in ("offload", "offload-f32")
    if offload:
        # heterogeneous mode: host orchestration + cheap TT algebra on the
        # local CPU backend, fused sweep/eigen programs on the TPU
        jax.config.update("jax_platforms", "cpu,axon")
    elif platform:
        jax.config.update("jax_platforms", platform)

    from ttipm_tpu import config as ttipm_config

    ttipm_config.enable_persistent_cache()
    if offload:
        ttipm_config.set_offload("axon")
    if platform == "offload-f32":
        # TPU performance profile: MXU-native f32 (highest matmul
        # precision), whole-solve + whole-eigen device programs, native
        # step-size pencil dtype, eps floors rescaled
        import jax.numpy as jnp

        ttipm_config.set_dtype(jnp.float32)
        ttipm_config.set_eigen_dtype("native")

    t_start = time.time()
    all_ok = True
    times = []
    ratios = []
    skipped = []
    worst_slowdown = 1.0  # worst observed (our seconds / ref seconds)
    try:
        for part in grid_spec.split(","):
            dim_s, _, nseeds_s = part.partition(":")
            dim = int(dim_s)
            nseeds = int(nseeds_s or "1")
            cfg = _load_config(dim)
            dim_times = []
            ref_mean = _ref_baseline_mean(dim)
            for seed in list(cfg.get("seeds", []))[:nseeds]:
                remaining = budget_s - (time.time() - t_start)
                projected = (ref_mean or 30.0) * worst_slowdown * 1.5
                if projected > remaining:
                    skipped.append({"dim": dim, "seed": seed,
                                    "projected_s": round(projected, 1),
                                    "remaining_s": round(remaining, 1)})
                    print(json.dumps({
                        "metric": f"maxcut_d{dim}_seed{seed}_skipped",
                        "value": None, "unit": "s",
                        "reason": "budget",
                        "projected_s": round(projected, 1),
                        "remaining_s": round(remaining, 1),
                    }), flush=True)
                    continue
                elapsed, slack, iters = _solve_once(dim, seed, cfg)
                converged = slack < float(cfg.get("abs_tol", 1e-3))
                all_ok = all_ok and converged
                dim_times.append(elapsed)
                if ref_mean:
                    worst_slowdown = max(worst_slowdown, elapsed / ref_mean)
                print(
                    json.dumps(
                        {
                            "metric":
                                f"maxcut_d{dim}_seed{seed}_solve_seconds",
                            "value": round(elapsed, 3),
                            "unit": "s",
                            "slackness": float(f"{slack:.3e}"),
                            "iters": iters,
                            "converged": converged,
                            "platform": platform,
                            "vs_baseline": (
                                round(ref_mean / elapsed, 3)
                                if ref_mean else None
                            ),
                        }
                    ),
                    flush=True,
                )
            if dim_times:
                mean_t = float(np.mean(dim_times))
                times.append({"dim": dim, "mean": mean_t,
                              "std": float(np.std(dim_times)),
                              "ref_mean": ref_mean})
                if ref_mean:
                    ratios.append(ref_mean / mean_t)
    finally:
        # --- driver-captured on-chip section (VERDICT r4 item 3) ---
        # Runs BEFORE the final summary line (the driver parses the last
        # stdout line).  Subprocess: the jax platform stack can't be
        # rebuilt in-process.  BENCH_CHIP=0 disables; a dead tunnel
        # degrades to the subprocess's own budget-guard skip lines.
        chip_rows = []
        if platform == "cpu" and os.environ.get("BENCH_CHIP", "1") != "0":
            import subprocess

            remaining = budget_s - (time.time() - t_start)
            chip_budget = min(
                float(os.environ.get("BENCH_CHIP_BUDGET_S", "600")),
                max(remaining, 0.0),
            )
            if chip_budget > 120:
                env = dict(os.environ)
                env["BENCH_PLATFORM"] = "offload-f32"
                env["BENCH_GRID"] = os.environ.get(
                    "BENCH_CHIP_GRID", "3:1")
                env["BENCH_BUDGET_S"] = str(int(chip_budget))
                env["BENCH_CHIP"] = "0"
                env["TTIPM_NO_REEXEC"] = "1"
                try:
                    proc = subprocess.run(
                        [sys.executable, os.path.abspath(__file__)],
                        env=env, timeout=chip_budget + 180,
                        capture_output=True, text=True,
                    )
                    for line in proc.stdout.splitlines():
                        line = line.strip()
                        if not line.startswith("{"):
                            continue
                        try:
                            rec = json.loads(line)
                        except json.JSONDecodeError:
                            continue
                        if rec.get("metric") == "maxcut_grid_geomean_seconds":
                            chip_rows = rec.get("grid", [])
                            chip_rows = [
                                dict(r, converged_all=rec.get(
                                    "converged_all"))
                                for r in chip_rows
                            ]
                        else:
                            print(json.dumps(rec), flush=True)
                except (subprocess.TimeoutExpired, OSError):
                    print(json.dumps({
                        "metric": "chip_section_timeout", "value": None,
                        "unit": "s", "platform": "offload-f32",
                    }), flush=True)
        if times:
            geomean = float(
                np.exp(np.mean([np.log(t["mean"]) for t in times])))
        else:
            geomean = float("nan")
        vs_baseline = (
            round(float(np.exp(np.mean(np.log(ratios)))), 3)
            if ratios else None
        )
        # the driver parses the LAST stdout line
        print(
            json.dumps(
                {
                    "metric": "maxcut_grid_geomean_seconds",
                    "value": (round(geomean, 3)
                              if np.isfinite(geomean) else None),
                    "unit": "s",
                    "grid": times,
                    "skipped": skipped,
                    "platform": platform,
                    "chip": chip_rows,
                    "converged_all": all_ok and bool(times),
                    # geomean of measured (reference seconds / our
                    # seconds); >1 means faster than the measured Cython
                    # reference on this host (scripts/ref_baseline.py)
                    "vs_baseline": vs_baseline,
                }
            ),
            flush=True,
        )
    return 0 if (all_ok and times) else 1


if __name__ == "__main__":
    sys.exit(main())
