"""Profile one solve end-to-end on CPU (cProfile + phase timers).

Usage: python scripts/profile_solve.py [dim] [seed] [--cprofile]
                                       [--problem maxcut|corr_clust|...]
Writes results/profile_<problem>_d<dim>.txt with cumulative hotspots.
"""
import os
import sys

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
# force CPU: the session env pins JAX_PLATFORMS=axon (the TPU tunnel) and
# a profile over the tunnel measures dispatch latency, not compute.  A
# sitecustomize hook may import jax before this file runs, so the env var
# alone is not enough — set the config post-import too.
os.environ["JAX_PLATFORMS"] = os.environ.get("PROFILE_PLATFORM", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import cProfile
import pstats
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    use_cprofile = "--cprofile" in sys.argv
    problem = "maxcut"
    argv = sys.argv[1:]
    if "--problem" in argv:
        i = argv.index("--problem")
        problem = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    pos = [a for a in argv if not a.startswith("-")]
    dim = int(pos[0]) if pos else 6
    seed = int(pos[1]) if len(pos) > 1 else None

    from ttipm_tpu import config as ttipm_config

    ttipm_config.enable_persistent_cache()

    from ttipm_tpu.utils.runner import load_problem
    from ttipm_tpu.ipm import tt_ipm
    from ttipm_tpu.ops.tt import tt_inner_prod, tt_reshape
    import yaml

    create_problem = load_problem(problem)
    with open(os.path.join(REPO, "configs", f"{problem}_{dim}.yaml")) as fh:
        cfg = yaml.safe_load(fh)
    if seed is None:
        seed = int(cfg["seeds"][0])
    np.random.seed(seed)
    prob = create_problem(dim, 1)
    if len(prob) == 5:
        obj_tt, L_tt, bias_tt, ineq_mask, lag_maps = prob
    else:
        obj_tt, L_tt, bias_tt, lag_y = prob
        ineq_mask = None
        lag_maps = {"y": lag_y}
    lag_maps = {k: tt_reshape(v, (4, 4)) for k, v in lag_maps.items()}
    obj_tt = tt_reshape(obj_tt, (4,))
    bias_tt = tt_reshape(bias_tt, (4,))

    kw = dict(
        max_iter=int(cfg.get("max_iter", 22)),
        gap_tol=float(cfg.get("gap_tol", 3e-4)),
        op_tol=float(cfg.get("op_tol", 1e-4)),
        abs_tol=float(cfg.get("abs_tol", 1e-3)),
        warm_up=int(cfg.get("warm_up", 3)),
        aho_direction=False,
        mals_restarts=int(cfg.get("mals_restarts", 2)),
        max_refinement=int(cfg.get("max_refinement", 5)),
        lambdaStar=float(cfg.get("lambdaStar", 1.0)),
        lambdaStarIneq=float(cfg.get("lambdaStarIneq", 1.0)),
        ineq_mask=ineq_mask,
        verbose=True,
    )

    t0 = time.time()
    if use_cprofile:
        prof = cProfile.Profile()
        prof.enable()
    X, Y, T, Z, info = tt_ipm(lag_maps, obj_tt, L_tt, bias_tt, **kw)
    if use_cprofile:
        prof.disable()
    elapsed = time.time() - t0
    slack = abs(float(tt_inner_prod(X, Z)))
    print(f"\n=== d{dim} seed{seed}: {elapsed:.1f}s, "
          f"iters={info['num_iters']}, slack={slack:.2e}")

    if use_cprofile:
        out = os.path.join(REPO, "results",
                           f"profile_{problem}_d{dim}.txt")
        with open(out, "w") as fh:
            st = pstats.Stats(prof, stream=fh)
            st.sort_stats("cumulative").print_stats(60)
            st.sort_stats("tottime").print_stats(40)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
