#!/usr/bin/env python
"""Reproduce / bisect the f32 rank-bucket-4 maxcut d5 stall (ARCHITECTURE
known gap): run the flagship offload-f32 numerics profile on CPU at a
given dim/bucket and report convergence.

Usage: JAX_PLATFORMS=cpu python scripts/f32_repro.py [dim] [bucket] [seed]
"""
import os, sys, time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from ttipm_tpu import config as cfg

dim = int(sys.argv[1]) if len(sys.argv) > 1 else 5
bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 4
seed = int(sys.argv[3]) if len(sys.argv) > 3 else 319

cfg.enable_persistent_cache()
cfg.set_dtype(jnp.float32)
cfg.set_eigen_dtype("native")
cfg.set_rank_bucket(bucket)

from ttipm_tpu.ipm import tt_ipm
from ttipm_tpu.models.maxcut import create_problem
from ttipm_tpu.ops.tt import tt_inner_prod, tt_reshape

np.random.seed(seed)
obj_tt, L_tt, bias_tt, lag_y = create_problem(dim, 1)
t0 = time.time()
X, Y, T, Z, info = tt_ipm(
    {"y": tt_reshape(lag_y, (4, 4))}, obj_tt, L_tt, bias_tt,
    max_iter=22, gap_tol=3e-4, op_tol=1e-4, abs_tol=1e-3, warm_up=3,
    aho_direction=False, mals_restarts=2, max_refinement=5,
    lambdaStar=1.0, verbose=True,
)
slack = abs(float(tt_inner_prod(X, Z)))
print(f"RESULT dim={dim} bucket={bucket} seed={seed} slack={slack:.3e} "
      f"iters={info['num_iters']} wall={time.time()-t0:.1f}s "
      f"converged={slack < 1e-3}", flush=True)
