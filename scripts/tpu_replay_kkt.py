"""Replay captured Newton systems through the fused AMEn solver on the TPU
and compare against the captured CPU solutions (run tpu_capture_kkt.py
first).  Usage: python scripts/tpu_replay_kkt.py [index ...]"""
import glob
import os
import pickle
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax
import jax.numpy as jnp
import numpy as np

from ttipm_tpu import config as cfg

cfg.enable_persistent_cache()

print("backend:", jax.default_backend(), flush=True)

from ttipm_tpu.solvers.blocks import TTBlockMatrix, TTBlockVector
from ttipm_tpu.solvers.fused import (
    tt_restarted_block_amen_fused,
    _prep_operator,
    _prep_rhs,
    _fused_residual_norm,
    _nrows,
)

OUT = "/tmp/ttipm_kkt"
files = sorted(glob.glob(f"{OUT}/kkt_*.pkl"))
if len(sys.argv) > 1:
    files = [f"{OUT}/kkt_{int(i):02d}.pkl" for i in sys.argv[1:]]

for path in files:
    with open(path, "rb") as f:
        blob = pickle.load(f)
    A = TTBlockMatrix()
    for k, v in blob["A_data"].items():
        A[k] = [jnp.asarray(c) for c in v]
    A._aliases = dict(blob["A_aliases"])
    A._transposes = dict(blob["A_transposes"])
    b = TTBlockVector()
    for k, v in blob["b_data"].items():
        b[k] = [jnp.asarray(c) for c in v]
    kwargs = dict(blob["kwargs"])
    if kwargs.get("x0") is not None:
        kwargs["x0"] = [jnp.asarray(c) for c in kwargs["x0"]]
    t0 = time.time()
    try:
        x_cores, res = tt_restarted_block_amen_fused(A, b, **kwargs)
        err = None
    except Exception as e:  # noqa: BLE001
        x_cores, res, err = None, np.nan, e
    dt = time.time() - t0
    name = os.path.basename(path)
    if x_cores is None:
        print(f"{name}: EXCEPTION after {dt:.1f}s: {err!r}", flush=True)
        continue
    finite = all(np.isfinite(np.asarray(c)).all() for c in x_cores)
    # residual of the on-device solution, and of the CPU solution, both
    # evaluated with the same contraction
    ineq = kwargs.get("ineq", False)
    d = len(next(iter(blob["b_data"].values())))
    Ap = _prep_operator(A, d, ineq)
    bp = _prep_rhs(b, d, ineq)
    rn_tpu = _fused_residual_norm(Ap, bp, x_cores, ineq)
    cpu_x = [jnp.asarray(c) for c in blob["cpu_x"]]
    print(
        f"{name}: {dt:.1f}s finite={finite} local_res={res:.3e} "
        f"(cpu was {blob['cpu_res']:.3e}) global_res={rn_tpu:.3e}",
        flush=True,
    )
print("done")
