#!/usr/bin/env python
"""Differential MFU measurement for the batched fused sweep (v5e).

Round-5 finding: through the axon tunnel, per-dispatch wall clock cannot
resolve sub-ms device times — repeated IDENTICAL dispatches get
short-circuited somewhere in the remote path (measured 790 TFLOP/s, 4x
physical peak), while dispatches with fresh input buffers pay ~12 s of
tunnel cost.  The clean method: compile ONE program that runs K unrolled
(solve) sweeps back-to-back, time it for two values of K, and divide the
wall-clock DIFFERENCE by the sweep-count difference — the per-dispatch
constant cancels exactly, leaving pure device time per sweep.

Usage: python scripts/mfu_diff.py [dim] [R] [--batch N] [--k1 2] [--k2 6]
Appends one JSON line to results/mfu.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32_HIGHEST = V5E_PEAK_BF16 / 3.0


def main() -> int:
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    dim = int(pos[0]) if pos else 5
    R = int(pos[1]) if len(pos) > 1 else 8
    batch = 1
    argv = sys.argv
    if "--batch" in argv:
        batch = int(argv[argv.index("--batch") + 1])
    k1 = int(argv[argv.index("--k1") + 1]) if "--k1" in argv else 2
    k2 = int(argv[argv.index("--k2") + 1]) if "--k2" in argv else 6
    reps = 10

    import jax
    import jax.numpy as jnp
    from functools import partial

    jax.config.update("jax_platforms", "cpu,axon")
    from ttipm_tpu import config as cfg

    cfg.enable_persistent_cache()
    cfg.set_dtype(jnp.float32)
    cfg.set_eigen_dtype("native")
    cfg.set_offload("axon")
    from ttipm_tpu.ops.kernels import set_panel_qr

    set_panel_qr(False)  # pallas-free modules (vmap legalization)
    dev = cfg.offload_device()
    print(f"device: {dev}", flush=True)

    import __graft_entry__ as ge

    lhs, rhs = ge._capture_first_newton_system(dim)

    from ttipm_tpu.solvers import fused as F

    d = dim
    A = F._prep_operator(lhs, d, False, pad=True)
    b = F._prep_rhs(rhs, d, False, pad=True)
    A = {k: [jnp.asarray(c, cfg.dtype()) for c in v] for k, v in A.items()}
    b = [[jnp.asarray(c, cfg.dtype()) for c in row] for row in b]
    caps_bck = tuple(F._bond_caps(d, R, 3, +1))
    caps_fwd = tuple(F._bond_caps(d, R, 3, -1))
    rng = np.random.RandomState(0)
    x_cores = [jnp.asarray(c, cfg.dtype())
               for c in F._prep_x0(None, d, 3, list(caps_fwd), 1, rng)]
    z_cores = [jnp.asarray(c, cfg.dtype())
               for c in F._prep_z0(d, 3, 2, d - 1, rng)]
    pA0, pz0, pb0 = F._boundary_phis(A, b, False)
    XAX = [dict(pA0)] + [None] * (d - 1) + [dict(pA0)]
    Xb = [list(pb0)] + [None] * (d - 1) + [list(pb0)]
    ZAX = [dict(pz0)] + [None] * (d - 1) + [dict(pz0)]
    Zb = [list(pb0)] + [None] * (d - 1) + [list(pb0)]
    args0 = (A, b, tuple(x_cores), tuple(z_cores), tuple(XAX), tuple(Xb),
             tuple(ZAX), tuple(Zb))
    if batch > 1:
        args0 = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * batch), args0)
    args0 = jax.device_put(args0, dev)

    sweep = F._sweep_program.__wrapped__  # undecorated body

    def k_sweeps(A_, b_, x, z, XAX_, Xb_, ZAX_, Zb_, scale, K: int):
        # one warm (phi-building) sweep, then K solve sweeps, alternating
        # direction — the production solve pattern, unrolled in ONE program.
        # ``scale`` varies per rep so no two dispatches carry identical
        # inputs (identical dispatches are short-circuited by the tunnel).
        x = tuple(c * scale for c in x)
        st = (x, z, XAX_, Xb_, ZAX_, Zb_)
        st = sweep(A_, b_, *st, ineq=False, caps=caps_bck, kick=2,
                   solve=False, direction=1)[:6]
        res = None
        for i in range(K):
            caps, direction = ((caps_fwd, -1) if i % 2 == 0
                               else (caps_bck, +1))
            out = sweep(A_, b_, *st, ineq=False, caps=caps, kick=2,
                        solve=True, direction=direction)
            st = out[:6]
            res = out[6]
        return res

    if batch > 1:
        def prog(args, scale, K):
            return jax.vmap(partial(k_sweeps, scale=scale, K=K))(*args)
    else:
        def prog(args, scale, K):
            return k_sweeps(*args, scale=scale, K=K)

    walls = {}
    flops = {}
    for K in (k1, k2):
        fn = jax.jit(partial(prog, K=K))
        one = jnp.asarray(1.0, cfg.dtype())
        lowered = fn.lower(args0, one)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops[K] = float(ca.get("flops", 0.0))
        out = fn(args0, one)
        jax.block_until_ready(out)  # compile+load+first run
        t0 = time.time()
        for i in range(reps):
            sc = jnp.asarray(1.0 + 1e-6 * (i + 1), cfg.dtype())
            jax.block_until_ready(fn(args0, sc))
        walls[K] = (time.time() - t0) / reps
        print(f"K={K}: wall {walls[K]:.4f}s flops {flops[K]:.3e}",
              flush=True)

    dt = (walls[k2] - walls[k1]) / (k2 - k1)
    dflops = (flops[k2] - flops[k1]) / (k2 - k1)
    mfu_bf16 = dflops / (max(dt, 1e-12) * V5E_PEAK_BF16)
    mfu_f32 = dflops / (max(dt, 1e-12) * V5E_PEAK_F32_HIGHEST)
    rec = {
        "program": "fused_sweep_solve_diff",
        "dim": dim, "R": R, "batch": batch, "dtype": "float32-highest",
        "k1": k1, "k2": k2,
        "wall_k1_s": round(walls[k1], 5), "wall_k2_s": round(walls[k2], 5),
        "flops_per_sweep": dflops,
        "device_s_per_sweep": round(dt, 6),
        "mfu_vs_bf16_peak": round(mfu_bf16, 6),
        "mfu_vs_f32_highest_peak": round(mfu_f32, 6),
        "reps": reps,
        "method": "K-sweep-unrolled differential (cancels per-dispatch "
                  "tunnel constant; repeated-identical-dispatch timing is "
                  "short-circuited by the remote path)",
    }
    print(json.dumps(rec), flush=True)
    with open(os.path.join(REPO, "results", "mfu.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
