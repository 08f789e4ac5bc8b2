#!/usr/bin/env python
"""Single-chip MFU accounting for the fused device programs (round-4
verdict item 4: "is the MXU actually busy" must be answerable from the
artifacts).

Method: capture a REAL maxcut Newton KKT system at the requested dim,
prepare it exactly as the production solver does, compile the fused sweep
program for the TPU, read its FLOP count from XLA's
``compiled.cost_analysis()``, and measure marginal device time by timing
M blocking dispatches and subtracting the measured per-dispatch tunnel
overhead (a no-op program timed the same way).  MFU = flops /
(device_seconds * peak).

Peak reference for v5e: 197 TFLOP/s bf16 MXU.  The f32 profile pins
matmul precision HIGHEST (3-pass bf16, config.py), so the achievable f32
ceiling is ~1/3 of bf16 peak; both numbers are reported.

Usage: python scripts/mfu.py [dim] [R] [--sweeps N]
Writes one JSON line per program to results/mfu.jsonl.
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
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    reps = 20

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu,axon")
    from ttipm_tpu import config as cfg

    cfg.enable_persistent_cache()
    cfg.set_dtype(jnp.float32)
    cfg.set_eigen_dtype("native")
    cfg.set_offload("axon")

    dev = cfg.offload_device()
    print(f"device: {dev}", flush=True)

    # Capture a real Newton system (the IPM's first fused KKT solve).
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    lhs, rhs = ge._capture_first_newton_system(dim)

    from ttipm_tpu.solvers import fused as F

    d = dim
    # pad=True: the jitted/vmapped device engine consumes the padded
    # uniform-rank prep (the host default is ragged numpy)
    A = F._prep_operator(lhs, d, False, pad=True)
    b = F._prep_rhs(rhs, d, False, pad=True)
    # jitted-engine arrays (prep may have produced numpy under host mode)
    A = {k: [jnp.asarray(c, cfg.dtype()) for c in v] for k, v in A.items()}
    b = [[jnp.asarray(c, cfg.dtype()) for c in row] for row in b]
    caps_bck = F._bond_caps(d, R, 3, +1)
    caps_fwd = F._bond_caps(d, R, 3, -1)
    rng = np.random.RandomState(0)
    x_cores = [jnp.asarray(c, cfg.dtype())
               for c in F._prep_x0(None, d, 3, caps_fwd, 1, rng)]
    z_cores = [jnp.asarray(c, cfg.dtype())
               for c in F._prep_z0(d, 3, 2, d - 1, rng)]
    pA0, pz0, pb0 = F._boundary_phis(A, b, False)
    to_dev = lambda t: jax.device_put(t, dev)
    XAX = [dict(pA0)] + [None] * (d - 1) + [dict(pA0)]
    Xb = [list(pb0)] + [None] * (d - 1) + [list(pb0)]
    ZAX = [dict(pz0)] + [None] * (d - 1) + [dict(pz0)]
    Zb = [list(pb0)] + [None] * (d - 1) + [list(pb0)]
    args0 = (A, b, tuple(x_cores), tuple(z_cores), tuple(XAX), tuple(Xb),
             tuple(ZAX), tuple(Zb))
    args0 = jax.device_put(args0, dev)

    from ttipm_tpu.ops import jacobi as _jacobi

    # --batch N: the production seeds-batch configuration (the vmapped
    # sweep program of parallel/fused_mesh.py, one dispatch for N
    # instances).  At small R the single-instance sweep is latency-bound
    # (r4: 0.6% MFU at R=8); the batch axis is how production fills the
    # MXU at those ranks — the multi-seed protocol runs N independent
    # seeds per dim (BASELINE.md grid).
    if batch > 1:
        from ttipm_tpu.parallel import fused_mesh as FM
        from ttipm_tpu.ops.kernels import set_panel_qr

        # the vmapped program is pallas-free by design (see kernels.py);
        # disable the panel kernel globally for this measurement so the
        # single-instance warmup lower can't mint Mosaic modules either
        set_panel_qr(False)

        stack = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * batch), t)
        args0 = jax.device_put(stack(args0), dev)
        sweep_fn = FM._sweep_program_batch
    else:
        sweep_fn = jax.jit(
            F._sweep_program,
            static_argnames=("ineq", "caps", "kick", "solve", "direction"),
        )

    results = []
    with _jacobi.forced(True):
        # ---- warmup sweep (builds phis; output is the steady-state shape)
        lowered = jax.jit(
            F._sweep_program,
            static_argnames=("ineq", "caps", "kick", "solve", "direction"),
        ).lower(*(jax.tree_util.tree_map(lambda x: x[0], args0) if batch > 1
                  else args0),
                ineq=False, caps=tuple(caps_bck), kick=2,
                solve=False, direction=1)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops_warm = float(ca.get("flops", 0.0))

        st = sweep_fn(
            *args0, ineq=False, caps=tuple(caps_bck), kick=2, solve=False,
            direction=1,
        )
        st_solve_args = st[:6]
        A_run = args0[0]
        b_run = args0[1]

        # ---- solving sweep (the hot program)
        lowered_s = sweep_fn.lower(
            A_run, b_run, *st_solve_args, ineq=False, caps=tuple(caps_fwd),
            kick=2, solve=True, direction=-1)
        compiled_s = lowered_s.compile()
        ca_s = compiled_s.cost_analysis()
        ca_s = ca_s[0] if isinstance(ca_s, list) else ca_s
        flops_solve = float(ca_s.get("flops", 0.0))

        def run_solve(st_args, caps, direction):
            out = sweep_fn(
                A_run, b_run, *st_args, ineq=False,
                caps=tuple(caps), kick=2, solve=True, direction=direction,
            )
            jax.block_until_ready(out[6])
            return out

        # compile+load both directions (the state layout alternates)
        out = run_solve(st_solve_args, caps_fwd, -1)
        out = run_solve(out[:6], caps_bck, +1)
        # Chain each rep's output state into the next input: repeated
        # dispatches of IDENTICAL args measured 790 TFLOP/s (4x physical
        # peak) through the tunnel — some layer short-circuits duplicate
        # executions.  Chaining forces every rep to execute for real.
        t0 = time.time()
        for i in range(reps):
            if i % 2 == 0:
                out = run_solve(out[:6], caps_fwd, -1)
            else:
                out = run_solve(out[:6], caps_bck, +1)
        t_total = (time.time() - t0) / reps

        # ---- dispatch overhead: a trivial program timed the same way
        @jax.jit
        def _noop(x):
            return x + 1.0

        xdev = jax.device_put(jnp.zeros((8, 128), cfg.dtype()), dev)
        jax.block_until_ready(_noop(xdev))
        t0 = time.time()
        for _ in range(reps):
            jax.block_until_ready(_noop(xdev))
        t_dispatch = (time.time() - t0) / reps

    t_device = max(t_total - t_dispatch, 1e-9)
    mfu_bf16 = flops_solve / (t_device * V5E_PEAK_BF16)
    mfu_f32 = flops_solve / (t_device * V5E_PEAK_F32_HIGHEST)
    rec = {
        "program": ("fused_sweep_solve_batch" if batch > 1
                    else "fused_sweep_solve"),
        "dim": dim, "R": R, "batch": batch, "dtype": "float32-highest",
        "flops": flops_solve,
        "flops_warmup_sweep": flops_warm,
        "wall_per_dispatch_s": round(t_total, 6),
        "dispatch_overhead_s": round(t_dispatch, 6),
        "device_s": round(t_device, 6),
        "mfu_vs_bf16_peak": round(mfu_bf16, 6),
        "mfu_vs_f32_highest_peak": round(mfu_f32, 6),
        "reps": reps,
    }
    print(json.dumps(rec), flush=True)
    results.append(rec)
    os.makedirs(os.path.join(REPO, "results"), exist_ok=True)
    with open(os.path.join(REPO, "results", "mfu.jsonl"), "a") as fh:
        for r in results:
            fh.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
