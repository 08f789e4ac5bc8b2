"""Global numeric configuration for ttipm_tpu.

The reference implementation is a float64 CPU code with rounding thresholds
down to 1e-12 (``/root/reference/src/tt_ipm.py:914``).  TPUs execute f64 by
emulation; for performance runs a float32 profile with rescaled tolerance
floors is provided.  x64 is enabled at import time so that all ``jnp``
arrays default to float64 exactly like the reference's numpy arrays.
"""

from __future__ import annotations

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

# Active floating dtype for TT cores.  float64 gives parity with the
# reference; float32 is the TPU performance mode (tolerance floors below).
_DTYPE = jnp.float64

# Smallest rounding threshold that is meaningful for the active dtype.
# In f32, thresholds below ~1e-7 act like 0 and let numerical noise inflate
# TT ranks, so `eps_floor` clamps them.
_EPS_FLOOR = 0.0


def set_dtype(dtype) -> None:
    """Select the global TT dtype (jnp.float64 or jnp.float32)."""
    global _DTYPE, _EPS_FLOOR
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float64:
        _DTYPE, _EPS_FLOOR = jnp.float64, 0.0
    elif dtype == jnp.float32:
        _DTYPE, _EPS_FLOOR = jnp.float32, 1e-7
        # TPU f32 matmuls otherwise lower to bf16 passes; the Schur
        # assembly/factorization chain NaNs at bf16 accuracy (measured:
        # on-chip device-loop res=nan at default precision, converges at
        # HIGHEST).  ~1/3 MXU peak, still ~20x the f64 emulation.
        jax.config.update("jax_default_matmul_precision", "highest")
    else:
        raise ValueError(f"unsupported TT dtype {dtype}")


def dtype():
    return _DTYPE


def clamp_eps(eps: float) -> float:
    """Clamp a rounding/tolerance threshold to the active dtype's floor."""
    return max(float(eps), _EPS_FLOOR)


# --- Host algebra ------------------------------------------------------------
#
# The TT *glue* — roundings, adds, inner products, small exact products —
# operates on ragged, seed-dependent rank shapes.  Running it through
# eager-jitted XLA mints one compiled program per shape signature: a
# profiled maxcut d6 solve compiled 851 fresh programs and spent 91% of
# its 420 s wall clock in XLA compile/trace/lower, not arithmetic
# (results/profile_d6.txt, round 4).  These panels are microscopic
# (typically <= 64x64); numpy's LAPACK executes them in microseconds with
# zero compilation.  Host-algebra mode therefore routes the ragged glue
# through numpy while the bucketed, bounded-signature device programs
# (fused sweeps, whole-eigen, LOBPCG) stay jitted — which is also the
# right TPU architecture: host orchestration math on host, MXU-shaped
# programs on device.  Disabled automatically inside jit traces.

_HOST_ALGEBRA = True


def set_host_algebra(on: bool) -> None:
    global _HOST_ALGEBRA
    _HOST_ALGEBRA = bool(on)


def host_algebra() -> bool:
    return _HOST_ALGEBRA


def on_host(*arrays) -> bool:
    """True when host-algebra mode is on and no argument is a tracer
    (inside jit the jnp path must be used)."""
    if not _HOST_ALGEBRA:
        return False
    import jax.core as _core

    for a in arrays:
        if isinstance(a, _core.Tracer):
            return False
    return True


# --- Numerical tripwire -----------------------------------------------------
#
# The reference promotes numpy warnings to errors at import
# (/root/reference/src/tt_ipm.py:15-16) so that silent NaN/overflow
# production on the eager paths raises immediately and the IPM's
# total-function recovery chain fires at the first bad arithmetic rather
# than after a whole corrupted sweep.  Global ``np.seterr`` would also
# trip legitimate warning-producing code (nan-reductions in reporting),
# so here the tripwire is a context manager scoped to the Newton step —
# exactly the region whose failures the recovery chain is built to absorb.
# Jitted JAX programs never warn; they are covered by the explicit
# finiteness gates in ipm.py/fused.py (and, for debugging, by
# TTIPM_DEBUG_NANS=1 which flips jax_debug_nans on at import).

import contextlib as _contextlib
import os as _os
import warnings as _warnings

if _os.environ.get("TTIPM_DEBUG_NANS") == "1":
    jax.config.update("jax_debug_nans", True)


@_contextlib.contextmanager
def numerical_tripwire():
    """Promote host-side numpy RuntimeWarnings (invalid value, overflow,
    divide-by-zero) to exceptions inside the wrapped region."""
    import numpy as _np

    with _np.errstate(invalid="raise", divide="raise", over="raise"):
        with _warnings.catch_warnings():
            _warnings.simplefilter("error", RuntimeWarning)
            yield


# --- Mixed-precision local solves -------------------------------------------
#
# Under the f32 profile an all-f32 fused Newton solve is NOT accurate
# enough: maxcut d3 stalls at slackness ~1e-2 after 21 iterations where
# f64 local solves converge in 7 (bisected 2026-08-19 to the prep-dtype
# cleanup that made the fused path genuinely f32).  The fix is SURVEY.md
# §7 hard-part #2: factorize the dense Schur chain in f32 (MXU-native,
# no f64-emulation QDWH fragility) and recover direction quality with
# f64-residual iterative refinement (solvers/fused.py::_solve_local).

_MIXED_LOCAL = "f64"


def set_mixed_local(mode) -> None:
    """'refine' = f32 factorization + f64-residual iterative refinement;
    'f64' = full f64 local solve chain (cholesky/QR/triangular — all
    TPU-emulation-safe lowerings, unlike svd/eigh); False/'off' = honest
    f32.  Splits, phi updates, and sweep state stay f32 in every mode."""
    global _MIXED_LOCAL
    if mode in (False, None, "off"):
        _MIXED_LOCAL = "off"
    elif mode in (True, "refine"):
        _MIXED_LOCAL = "refine"
    else:
        assert mode == "f64", mode
        _MIXED_LOCAL = "f64"


def mixed_local() -> str:
    return _MIXED_LOCAL


# --- Rank bucketing -------------------------------------------------------
#
# TT bond ranks are data-dependent, so every op sees a stream of new array
# shapes and XLA compiles each one (profiling a dim-3 IPM run: 2448
# compilations, 81% of wall time).  Zero-padding freshly created bond
# ranks up to a bucket multiple keeps the represented tensor exact while
# collapsing the shape stream onto a small set of compiled kernels — the
# padded-rank design of SURVEY.md §7.  Bucket 1 disables padding (exact
# reference rank parity, used by the unit tests).

_RANK_BUCKET = 4

# --- Heterogeneous offload ---------------------------------------------------
#
# The session TPU sits behind a network tunnel: eager per-op dispatch costs
# ~0.4ms and every tiny TT bookkeeping op compiles remotely.  Offload mode
# keeps the host orchestration and the cheap TT algebra on the local CPU
# backend and routes only the HEAVY fused programs (AMEn sweeps, eigen
# window steps -- ~95% of the FLOPs) to the accelerator: their inputs are
# device_put once per solve and the state stays device-resident across
# sweeps.  Enable with jax_platforms="cpu,axon" + set_offload("axon").

_OFFLOAD_DEVICE = None


def set_offload(platform) -> None:
    global _OFFLOAD_DEVICE
    if platform is None:
        _OFFLOAD_DEVICE = None
        return
    import jax

    _OFFLOAD_DEVICE = jax.devices(platform)[0]
    if _OFFLOAD_DEVICE.platform == "tpu":
        # Route tall-panel QRs inside offloaded programs through the
        # Pallas Householder kernel (ops/kernels.py::panel_qr): measured
        # 8.1us vs 32.8us for XLA:TPU blocked QR at (128,32) f32 on v5e.
        from ttipm_tpu.ops.kernels import set_panel_qr

        set_panel_qr(True)


def offload_device():
    return _OFFLOAD_DEVICE


def offload_put(tree):
    """device_put a pytree to the offload device (identity when off)."""
    if _OFFLOAD_DEVICE is None:
        return tree
    import jax

    return jax.device_put(tree, _OFFLOAD_DEVICE)


def offload_fetch(tree):
    """Bring results back to the host default device (identity when off)."""
    if _OFFLOAD_DEVICE is None:
        return tree
    import jax

    return jax.device_put(tree, jax.devices()[0])


# --- Eigen step-size dtype ---------------------------------------------------
#
# The step-size eigensolves (fused_eigen.py) historically ran f64 even
# under the f32 profile: with the round-2 broken f32 splits an all-f32
# eigen path failed e2e within 2 iterations.  With the Gram-eigh split
# chain in place, "native" runs the pencil in config.dtype() — the mode
# the whole-eigen device program needs on TPU, where f64 means Jacobi
# rotation loops that blow up the remote compile (19 min measured).
# "f64" preserves the measured-good legacy behavior.

_EIGEN_DTYPE = "f64"


def set_eigen_dtype(mode: str) -> None:
    assert mode in ("f64", "native"), mode
    global _EIGEN_DTYPE
    _EIGEN_DTYPE = mode


def eigen_dtype():
    return jnp.float64 if _EIGEN_DTYPE == "f64" else _DTYPE


# Whole-solve device loop for the fused AMEn (solvers/fused.py
# ::_solve_program): the multi-sweep solve runs as ONE program with an
# on-device lax.while_loop termination test.  None = auto (enabled exactly
# when offload is active, where per-program load cost over the tunnel
# dominates); True/False force it either way.
_FUSED_WHOLE_SOLVE: bool | None = None


def set_fused_whole_solve(flag) -> None:
    global _FUSED_WHOLE_SOLVE
    _FUSED_WHOLE_SOLVE = None if flag is None else bool(flag)


def fused_whole_solve() -> bool:
    if _FUSED_WHOLE_SOLVE is None:
        return _OFFLOAD_DEVICE is not None
    return _FUSED_WHOLE_SOLVE


# --- Fused fixed-rank KKT solver (solvers/fused.py) ------------------------
#
# When enabled, the IPM routes its Newton solves through the fused
# fixed-rank block-AMEn (one jitted program per core step, static shapes)
# instead of the reference-faithful ragged sweep.  The ragged path remains
# for parity tests and as a numerical fallback.

_FUSED_KKT = True


def set_fused_kkt(flag: bool) -> None:
    global _FUSED_KKT
    _FUSED_KKT = bool(flag)


def fused_kkt() -> bool:
    return _FUSED_KKT


# Residual-equation refinement of accepted Newton directions (solvers/
# fused.py and amen.py `refine_target`): direction noise of magnitude rn
# injects ~rn * tr(X) ~ rn * 2^d of complementary slackness through the
# PSD-rounding compensation shifts, flooring the achievable absolute gap
# at large d (measured: maxcut d11 f64 stalls at 1e-2, maxcut d5 f32
# at ~5e-3, while the reference converges — its rank-adaptive sweeps
# reach machine-precision residuals that a fixed-rank or f32 solve
# cannot).  Refinement solves A e = b - A x and adds e back; the unknown
# is small, so each round multiplies the absolute residual by ~eta.
_NEWTON_REFINE = True


def set_newton_refine(flag: bool) -> None:
    global _NEWTON_REFINE
    _NEWTON_REFINE = bool(flag)


def newton_refine() -> bool:
    return _NEWTON_REFINE


def set_rank_bucket(bucket: int) -> None:
    global _RANK_BUCKET
    _RANK_BUCKET = max(int(bucket), 1)


def rank_bucket() -> int:
    return _RANK_BUCKET


def bucket_rank(r: int) -> int:
    """Smallest padded rank >= r: ranks 1,2 stay exact, larger ranks round
    up to a multiple of the bucket.  (Power-of-two buckets were measured
    slower at benchmark dims: the padding inflates the dense local-solve
    cost faster than it saves compiles.)"""
    r = int(r)
    if _RANK_BUCKET <= 1 or r <= 2:
        return r
    b = _RANK_BUCKET
    return ((r + b - 1) // b) * b


# --- Persistent compilation cache ------------------------------------------
#
# The IPM's shape stream compiles ~1000 small XLA programs per solve;
# profiling maxcut d5 showed 71s of a 109s solve inside
# backend_compile_and_load.  The JAX persistent cache amortises that across
# processes: a warm cache cut maxcut d3 from 99.9s to 26.3s with bit-equal
# results.  Caveat (why this is opt-in per entry point rather than
# import-time): XLA:CPU cache entries embed the compile machine's CPU
# features and loading them on a *different* host can SIGILL; same-host
# reuse is safe (the loader's "machine type doesn't match" stderr spam is a
# pseudo-feature comparison wart — +prefer-no-scatter/-gather — not a real
# mismatch).  Callers must not ship the cache directory across machines.

_CACHE_ENABLED = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache (idempotent).

    Default location: $TTIPM_JAX_CACHE, else ~/.cache/ttipm_tpu/xla.
    Set TTIPM_JAX_CACHE=0 to disable entirely.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return None
    import os

    env = os.environ.get("TTIPM_JAX_CACHE", "")
    if env == "0":
        return None
    path = path or env or os.path.expanduser("~/.cache/ttipm_tpu/xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # The IPM's programs compile in ~10-100ms each; the defaults
    # (min_compile_time 1s, min_entry_size) would cache almost nothing.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _CACHE_ENABLED = True
    return path


# --- Memory-map pressure guard ---------------------------------------------
#
# Every XLA:CPU executable pins ~9 anonymous mmaps (LLVM ORC code pages)
# for the life of the process; a d3 maxcut solve creates ~17k maps and a
# graphm run crossed the kernel default vm.max_map_count=65530, at which
# point mmap returns ENOMEM, LLVM logs "Cannot allocate memory", and the
# process segfaults.  jax.clear_caches() releases the executables (and
# their maps); with the persistent compilation cache on disk, re-compiles
# after a clear are ~9ms cache loads, so clearing under pressure is vastly
# cheaper than the alternative.  Checked once per IPM iteration.

_MAP_GUARD_THRESHOLD = 40_000


def maybe_relieve_map_pressure(threshold: int | None = None) -> bool:
    """Clear JAX's executable caches when /proc/self/maps gets close to
    vm.max_map_count.  Returns True when a clear happened.  No-op on
    platforms without /proc."""
    limit = threshold or _MAP_GUARD_THRESHOLD
    try:
        with open("/proc/self/maps", "rb") as fh:
            n_maps = sum(1 for _ in fh)
    except OSError:
        return False
    try:
        with open("/proc/sys/vm/max_map_count") as fh:
            limit = min(limit, int(int(fh.read()) * 0.7))
    except (OSError, ValueError):
        pass
    if n_maps < limit:
        return False
    jax.clear_caches()
    return True
