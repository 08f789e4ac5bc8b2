"""Block AMEn/MALS solver for TT operator equations ``A x = b`` where A is
a ``TTBlockMatrix`` and b a ``TTBlockVector``.

The solver alternates forward/backward sweeps over the cores.  At each
core it (1) solves the projected local system through an injected
``local_solver`` (the IPM supplies its Schur-elimination KKT solvers),
(2) SVD-truncates the local solution with a residual-driven greedy rank
backoff, and (3) enriches the basis with projected-residual directions
("AMEn" z-cores with a kick rank).  Petrov-Galerkin interface tensors
(``XAX``/``Xb`` "phi"s) are updated incrementally per step.

Parity: /root/reference/src/tt_als.py:277-825.  Re-architected for JAX:
cores are device arrays, every contraction is a fused einsum, and rank
decisions are the only host round-trips.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ttipm_tpu.ops.jacobi import safe_svd

from ttipm_tpu import config
from ttipm_tpu.ops.linalg import qr_solve
from ttipm_tpu.ops.rounding import (
    pad_bond_factors,
    prune_singular_vals,
    tt_rank_retraction,
    truncated_svd,
)
from ttipm_tpu.ops.tt import TT, tt_normalise, tt_ranks
from ttipm_tpu.solvers.blocks import TTBlockMatrix, TTBlockVector

__all__ = [
    "tt_block_amen",
    "tt_restarted_block_amen",
    "AmenToleranceReached",
    "compute_phi_bck_A",
    "compute_phi_fwd_A",
    "compute_phi_bck_rhs",
    "compute_phi_fwd_rhs",
]


class AmenToleranceReached(RuntimeError):
    """Raised when the right-hand side is already below absolute tolerance
    (src/tt_als.py:780-781) — callers treat this as convergence."""


class AmenRestartsExhausted(RuntimeError):
    """Raised when the restart budget is exhausted (src/tt_als.py:825)."""


# --- Petrov-Galerkin interface ("phi") updates -----------------------------

def compute_phi_bck_A(phi_next, core_left, core_A, core_right):
    return jnp.einsum("LSR,lML,sMNS,rNR->lsr", phi_next, core_left, core_A, core_right)


def compute_phi_fwd_A(phi_prev, core_left, core_A, core_right):
    return jnp.einsum("lsr,lML,sMNS,rNR->LSR", phi_prev, core_left, core_A, core_right)


def compute_phi_bck_rhs(phi_next, core_b, core):
    return jnp.einsum("BR,bnB,rnR->br", phi_next, core_b, core)


def compute_phi_fwd_rhs(phi_prev, core_b, core):
    return jnp.einsum("br,bnB,rnR->BR", phi_prev, core_b, core)


def _block_column_scales(core: jax.Array) -> jax.Array:
    """Per-block-column norm floors used to equilibrate the local SVD
    (src/tt_als.py:321-326).  The floor is dtype-aware: the reference's
    absolute 1e-10 assumes f64 SVD noise (~1e-16*sigma); in f32 a dead
    block column divided by 1e-10 amplifies noise ~1e3x per sweep (see
    fused.py::_column_scales for the measured overflow chain)."""
    norms = jnp.sqrt(jnp.sum(core**2, axis=(0, 2, 3)))
    rel = 1e-5 if core.dtype == jnp.float32 else 1e-12
    floor = jnp.maximum(rel * jnp.max(norms), 1e-10)
    return jnp.maximum(norms, floor).reshape(1, -1, 1, 1)


def _residual_rank_backoff(
    block_A_k, XAX_k, XAX_k1, u, v, r_start, rx_k, block_size, n_k, rx_k1,
    rhs, norm_rhs, trunc_lim, bwd: bool,
):
    """Greedy rank reduction: drop trailing singular directions while the
    projected residual stays under ``trunc_lim`` (src/tt_als.py:338-347).

    ``u``/``v`` are the SVD factors in sweep-direction layout; returns the
    kept rank.  All drop candidates are evaluated in ONE batched local
    product + a cumulative sum of residual norms (the reference probes
    them sequentially, one local product per dropped rank,
    src/tt_als.py:340-347).
    """
    if bwd:
        sol = jnp.reshape((u[:, :r_start] @ v[:r_start]).T, (rx_k, block_size, n_k, rx_k1))
        width = int(u.shape[1])
    else:
        sol = jnp.einsum("rbR,RdK->rdbK", u[:, :, :r_start].reshape(rx_k, n_k, r_start),
                         v[:r_start].reshape(r_start, block_size, rx_k1))
        width = int(u.shape[-1])
    res0 = block_A_k.block_local_product(XAX_k, XAX_k1, sol) - rhs
    if r_start <= 1:
        return min(2, width)
    if float(jnp.linalg.norm(res0)) / norm_rhs > trunc_lim:
        # even the full-rank candidate violates the limit: keep r_start
        # (matches the reference loop breaking on its first probe).
        return min(r_start, width)

    # rank-1 terms in drop order q = r_start-1 .. 1
    if bwd:
        # term_q core = (u_q v_q)^T reshaped (rx, block, n, rx1)
        terms = jnp.einsum("mq,qp->qpm", u[:, 1:r_start][:, ::-1], v[1:r_start][::-1])
        terms = terms.reshape(r_start - 1, rx_k, block_size, n_k, rx_k1)
    else:
        terms = jnp.einsum(
            "rbq,qdK->qrdbK",
            u[:, :, 1:r_start][:, :, ::-1].reshape(rx_k, n_k, r_start - 1),
            v[1:r_start][::-1].reshape(r_start - 1, block_size, rx_k1),
        )
    K_terms = block_A_k.block_local_product_batched(XAX_k, XAX_k1, terms)
    partial = res0[None] - jnp.cumsum(K_terms, axis=0)
    norms = jnp.sqrt(jnp.sum(partial**2, axis=(1, 2, 3, 4)))
    exceed = np.asarray(norms) / norm_rhs > trunc_lim
    hits = np.nonzero(exceed)[0]
    if hits.size == 0:
        r = 1  # loop ran to completion in the reference
    else:
        r = r_start - 1 - int(hits[0])  # break index in the reference loop
    # Restore the last acceptable rank; clamp to the SVD width (the
    # reference's +1 overshoot relies on numpy's clamped slicing).
    return min(r + 1, width)


def _bck_sweep(
    local_solver, x_cores, z_cores, XAX, ZAX, block_A, Xb, Zb, block_b,
    rx, rz, N, block_size, trunc_tol, d, swp, eps, r_max, kick_rank,
    last, amen, direct_solve_failure, rng,
):
    """Right-to-left half sweep (src/tt_als.py:277-394)."""
    local_res = np.inf if swp == 0 else 0.0
    local_dx = np.inf if swp == 0 else 0.0
    for k in range(d - 1, -1, -1):
        block_A_k = block_A[k]
        block_b_k = block_b[k]
        have_solve = swp > 0 and not last
        if have_solve:
            previous_solution = x_cores[k]
            (solution_now, block_res_old, block_res_new, rhs, norm_rhs,
             direct_solve_failure) = local_solver(
                XAX[k], block_A_k, XAX[k + 1], Xb[k], block_b_k, Xb[k + 1],
                previous_solution, 3 * d, not direct_solve_failure,
            )
            local_res = max(local_res, block_res_old)
            dx = float(
                jnp.linalg.norm(solution_now - previous_solution)
                / jnp.linalg.norm(solution_now)
            )
            local_dx = max(dx, local_dx)
            if amen:
                Az = block_A_k.compressed_block_local_product(
                    ZAX[k], ZAX[k + 1], solution_now,
                    shape=(rz[k], block_size, N[k], rz[k + 1]),
                )
                rhsz = block_b_k.block_local_product(
                    Zb[k], Zb[k + 1], 1, (rz[k], block_size, N[k], rz[k + 1])
                )
                resz = jnp.reshape(
                    rhsz - Az, (rz[k] * block_size, N[k] * rz[k + 1])
                ).T
            scales = _block_column_scales(solution_now)
            solution_mat = jnp.reshape(
                scales * solution_now, (rx[k] * block_size, N[k] * rx[k + 1])
            ).T
        else:
            solution_now = x_cores[k]
            scales = _block_column_scales(solution_now)
            solution_mat = jnp.reshape(
                scales * solution_now, (rx[k] * block_size, N[k] * rx[k + 1])
            ).T
            if amen and not last:
                resz = jnp.reshape(z_cores[k], (rz[k] * block_size, N[k] * rz[k + 1])).T

        if k > 0:
            u, s, v_t = safe_svd(solution_mat, full_matrices=False)
            v = s[:, None] * v_t

            if have_solve:
                trunc_lim = max(2 * trunc_tol, block_res_new)
                r_start = min(prune_singular_vals(np.asarray(s), eps), r_max)
                r = _residual_rank_backoff(
                    block_A_k, XAX[k], XAX[k + 1], u, v, r_start,
                    rx[k], block_size, N[k], rx[k + 1], rhs, norm_rhs,
                    trunc_lim, bwd=True,
                )
                u_core = jnp.reshape(u[:, :r].T, (r, N[k], rx[k + 1]))
                v_core = v[:r].T.reshape(rx[k], block_size, r)
                if amen and not last:
                    # Enrich the left basis with projected-residual
                    # directions (src/tt_als.py:349-361).
                    sol_trunc = jnp.reshape(
                        (u[:, :r] @ v[:r]).T, (rx[k], block_size, N[k], rx[k + 1])
                    )
                    Axz = block_A_k.lcompressed_block_local_product(
                        ZAX[k], XAX[k + 1], sol_trunc,
                        shape=(rz[k], block_size, N[k], rx[k + 1]),
                    )
                    rhsxz = block_b_k.block_local_product(
                        Zb[k], Xb[k + 1], 1, (rz[k], block_size, N[k], rx[k + 1])
                    )
                    resxz = rhsxz - Axz
                    kr = min(kick_rank, rz[k] * block_size, N[k] * rx[k + 1])
                    uz, _ = truncated_svd(
                        jnp.reshape(resxz, (rz[k] * block_size, N[k] * rx[k + 1])).T, kr
                    )
                    uz = uz.T.reshape(kr, N[k], rx[k + 1])
                    u_aug = jnp.concatenate((u_core, uz), axis=0)
                    q, R = jnp.linalg.qr(
                        u_aug.reshape(-1, N[k] * rx[k + 1]).T, mode="reduced"
                    )
                    u_core = q.T.reshape(-1, N[k], rx[k + 1])
                    v_core = jnp.einsum("Rdk,kr->Rdr", v_core, R.T[:r])
                    r = int(u_core.shape[0])
            else:
                r = min(prune_singular_vals(np.asarray(s), eps), r_max)
                u_core = jnp.reshape(u[:, :r].T, (r, N[k], rx[k + 1]))
                v_core = v[:r].T.reshape(rx[k], block_size, r)

            v_core, u_core, r = pad_bond_factors(v_core, u_core, r, orth="right")
            x_cores[k] = u_core
            x_cores[k - 1] = (
                jnp.einsum("rdc,cbR->rbdR", x_cores[k - 1], v_core) / scales
            )
            rx[k] = r

            XAX[k] = {
                key: compute_phi_bck_A(XAX[k + 1][key], x_cores[k], block_A_k[key], x_cores[k])
                for key in block_A_k
            }
            Xb[k] = {
                i: compute_phi_bck_rhs(Xb[k + 1][i], block_b_k[i], x_cores[k])
                for i in block_b_k
            }

            if amen and not last:
                kr = min(kick_rank, *resz.shape)
                uz, vz = truncated_svd(resz, kr)
                uz = uz.T.reshape(kr, N[k], rz[k + 1])
                vz = jnp.reshape(vz.T, (rz[k], block_size, kr))
                z_cores[k] = uz
                z_cores[k - 1] = (
                    jnp.einsum("rdc,cbR->rbdR", z_cores[k - 1], vz) / scales
                )
                rz[k] = int(uz.shape[0])

                ZAX[k] = {
                    key: compute_phi_bck_A(ZAX[k + 1][key], z_cores[k], block_A_k[key], x_cores[k])
                    for key in block_A_k
                }
                ZAX[k].update(
                    {
                        (l, t): compute_phi_bck_A(
                            ZAX[k + 1][(l, t)], z_cores[k],
                            jnp.swapaxes(block_A_k[(i, j)], 1, 2), x_cores[k],
                        )
                        for (i, j), (l, t) in block_A_k.transposes.items()
                    }
                )
                Zb[k] = {
                    i: compute_phi_bck_rhs(Zb[k + 1][i], block_b_k[i], z_cores[k])
                    for i in block_b_k
                }
        else:
            x_cores[k] = (
                jnp.reshape(solution_mat.T, (rx[k], block_size, N[k], rx[k + 1])) / scales
            )
            if amen and not last:
                z_cores[k] = (
                    jnp.reshape(resz.T, (rz[k], block_size, N[k], rz[k + 1])) / scales
                )

    return x_cores, z_cores, XAX, Xb, rx, local_res, local_dx, direct_solve_failure


def _fwd_sweep(
    local_solver, x_cores, z_cores, XAX, ZAX, block_A, Xb, Zb, block_b,
    rx, rz, N, block_size, trunc_tol, d, swp, eps, r_max, kick_rank,
    last, amen, direct_solve_failure, rng,
):
    """Left-to-right half sweep (src/tt_als.py:397-522)."""
    local_res = np.inf if swp == 0 else 0.0
    local_dx = np.inf if swp == 0 else 0.0
    for k in range(d):
        block_A_k = block_A[k]
        block_b_k = block_b[k]
        have_solve = swp > 0 and not last
        if have_solve:
            previous_solution = x_cores[k]
            (solution_now, block_res_old, block_res_new, rhs, norm_rhs,
             direct_solve_failure) = local_solver(
                XAX[k], block_A_k, XAX[k + 1], Xb[k], block_b_k, Xb[k + 1],
                previous_solution, 3 * d, not direct_solve_failure,
            )
            local_res = max(local_res, block_res_old)
            dx = float(
                jnp.linalg.norm(solution_now - previous_solution)
                / jnp.linalg.norm(solution_now)
            )
            local_dx = max(dx, local_dx)
            if amen:
                Az = block_A_k.compressed_block_local_product(
                    ZAX[k], ZAX[k + 1], solution_now,
                    shape=(rz[k], block_size, N[k], rz[k + 1]),
                )
                rhsz = block_b_k.block_local_product(
                    Zb[k], Zb[k + 1], 1, (rz[k], block_size, N[k], rz[k + 1])
                )
                resz = jnp.transpose(rhsz - Az, (0, 2, 1, 3)).reshape(
                    rz[k] * N[k], block_size * rz[k + 1]
                )
            scales = _block_column_scales(solution_now)
            solution_mat = jnp.transpose(scales * solution_now, (0, 2, 1, 3)).reshape(
                rx[k] * N[k], block_size * rx[k + 1]
            )
        else:
            solution_now = x_cores[k]
            scales = _block_column_scales(solution_now)
            solution_mat = jnp.transpose(scales * solution_now, (0, 2, 1, 3)).reshape(
                rx[k] * N[k], block_size * rx[k + 1]
            )
            if amen and not last:
                resz = jnp.reshape(
                    jnp.transpose(z_cores[k], (0, 2, 1, 3)),
                    (rz[k] * N[k], block_size * rz[k + 1]),
                )

        if k < d - 1:
            u, s, v_t = safe_svd(solution_mat, full_matrices=False)
            v = s[:, None] * v_t
            u3 = u.reshape(rx[k], N[k], -1)

            if have_solve:
                trunc_lim = max(2 * trunc_tol, block_res_new)
                r_start = min(prune_singular_vals(np.asarray(s), eps), r_max)
                r = _residual_rank_backoff(
                    block_A_k, XAX[k], XAX[k + 1], u3, v, r_start,
                    rx[k], block_size, N[k], rx[k + 1], rhs, norm_rhs,
                    trunc_lim, bwd=False,
                )
                if amen:
                    # Enrich the right basis (src/tt_als.py:473-485).
                    sol_trunc = jnp.einsum(
                        "rbR,RdK->rdbK",
                        u3[:, :, :r],
                        v[:r].reshape(r, block_size, rx[k + 1]),
                    )
                    Axz = block_A_k.rcompressed_block_local_product(
                        XAX[k], ZAX[k + 1], sol_trunc,
                        shape=(rx[k], block_size, N[k], rz[k + 1]),
                    )
                    rhsxz = block_b_k.block_local_product(
                        Xb[k], Zb[k + 1], 1, (rx[k], block_size, N[k], rz[k + 1])
                    )
                    resxz = jnp.transpose(rhsxz - Axz, (0, 2, 1, 3))
                    kr = min(kick_rank, rx[k] * N[k], block_size * rz[k + 1])
                    uz, _ = truncated_svd(
                        jnp.reshape(resxz, (rx[k] * N[k], block_size * rz[k + 1])), kr
                    )
                    uz = jnp.reshape(uz, (rx[k], N[k], kr))
                    u_aug = jnp.concatenate((u3[:, :, :r], uz), axis=-1)
                    q, R = jnp.linalg.qr(u_aug.reshape(rx[k] * N[k], -1), mode="reduced")
                    u3 = q.reshape(rx[k], N[k], -1)
                    v_kept = jnp.einsum(
                        "rR,RdK->rdK", R[:, :r], v[:r].reshape(r, block_size, rx[k + 1])
                    )
                    r = int(v_kept.shape[0])
                else:
                    u3 = u3[:, :, :r]
                    v_kept = v[:r].reshape(r, block_size, rx[k + 1])
            else:
                r = min(prune_singular_vals(np.asarray(s), eps), r_max)
                u3 = u3[:, :, :r]
                v_kept = v[:r].reshape(r, block_size, rx[k + 1])

            u3, v_kept, r = pad_bond_factors(u3, v_kept, r)
            merged = jnp.einsum("rbR,RdK->rbdK", v_kept, x_cores[k + 1])
            x_cores[k] = u3
            x_cores[k + 1] = merged.reshape(r, block_size, N[k + 1], rx[k + 2]) / scales
            rx[k + 1] = r

            XAX[k + 1] = {
                key: compute_phi_fwd_A(XAX[k][key], x_cores[k], block_A_k[key], x_cores[k])
                for key in block_A_k
            }
            Xb[k + 1] = {
                i: compute_phi_fwd_rhs(Xb[k][i], block_b_k[i], x_cores[k])
                for i in block_b_k
            }

            if amen and not last:
                kr = min(kick_rank, *resz.shape)
                uz, vz = truncated_svd(resz, kr)
                uz = jnp.reshape(uz, (rz[k], N[k], kr))
                vz = jnp.reshape(vz, (kr, block_size, rz[k + 1]))
                z_cores[k] = uz
                z_cores[k + 1] = (
                    jnp.einsum("rbR,RdK->rbdK", vz, z_cores[k + 1]) / scales
                )
                rz[k + 1] = int(uz.shape[-1])

                ZAX[k + 1] = {
                    key: compute_phi_fwd_A(ZAX[k][key], z_cores[k], block_A_k[key], x_cores[k])
                    for key in block_A_k
                }
                ZAX[k + 1].update(
                    {
                        (l, t): compute_phi_fwd_A(
                            ZAX[k][(l, t)], z_cores[k],
                            jnp.swapaxes(block_A_k[(i, j)], 1, 2), x_cores[k],
                        )
                        for (i, j), (l, t) in block_A_k.transposes.items()
                    }
                )
                Zb[k + 1] = {
                    i: compute_phi_fwd_rhs(Zb[k][i], block_b_k[i], z_cores[k])
                    for i in block_b_k
                }
        else:
            x_cores[k] = (
                jnp.transpose(
                    jnp.reshape(solution_mat, (rx[k], N[k], block_size, rx[k + 1])),
                    (0, 2, 1, 3),
                )
                / scales
            )
            if amen and not last:
                z_cores[k] = (
                    jnp.transpose(
                        jnp.reshape(resz, (rz[k], N[k], block_size, rz[k + 1])),
                        (0, 2, 1, 3),
                    )
                    / scales
                )

    return x_cores, z_cores, XAX, Xb, rx, local_res, local_dx, direct_solve_failure


def tt_block_amen(
    block_A: TTBlockMatrix,
    block_b: TTBlockVector,
    term_tol: float,
    r_max: int = 100,
    eps: float = 1e-12,
    nswp: int = 22,
    x0: Optional[TT] = None,
    local_solver: Optional[Callable] = None,
    kick_rank: int = 2,
    amen: bool = False,
    verbose: bool = False,
):
    """Alternating block AMEn driver (src/tt_als.py:525-670)."""
    block_size = int(max(k[0] for k in block_A.keys()) + 1)
    model_entry = next(iter(block_b.values()))
    x_shape = tuple(model_entry[0].shape[1:-1])

    if local_solver is None:
        local_solver = make_default_local_solver()

    rng = np.random

    def fresh_guess():
        head = tt_normalise(
            [
                jnp.asarray(rng.randn(1, *c.shape[1:-1], 1), dtype=config.dtype())
                for c in model_entry[:-1]
            ]
        )
        tail = jnp.asarray(
            rng.randn(1, block_size, *x_shape, 1), dtype=config.dtype()
        )
        return head + [tail]

    def find_block_core(cores):
        idxs = [
            i for i, c in enumerate(cores) if c.ndim == 4 and c.shape[1] == block_size
        ]
        return idxs[0] if len(idxs) == 1 else None

    direction = 1
    if x0 is None:
        x_cores = fresh_guess()
    else:
        x_cores = list(x0)
        block_idx = find_block_core(x_cores)
        if block_idx == 0:
            direction = -1
        elif block_idx == len(x_cores) - 1:
            direction = 1
        else:
            if verbose:
                print("\tAttention: dropping warm start with invalid block-core layout.")
            x_cores = fresh_guess()

    t0 = time.time()
    N = [c.shape[-2] for c in x_cores]
    d = len(N)

    ones3 = jnp.ones((1, 1, 1), dtype=config.dtype())
    ones2 = jnp.ones((1, 1), dtype=config.dtype())
    XAX = (
        [{key: ones3 for key in block_A}]
        + [{key: None for key in block_A} for _ in range(d - 1)]
        + [{key: ones3 for key in block_A}]
    )
    Xb = (
        [{key: ones2 for key in block_b}]
        + [{key: None for key in block_b} for _ in range(d - 1)]
        + [{key: ones2 for key in block_b}]
    )
    rx = np.array([1] + tt_ranks(x_cores) + [1])

    ZAX = Zb = z_cores = rz = None
    if amen:
        ZAX = (
            [{key: ones3 for key in block_A.tkeys()}]
            + [{key: None for key in block_A.tkeys()} for _ in range(d - 1)]
            + [{key: ones3 for key in block_A.tkeys()}]
        )
        Zb = (
            [{key: ones2 for key in block_b}]
            + [{key: None for key in block_b} for _ in range(d - 1)]
            + [{key: ones2 for key in block_b}]
        )
        z_cores = (
            [
                jnp.asarray(
                    rng.randn(*x_cores[0].shape[:-1], kick_rank)
                    / (int(np.prod(x_cores[0].shape[1:-1])) * kick_rank**2),
                    dtype=config.dtype(),
                )
            ]
            + [
                jnp.asarray(
                    rng.randn(kick_rank, *c.shape[1:-1], kick_rank)
                    / (int(np.prod(c.shape[1:-1])) * kick_rank**2),
                    dtype=config.dtype(),
                )
                for c in x_cores[1:-1]
            ]
            + [
                jnp.asarray(
                    rng.randn(kick_rank, *x_cores[-1].shape[1:])
                    / (int(np.prod(x_cores[-1].shape[1:-1])) * kick_rank**2),
                    dtype=config.dtype(),
                )
            ]
        )
        rz = np.array([1] + tt_ranks(z_cores) + [1])

    last = False
    final_local_res = np.inf
    direct_solve_failure = False
    trunc_tol = term_tol / np.sqrt(d)
    swp = 0

    for swp in range(nswp + 1):
        # d>=12 solves mint enough fresh shapes to cross vm.max_map_count
        # WITHIN one multi-sweep solve (maxcut d12 SIGSEGV'd after 505s of
        # one AMEn call); check per sweep, not only per solve.
        config.maybe_relieve_map_pressure()
        sweep = _bck_sweep if direction > 0 else _fwd_sweep
        (x_cores, z_cores, XAX, Xb, rx, local_res, local_dx,
         direct_solve_failure) = sweep(
            local_solver, x_cores, z_cores, XAX, ZAX, block_A, Xb, Zb, block_b,
            rx, rz, N, block_size, trunc_tol, d, swp, eps, r_max, kick_rank,
            last, amen, direct_solve_failure, rng,
        )

        if last:
            break
        if local_res < term_tol or local_dx < eps or swp == nswp - 2:
            last = True
            final_local_res = local_res

        if verbose:
            print("\t===Finishing up===" if last else f"\t=====Sweep {swp+1}=====")
            print(f"\tDirection {direction}")
            print(f"\tResidual {local_res:.3e}")
            print(f"\tTT-sol rank: {rx[1:-1]}")
        direction *= -1

    if verbose:
        print(f"\tAMEn done: rank {rx[1:-1]}, residual {final_local_res:.3e}, "
              f"{swp} sweeps, {time.time() - t0:.2f}s", flush=True)

    return x_cores, final_local_res


def make_default_local_solver(rtol: float = 1e-10):
    """Dense projected local solve for standalone AMEn use (the IPM injects
    its own Schur solvers).  Parity: src/tt_als.py:672-741, with the dense
    branch assembled in one einsum per block and solved by LU; the
    adaptive-lgmres branch is replaced by eager restarted GMRES on the
    matvec (see solvers/lgmres.py for why not jax.scipy's gmres).
    """
    from ttipm_tpu.solvers.lgmres import lgmres

    def local_solver(XAX_k, block_A_k, XAX_k1, Xb_k, block_b_k, Xb_k1,
                     previous_solution, size_limit, dense_ok):
        x_shape = previous_solution.shape
        block_size = x_shape[1]
        m = x_shape[0] * x_shape[2] * x_shape[3]
        rhs = jnp.zeros_like(previous_solution)
        for i in block_b_k:
            rhs = rhs.at[:, i].set(
                jnp.einsum("br,bmB,BR->rmR", Xb_k[i], block_b_k[i], Xb_k1[i])
            )
        norm_rhs = max(float(jnp.linalg.norm(rhs)), 1e-10)
        block_res_old = float(
            jnp.linalg.norm(
                block_A_k.block_local_product(XAX_k, XAX_k1, previous_solution) - rhs
            )
        ) / norm_rhs

        dense = (np.sqrt(x_shape[0] * x_shape[3]) <= size_limit) and dense_ok
        failure = False
        solution_now = None
        if dense:
            B = jnp.zeros((block_size, m, block_size, m), dtype=config.dtype())
            for (i, j) in block_A_k:
                local = jnp.einsum(
                    "lsr,smnS,LSR->lmLrnR", XAX_k[i, j], block_A_k[i, j], XAX_k1[i, j]
                ).reshape(m, m)
                B = B.at[i, :, j, :].add(local)
                if (i, j) in block_A_k.transposes:
                    kk, tt_ = block_A_k.transposes[i, j]
                    B = B.at[kk, :, tt_, :].add(local.T)
                if (i, j) in block_A_k.aliases:
                    kk, tt_ = block_A_k.aliases[i, j]
                    B = B.at[kk, :, tt_, :].add(local)
            rhs_flat = jnp.transpose(rhs, (1, 0, 2, 3)).reshape(-1)
            x = qr_solve(B.reshape(block_size * m, block_size * m), rhs_flat)
            if bool(jnp.all(jnp.isfinite(x))):
                solution_now = jnp.transpose(
                    x.reshape(block_size, x_shape[0], x_shape[2], x_shape[3]),
                    (1, 0, 2, 3),
                )
            else:
                failure = True

        if solution_now is None:
            def mat_vec(vec):
                core = jnp.transpose(
                    vec.reshape(block_size, x_shape[0], x_shape[2], x_shape[3]),
                    (1, 0, 2, 3),
                )
                out = block_A_k.block_local_product(XAX_k, XAX_k1, core)
                return jnp.transpose(out, (1, 0, 2, 3)).reshape(-1)

            b_flat = jnp.transpose(rhs, (1, 0, 2, 3)).reshape(-1)
            x0_flat = jnp.transpose(previous_solution, (1, 0, 2, 3)).reshape(-1)
            x, _ = lgmres(
                mat_vec, b_flat, x0=x0_flat, rtol=rtol,
                restart=min(m * block_size, 40), maxiter=100,
            )
            solution_now = jnp.transpose(
                x.reshape(block_size, x_shape[0], x_shape[2], x_shape[3]), (1, 0, 2, 3)
            )

        block_res_new = float(
            jnp.linalg.norm(
                block_A_k.block_local_product(XAX_k, XAX_k1, solution_now) - rhs
            )
        ) / norm_rhs
        if block_res_old < block_res_new:
            solution_now = previous_solution
        return (solution_now, block_res_old, min(block_res_old, block_res_new),
                rhs, norm_rhs, failure)

    return local_solver


def tt_restarted_block_amen(
    block_A: TTBlockMatrix,
    block_b: TTBlockVector,
    rank_restriction: int,
    op_tol: float,
    termination_tol: float = 1e-3,
    eps: float = 1e-11,
    num_restarts: int = 3,
    inner_m: int = 10,
    x0: Optional[TT] = None,
    local_solver: Optional[Callable] = None,
    verbose: bool = False,
    refine_target: Optional[float] = None,
):
    """Outer restart loop around ``tt_block_amen``: warm-started re-solves
    at enlarged rank until the global residual criterion holds
    (src/tt_als.py:744-825).

    ``refine_target`` (absolute residual) additionally enables
    residual-equation refinement on the accepted solution — see
    solvers/fused.py::tt_restarted_block_amen_fused for the rationale
    (eta-level direction noise is amplified by tr ~ 2^d through the
    PSD-rounding compensation shifts)."""
    if x0 is not None:
        dim = len(x0)
        x0 = tt_rank_retraction(list(x0), [dim] * (dim - 1))

    def solve_als(rhs, rank, start, iters, kick):
        # Ragged sweeps mint fresh shapes continuously; long d>=12 solves
        # crossed vm.max_map_count (LLVM-ORC pins ~9 mmaps per program)
        # and SIGSEGV'd mid-AMEn, so the pressure guard must also run
        # here, not just once per IPM iteration (config.py:221-236).
        from ttipm_tpu import config as _config

        _config.maybe_relieve_map_pressure()
        return tt_block_amen(
            block_A, rhs, termination_tol, r_max=rank, eps=eps, nswp=iters,
            x0=start, local_solver=local_solver, kick_rank=kick, amen=True,
            verbose=verbose,
        )

    # ALS product warm-start cache: restarts and refine rounds fit the
    # same high-rank operator-block products against slightly-perturbed
    # solutions; warm-starting each fit from the previous round's result
    # collapses the ALS ramp (round-4 diagnosis: the refine-path product
    # grind was the largest hard-seed line item, ARCHITECTURE.md).
    prod_cache: dict = {}

    def residual_norm(rhs, x_cores):
        Ax = block_A.block_product(x_cores, 0.1 * op_tol, cache=prod_cache)
        return (rhs - Ax).norm

    rhs = block_b
    orig_rhs_norm = rhs.norm
    if orig_rhs_norm < 0.5 * op_tol:
        raise AmenToleranceReached(
            f"absolute tolerance already reached: {orig_rhs_norm:4f} < {op_tol:4f}"
        )

    def refined(x_cores, res):
        if refine_target is None:
            return x_cores, res
        from ttipm_tpu import config as _config
        from ttipm_tpu.solvers.blocks import tt_block_train_add

        num_blocks = int(
            x_cores[int(np.argmax([c.ndim for c in x_cores]))].shape[1]
        )
        prod_tol = max(0.01 * refine_target, float(_config.clamp_eps(eps)))
        # one tight-tolerance block product per round: the residual train
        # r_blk doubles as both the refinement RHS and the norm source
        r_blk = rhs - block_A.block_product(x_cores, prod_tol,
                                            cache=prod_cache)
        rn = r_blk.norm
        for _ in range(2):
            if not np.isfinite(rn) or rn <= refine_target:
                break
            try:
                e_cores, _ = solve_als(r_blk, rank_restriction, None,
                                       inner_m, 2)
                x_new = tt_block_train_add(x_cores, e_cores, num_blocks, eps)
            except Exception:
                break
            r_new = rhs - block_A.block_product(x_new, prod_tol,
                                                cache=prod_cache)
            rn_new = r_new.norm
            if not np.isfinite(rn_new) or rn_new >= 0.5 * rn:
                break
            if verbose:
                print(f"\t[amen refine] res {rn:.3e} -> {rn_new:.3e}",
                      flush=True)
            x_cores, rn, r_blk = x_new, rn_new, r_new
        return x_cores, min(res, rn / max(orig_rhs_norm, 1e-300))

    x_cores, res = solve_als(rhs, rank_restriction, x0, inner_m, 2)
    if res < termination_tol:
        return refined(x_cores, res)
    rhs_norm = residual_norm(rhs, x_cores)
    if rhs_norm < termination_tol * orig_rhs_norm or rhs_norm < orig_rhs_norm:
        return refined(x_cores, res)
    if rhs_norm > 0.9 * orig_rhs_norm:
        # Basis-limited early break (mirrors fused.py's ladder break): the
        # first full rank-adaptive solve made <10% residual progress, so
        # the system is effectively unsolvable in this basis — hard-seed
        # finishing phases produce near-singular KKTs whose ragged
        # restarts all stall at the same residual (measured: stuck at
        # ~1.4 across 3 restarts x nswp sweeps while the IPM's
        # never-regress guard discarded the result anyway).
        raise AmenRestartsExhausted(
            f"basis-limited: first solve stalled at relative error "
            f"{rhs_norm / orig_rhs_norm:.3e}; skipping restarts"
        )

    prev_norm = rhs_norm
    for _ in range(1, num_restarts):
        dim = len(x_cores)
        x_cores = tt_rank_retraction(x_cores, [2 * dim] * (dim - 1))
        x_cores, res = solve_als(rhs, rank_restriction + 4, x_cores, inner_m, 4)
        rhs_norm = residual_norm(rhs, x_cores)
        if rhs_norm < termination_tol * orig_rhs_norm or rhs_norm < orig_rhs_norm:
            return refined(x_cores, res)
        if rhs_norm > 0.9 * prev_norm:
            break  # enlarged rank bought <10%: further restarts are waste
        prev_norm = rhs_norm

    raise AmenRestartsExhausted(
        f"restart budget exhausted, relative error {rhs_norm / orig_rhs_norm:.3e}; "
        "consider raising the rank ceiling"
    )
