"""TT orthogonalisation and rounding.

Rounding is the single hottest primitive in the TT-IPM (called hundreds of
times per interior-point iteration, SURVEY.md §3.2).  The scheme: a
right-to-left QR sweep puts the train in right-orthogonal form, then a
left-to-right SVD sweep truncates each bond against a per-bond error budget
``eps / sqrt(d-1)``.

Variants:
  * ``tt_rank_reduce``      — plain rounding
    (parity: /root/reference/cy_src/tt_ops_cy.pyx:180-226)
  * ``tt_psd_rank_reduce``  — tracks the total discarded energy and adds
    ``sqrt(sum eps_k^2) * I`` back so a PSD input stays PSD
    (parity: cy_src/tt_ops_cy.pyx:262-325)
  * ``tt_mask_rank_reduce`` — same compensation but along a mask TT, for
    iterates supported on an inequality mask (cy_src/tt_ops_cy.pyx:329-388)

Singular-value pruning keeps the smallest head such that the discarded
tail energy stays below ``eps^2`` (cy_src/tt_ops_cy.pyx:162-177); the
decision is made on the host from a tiny vector of singular values, while
panel QR/SVD and the core recombinations run on device.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ttipm_tpu.ops.jacobi import safe_svd

from ttipm_tpu import config
from ttipm_tpu.ops.tt import TT, tt_add, tt_ranks, tt_swap_all

__all__ = [
    "prune_singular_vals",
    "tt_rl_orthogonalise",
    "tt_lr_orthogonalise",
    "tt_rank_reduce",
    "tt_psd_rank_reduce",
    "tt_mask_rank_reduce",
    "tt_rank_retraction",
    "truncated_svd",
    "add_kick_rank",
    "add_kick_rank_rev",
]


def prune_singular_vals(s: np.ndarray, eps: float) -> int:
    """Number of singular values to keep for tail energy < eps^2.

    ``tail[k]`` is the energy discarded when keeping k values; the kept
    rank is the first k whose tail fits the budget (all of them when none
    does).  At eps=0 an exactly-zero tail may still be dropped — the
    reference's ``argmax(tail < eps^2)`` form returns 0 (= keep 1) in the
    all-False case, which silently discarded real mass when the smallest
    singular value was exactly zero (cy_src/tt_ops_cy.pyx:162-177)."""
    s = np.asarray(s)
    if np.linalg.norm(s) == 0.0:
        return 1
    tail = np.cumsum(np.abs(s[::-1]) ** 2)[::-1]
    budget = eps**2
    hits = np.nonzero(tail < budget if budget > 0 else tail <= 0.0)[0]
    r = int(hits[0]) if hits.size else int(s.size)
    return max(r, 1)


def _orthonormal_complement(q_mat: jax.Array, k: int) -> jax.Array:
    """k extra orthonormal columns orthogonal to the columns of q_mat.

    The Gaussian draw uses a fixed-seed Generator (fresh per call) so that
    bucket-padding directions — and therefore whole solves — are
    bit-reproducible run-to-run, matching the fixed PRNGKey used by the
    in-kernel padding variant below."""
    rng = np.random.default_rng(0xB04D)
    if config.on_host(q_mat):
        qm = np.asarray(q_mat)
        g = rng.standard_normal((qm.shape[0], k)).astype(qm.dtype)
        g = g - qm @ (qm.T @ g)
        q2, _ = np.linalg.qr(g, mode="reduced")
        return q2
    g = jnp.asarray(rng.standard_normal((q_mat.shape[0], k)),
                    dtype=q_mat.dtype)
    g = g - q_mat @ (q_mat.T @ g)
    q2, _ = jnp.linalg.qr(g, mode="reduced")
    return q2


def pad_bond_factors(left: jax.Array, right: jax.Array, r: int, orth: str = "left"):
    """Pad a bond factor pair (left: (..., r), right: (r, ...)) to the
    configured rank bucket (SURVEY.md §7 padded-rank design).

    The orthogonal factor (``orth``: 'left' = left factor's last axis
    carries orthonormal columns, 'right' = right factor's first axis
    carries orthonormal rows) is extended with an orthonormal complement
    so that downstream Galerkin projections stay non-singular (the local
    KKT solvers divide by the projected identity's diagonal); the other
    factor is zero-padded, which keeps the represented product exact.
    """
    rb = config.bucket_rank(r)
    if orth == "left":
        m = int(np.prod(left.shape[:-1]))
    else:
        m = int(np.prod(right.shape[1:]))
    rb = min(rb, m)
    if rb <= r:
        return left, right, r
    k = rb - r
    host = config.on_host(left, right)
    xp = np if host else jnp
    if host:
        left, right = np.asarray(left), np.asarray(right)
    if orth == "left":
        lmat = left.reshape(-1, r)
        lmat = xp.concatenate([lmat, _orthonormal_complement(lmat, k)], axis=1)
        left = lmat.reshape(*left.shape[:-1], rb)
        right = xp.pad(right, [(0, k)] + [(0, 0)] * (right.ndim - 1))
    else:
        rmat = right.reshape(r, -1)
        comp = _orthonormal_complement(rmat.T, k).T
        right = xp.concatenate([rmat, comp], axis=0).reshape(rb, *right.shape[1:])
        left = xp.pad(left, [(0, 0)] * (left.ndim - 1) + [(0, k)])
    return left, right, rb


def _qr_econ(mat: jax.Array):
    if config.on_host(mat):
        return np.linalg.qr(np.asarray(mat), mode="reduced")
    return jnp.linalg.qr(mat, mode="reduced")


def _host_svd(mat: np.ndarray):
    """LAPACK SVD on the host (gesdd, gesvd fallback — the reference pins
    gesvd for robustness, cy_src/tt_ops_cy.pyx:205-211)."""
    try:
        return np.linalg.svd(mat, full_matrices=False)
    except np.linalg.LinAlgError:
        import scipy.linalg as sla

        return sla.svd(mat, full_matrices=False, lapack_driver="gesvd")


def _svd_econ(mat: jax.Array):
    if config.on_host(mat):
        return _host_svd(np.asarray(mat))
    return safe_svd(mat, full_matrices=False)


# Fused per-bond kernels (cached per shape signature): one compiled kernel
# per RL-orthogonalisation step and per truncation-application step instead
# of a chain of eager reshape/QR/matmul dispatches.

from functools import partial as _partial


@jax.jit
def _rl_bond_kernel(core, prev):
    """QR of the transposed right unfolding + absorb R into the left
    neighbour.  Takes and returns FULL-shaped cores: the reshapes live
    inside the jit so the sweep issues one program per bond signature
    instead of a chain of eager reshape dispatches."""
    r = core.shape[0]
    q, rm = jnp.linalg.qr(core.reshape(r, -1).T, mode="reduced")
    k = q.shape[1]
    q_core = q.T.reshape(k, *core.shape[1:])
    prev_new = (prev.reshape(-1, r) @ rm.T).reshape(*prev.shape[:-1], k)
    return q_core, prev_new


@jax.jit
def _bond_svd(core):
    """Economy SVD of the left unfolding (rows = left bond x physical)."""
    return safe_svd(
        core.reshape(-1, core.shape[-1]), full_matrices=False
    )


@_partial(jax.jit, static_argnums=(4, 5))
def _trunc_apply_kernel(u, s, v_t, next_core, next_rank, padded_rank):
    """Apply a rank-``next_rank`` truncation: slice U, fold S*Vt into the
    right (full-shaped) neighbour, and — when the rank bucket demands it —
    pad the bond to ``padded_rank`` in-kernel: U gains an orthonormal
    complement (so downstream Galerkin projections stay non-singular), the
    folded factor gains zero rows (the represented tensor is unchanged)."""
    sv = s[:next_rank, None] * v_t[:next_rank, :]
    u_k = u[:, :next_rank]
    folded = sv @ next_core.reshape(next_core.shape[0], -1)
    if padded_rank > next_rank:
        k = padded_rank - next_rank
        g = jax.random.normal(jax.random.PRNGKey(0), (u.shape[0], k), u.dtype)
        g = g - u_k @ (u_k.T @ g)
        q2, _ = jnp.linalg.qr(g, mode="reduced")
        u_k = jnp.concatenate([u_k, q2], axis=1)
        folded = jnp.pad(folded, [(0, k), (0, 0)])
    folded = folded.reshape(padded_rank, *next_core.shape[1:])
    return u_k, folded


def _host_rl_orthogonalise(train_tt: TT) -> TT:
    """numpy twin of the RL sweep: the panels are microscopic and ragged,
    so LAPACK-on-host beats minting one XLA program per bond signature
    (config.py host-algebra rationale)."""
    out = [np.asarray(c) for c in train_tt]
    for i in range(len(out) - 1, 0, -1):
        core, prev = out[i], out[i - 1]
        r = core.shape[0]
        q, rm = np.linalg.qr(core.reshape(r, -1).T, mode="reduced")
        k = q.shape[1]
        out[i] = np.ascontiguousarray(q.T).reshape((k,) + core.shape[1:])
        out[i - 1] = (prev.reshape(-1, r) @ rm.T).reshape(
            prev.shape[:-1] + (k,)
        )
    return out


def tt_rl_orthogonalise(train_tt: TT) -> TT:
    """Right-to-left QR sweep: all cores except the first become
    right-orthogonal (cy_src/tt_ops_cy.pyx:132-159)."""
    dim = len(train_tt)
    if dim == 1:
        return list(train_tt)
    if config.on_host(*train_tt):
        return _host_rl_orthogonalise(train_tt)
    out = list(train_tt)
    for i in range(dim - 1, 0, -1):
        out[i], out[i - 1] = _rl_bond_kernel(out[i], out[i - 1])
    return out


def tt_lr_orthogonalise(train_tt: TT) -> TT:
    return tt_swap_all(tt_rl_orthogonalise(tt_swap_all(train_tt)))


def _truncation_sweep(
    train_tt: TT,
    eps: float,
    compensation: Optional[str] = None,
) -> tuple[TT, float]:
    """Left-to-right SVD truncation of an RL-orthogonal train.

    Returns the rounded train and the total discarded energy (sum over
    bonds of the squared norms of dropped singular values), which the
    PSD/mask-compensated variants feed back as an identity/mask shift.
    """
    dim = len(train_tt)
    out = list(train_tt)
    discarded = 0.0
    if config.on_host(*out):
        out = [np.asarray(c) for c in out]
        for idx in range(dim - 1):
            shape = out[idx].shape
            u, s, v_t = _host_svd(out[idx].reshape(-1, shape[-1]))
            next_rank = prune_singular_vals(s, eps)
            if compensation is not None and next_rank < s.size:
                tail = np.cumsum(np.abs(s[::-1]) ** 2)[::-1]
                discarded += float(tail[next_rank])
            padded = min(config.bucket_rank(next_rank), u.shape[0])
            u_k = u[:, :next_rank]
            folded = (s[:next_rank, None] * v_t[:next_rank, :]) @ out[
                idx + 1
            ].reshape(out[idx + 1].shape[0], -1)
            if padded > next_rank:
                k = padded - next_rank
                u_k = np.concatenate(
                    [u_k, _orthonormal_complement(u_k, k)], axis=1
                )
                folded = np.pad(folded, [(0, k), (0, 0)])
            out[idx + 1] = folded.reshape(
                (padded,) + out[idx + 1].shape[1:]
            )
            out[idx] = u_k.reshape(shape[:-1] + (padded,))
        return out, discarded
    for idx in range(dim - 1):
        shape = out[idx].shape
        u, s, v_t = _bond_svd(out[idx])
        s_host = np.asarray(s)
        next_rank = prune_singular_vals(s_host, eps)
        if compensation is not None and next_rank < s_host.size:
            tail = np.cumsum(np.abs(s_host[::-1]) ** 2)[::-1]
            discarded += float(tail[next_rank])
        # In-kernel bucket padding (capped by the unfolding's row count so
        # the padded columns can stay orthonormal).
        padded = min(config.bucket_rank(next_rank), u.shape[0])
        u_k, out[idx + 1] = _trunc_apply_kernel(
            u, s, v_t, out[idx + 1], next_rank, padded
        )
        out[idx] = u_k.reshape(*shape[:-1], padded)
    return out, discarded


def tt_rank_reduce(train_tt: TT, eps: float = 1e-18) -> TT:
    """Round a TT to the smallest ranks with total error <= eps."""
    eps = config.clamp_eps(eps)
    dim = len(train_tt)
    ranks = [1] + tt_ranks(train_tt) + [1]
    if dim == 1 or all(r == 1 for r in ranks):
        return list(train_tt)
    bond_eps = eps / np.sqrt(dim - 1)
    out = tt_rl_orthogonalise(list(train_tt))
    out, _ = _truncation_sweep(out, bond_eps)
    return out


def _compensated_rank_reduce(train_tt: TT, eps: float) -> tuple[TT, float]:
    dim = len(train_tt)
    ranks = [1] + tt_ranks(train_tt) + [1]
    if dim == 1 or all(r == 1 for r in ranks):
        return list(train_tt), 0.0
    bond_eps = (eps / 2.0) / np.sqrt(dim - 1)
    out = tt_rl_orthogonalise(list(train_tt))
    out, discarded = _truncation_sweep(out, bond_eps, compensation="track")
    factor = float(discarded) ** (1.0 / (2 * dim)) if discarded > 0 else 0.0
    return out, factor


def tt_psd_rank_reduce(train_tt: TT, eps: float = 1e-18,
                       return_shift: bool = False):
    """PSD-preserving rounding: compensates the discarded energy with a
    multiple of the identity (cy_src/tt_ops_cy.pyx:262-325).

    With ``return_shift`` also returns the magnitude of the identity
    shift actually added, ``sqrt(discarded energy)`` — the quantity that
    injects ``shift * tr(Z)`` of complementary slackness per iterate
    update and floors the achievable absolute gap at large d."""
    eps = config.clamp_eps(eps)
    out, factor = _compensated_rank_reduce(train_tt, eps)
    shift = factor ** len(out)
    if not (len(out) == 1 and factor == 0.0):
        n = out[0].shape[1]
        xp = np if config.on_host(*out) else jnp
        eye_core = factor * xp.eye(n, dtype=config.dtype()).reshape(
            1, n, n, 1
        )
        out = tt_add(out, [eye_core] * len(out))
    if return_shift:
        return out, shift
    return out


def tt_mask_rank_reduce(train_tt: TT, mask_tt: TT, eps: float = 1e-18,
                        return_shift: bool = False):
    """Mask-preserving rounding: compensation along ``mask_tt`` instead of
    the identity (cy_src/tt_ops_cy.pyx:329-388)."""
    eps = config.clamp_eps(eps)
    out, factor = _compensated_rank_reduce(train_tt, eps)
    out = tt_add(out, [factor * c for c in mask_tt])
    if return_shift:
        return out, factor ** len(out)
    return out


def tt_rank_retraction(train_tt: TT, upper_ranks: List[int]) -> TT:
    """Truncate bond ranks to hard caps (src/tt_ops.py:132-152)."""
    out = tt_rl_orthogonalise(list(train_tt))
    rank = 1
    for idx, upper in enumerate(upper_ranks):
        shape = out[idx].shape
        next_shape = out[idx + 1].shape
        mat = out[idx].reshape(rank * int(np.prod(shape[1:-1])), -1)
        u, s, v_t = _svd_econ(mat)
        next_rank = min(int(upper), int(s.shape[0]))
        next_rank = max(next_rank, 1)
        out[idx] = u[:, :next_rank].reshape(rank, *shape[1:-1], next_rank)
        sv = s[:next_rank, None] * v_t[:next_rank, :]
        out[idx + 1] = (sv @ out[idx + 1].reshape(next_shape[0], -1)).reshape(
            next_rank, *next_shape[1:-1], -1
        )
        rank = next_rank
    return out


def truncated_svd(mat: jax.Array, trunc_rank: int):
    """Rank-``trunc_rank`` factors (U, S·Vt) of ``mat``
    (src/tt_als.py:269-274)."""
    u, s, v_t = _svd_econ(mat)
    u = u[:, :trunc_rank]
    sv = s[:trunc_rank, None] * v_t[:trunc_rank]
    return u, sv


def add_kick_rank(u: jax.Array, v: jax.Array, r_add: int = 2, rng=None):
    """Append ``r_add`` random directions to U and re-orthogonalise;
    rank-adaptive enrichment (cy_src/tt_ops_cy.pyx:559-578)."""
    rng = rng or np.random
    old_r = u.shape[1]
    xp = np if config.on_host(u, v) else jnp
    kick = xp.asarray(rng.randn(u.shape[0], r_add), dtype=u.dtype)
    q, r_mat = _qr_econ(xp.concatenate((xp.asarray(u), kick), axis=1))
    v_new = r_mat[:, :old_r] @ xp.asarray(v)
    return q, v_new, int(q.shape[1])


def add_kick_rank_rev(u: jax.Array, v: jax.Array, r_add: int = 2, rng=None):
    """Row-side enrichment via RQ (src/tt_als.py:1048-1053).

    jax has no RQ; we realise it with QR on the reversed matrix:
    RQ(A) == flip(QR(flip(A)^T)) up to the same factorisation identity.
    """
    rng = rng or np.random
    old_r = v.shape[0]
    xp = np if config.on_host(u, v) else jnp
    kick = xp.asarray(rng.randn(r_add, v.shape[-1]), dtype=v.dtype)
    stacked = xp.concatenate((xp.asarray(v), kick), axis=0)
    # RQ via QR of the anti-transpose: A = R Q with R upper-triangular.
    a_rev = stacked[::-1, ::-1].T
    q_r, r_r = _qr_econ(a_rev)
    q_new = q_r.T[::-1, ::-1]
    r_new = r_r.T[::-1, ::-1]
    u_new = xp.asarray(u) @ r_new[:old_r]
    return u_new, q_new, int(q_new.shape[0])
