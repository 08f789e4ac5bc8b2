"""Randomised TT tools: sketching, randomised orthogonalisation and the
generalised Nystrom rank reduction.

Parity: /root/reference/src/tt_ops.py:51-101, 232-300.  These support
rank-adaptive experimentation around the solver (the solve path itself
uses deterministic roundings); ported for capability completeness.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ttipm_tpu.ops.jacobi import safe_svd

from ttipm_tpu import config
from ttipm_tpu.ops.tt import TT, tt_swap_all

__all__ = [
    "tt_rl_contraction",
    "tt_lr_contraction",
    "tt_lr_random_orthogonalise",
    "tt_rl_random_orthogonalise",
    "tt_generalised_nystroem",
    "tt_sketch",
    "tt_sketch_like",
]


def tt_rl_contraction(train_1_tt: TT, train_2_tt: TT) -> List[jax.Array]:
    """Right-to-left partial contractions of two trains
    (src/tt_ops.py:51-58)."""
    new_cores = [
        train_1_tt[-1].reshape(train_1_tt[-1].shape[0], -1)
        @ train_2_tt[-1].reshape(train_2_tt[-1].shape[0], -1).T
    ]
    for core_1, core_2 in zip(train_1_tt[-2:0:-1], train_2_tt[-2:0:-1]):
        core_w = new_cores[-1]
        core_z = core_1.reshape(-1, core_w.shape[0]) @ core_w
        new_cores.append(
            core_z.reshape(core_1.shape[0], -1)
            @ core_2.reshape(core_2.shape[0], -1).T
        )
    return new_cores[::-1]


def tt_lr_contraction(train_1_tt: TT, train_2_tt: TT) -> List[jax.Array]:
    swapped = tt_rl_contraction(tt_swap_all(train_1_tt), tt_swap_all(train_2_tt))
    return [jnp.swapaxes(c, 0, -1) for c in reversed(swapped)]


def tt_sketch(shape, target_ranks: List[int]) -> TT:
    """Gaussian sketch train of given ranks (src/tt_ops.py:240-244)."""
    return [
        jnp.asarray(
            np.random.randn(l_n, *shape, l_np1) / (l_n * int(np.prod(shape)) * l_np1),
            dtype=config.dtype(),
        )
        for l_n, l_np1 in zip(target_ranks[:-1], target_ranks[1:])
    ]


def tt_sketch_like(train_tt: TT, target_ranks: List[int]) -> TT:
    """Sketch with the physical shapes of an existing train
    (src/tt_ops.py:232-237)."""
    return [
        jnp.asarray(
            np.random.randn(l_n, *train_tt[i].shape[1:-1], l_np1)
            / (l_n * int(np.prod(train_tt[i].shape[1:-1])) * l_np1),
            dtype=config.dtype(),
        )
        for i, (l_n, l_np1) in enumerate(zip(target_ranks[:-1], target_ranks[1:]))
    ]


def _lr_random_orthogonalise(train_tt: TT, gaussian_tt: TT) -> TT:
    """Sketched left-to-right orthogonalisation (src/tt_ops.py:89-101)."""
    out = list(train_tt)
    contractions = tt_rl_contraction(out, gaussian_tt)
    for i, core_w in enumerate(contractions):
        shape_i1 = out[i + 1].shape
        core_z = out[i].reshape(-1, shape_i1[0])
        core_y = core_z @ core_w
        q, _ = jnp.linalg.qr(core_y, mode="reduced")
        out[i] = q.reshape(*out[i].shape[:-1], -1)
        core_m = q.T @ core_z
        out[i + 1] = (core_m @ out[i + 1].reshape(shape_i1[0], -1)).reshape(
            -1, *shape_i1[1:]
        )
    return out


def tt_lr_random_orthogonalise(train_tt: TT, target_ranks: List[int]) -> TT:
    """Randomised LR orthogonalisation to target ranks
    (src/tt_ops.py:68-72)."""
    from ttipm_tpu.ops.random import tt_random_gaussian

    if len(train_tt) <= 1:
        return list(train_tt)
    gaussian = tt_random_gaussian(target_ranks, tuple(train_tt[0].shape[1:-1]))
    return _lr_random_orthogonalise(list(train_tt), gaussian)


def tt_rl_random_orthogonalise(train_tt: TT, target_ranks: List[int]) -> TT:
    """Randomised RL orthogonalisation (src/tt_ops.py:75-80)."""
    from ttipm_tpu.ops.random import tt_random_gaussian

    if len(train_tt) <= 1:
        return list(train_tt)
    gaussian = tt_swap_all(
        tt_random_gaussian(target_ranks, tuple(train_tt[0].shape[1:-1]))
    )
    swapped = _lr_random_orthogonalise(tt_swap_all(train_tt), gaussian)
    return tt_swap_all(swapped)


def tt_generalised_nystroem(train_tt: TT, target_ranks: List[int]) -> TT:
    """Two-sided sketched (generalised Nystrom) rank reduction
    (src/tt_ops.py:273-300)."""
    from ttipm_tpu.ops.random import tt_random_gaussian

    if len(train_tt) <= 1:
        return list(train_tt)
    out = list(train_tt)
    shape = tuple(out[0].shape[1:-1])
    g1 = tt_random_gaussian(target_ranks, shape)
    g2 = tt_random_gaussian([r + 1 for r in target_ranks], shape)
    lr = tt_lr_contraction(out, g1)
    rl = tt_rl_contraction(out, g2)
    Ls, Rs = [], []
    for W_L, W_R in zip(lr, rl):
        u, s, v_t = safe_svd(W_L @ W_R, full_matrices=False)
        root_s_inv = jnp.diag(1.0 / jnp.sqrt(s))
        Ls.append(W_R @ v_t.T @ root_s_inv)
        Rs.append(root_s_inv @ u.T @ W_L)
    out[0] = (out[0].reshape(-1, out[0].shape[-1]) @ Ls[0]).reshape(
        *out[0].shape[:-1], -1
    )
    for i in range(1, len(out) - 1):
        folded = (out[i].reshape(-1, out[i].shape[-1]) @ Ls[i]).reshape(
            out[i].shape[0], -1
        )
        out[i] = (Rs[i - 1] @ folded).reshape(
            out[i - 1].shape[-1], *out[i].shape[1:-1], -1
        )
    out[-1] = (Rs[-1] @ out[-1].reshape(out[-1].shape[0], -1)).reshape(
        -1, *out[-1].shape[1:]
    )
    return out
