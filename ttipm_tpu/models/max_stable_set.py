"""Maximum-stable-set (Lovász theta-like) SDP in TT form: all-ones
objective, trace(X)=1 plus entrywise zeros on the graph edges.

Parity: /root/reference/psd_system/max_stable_set/max_stable_set.py:11-41.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ttipm_tpu import config
from ttipm_tpu.ops.random import tt_random_graph
from ttipm_tpu.ops.rounding import tt_rank_reduce
from ttipm_tpu.ops.tt import (
    E,
    tt_add,
    tt_diag_op,
    tt_identity,
    tt_normalise,
    tt_one_matrix,
    tt_reshape,
    tt_split_bonds,
    tt_sub,
)

__all__ = ["create_problem", "tt_G_entrywise_mask_op", "tt_tr_constraint"]


def tt_G_entrywise_mask_op(G):
    """Operator selecting the entries of X on the edge support of G: each
    split-bond core of G becomes a 2x2 diagonal selector core
    (max_stable_set.py:11-19)."""
    vec_g = tt_split_bonds(list(G))
    basis = []
    for g_core in vec_g:
        core = jnp.zeros((g_core.shape[0], 2, 2, g_core.shape[-1]), dtype=config.dtype())
        core = core.at[:, 0, 0].set(g_core[:, 0])
        core = core.at[:, 1, 1].set(g_core[:, 1])
        basis.append(core)
    return tt_rank_reduce(tt_reshape(basis, (4, 4)))


def tt_tr_constraint(dim: int):
    """Trace operator as a TT map plus its rank-1 bias
    (max_stable_set.py:21-27)."""
    op = []
    for c in tt_split_bonds(tt_identity(dim)):
        core = jnp.zeros((c.shape[0], 2, 2, c.shape[-1]), dtype=config.dtype())
        core = core.at[:, 0].set(c)
        op.append(core)
    return tt_rank_reduce(tt_reshape(op, (4, 4))), [E(0, 0)] * dim


def create_problem(dim: int, rank: int):
    scale = np.sqrt(dim)
    G = tt_rank_reduce(tt_random_graph(dim, rank))
    obj_tt = tt_one_matrix(dim)
    L_tt, bias_tt = tt_tr_constraint(dim)
    L_tt = tt_rank_reduce(tt_add(L_tt, tt_G_entrywise_mask_op(G)))
    lag_y = tt_rank_reduce(
        tt_diag_op(tt_sub(tt_one_matrix(dim), tt_add(G, bias_tt)))
    )
    return (
        tt_reshape(tt_normalise(obj_tt, radius=scale), (4,)),
        L_tt,
        tt_reshape(tt_normalise(bias_tt, radius=scale), (4,)),
        lag_y,
    )
