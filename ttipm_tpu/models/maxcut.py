"""MaxCut SDP in TT form.

max <L_G/4, X>  s.t.  diag(X) = 1, X ⪰ 0 — generated as: objective = graph
Laplacian of a random TT graph, constraint operator = Diag embedding of the
identity, Lagrange-multiplier support map = off-diagonal mask.

Parity: /root/reference/psd_system/maxcut/maxcut.py:9-25.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ttipm_tpu import config
from ttipm_tpu.ops.random import tt_random_graph
from ttipm_tpu.ops.rounding import tt_rank_reduce
from ttipm_tpu.ops.products import tt_fast_matrix_vec_mul
from ttipm_tpu.ops.tt import (
    tt_diag,
    tt_diag_op,
    tt_identity,
    tt_normalise,
    tt_one_matrix,
    tt_reshape,
    tt_sub,
)

__all__ = ["create_problem", "tt_obj_matrix", "tt_diag_constraint_op"]


def tt_diag_constraint_op(dim: int):
    identity = tt_identity(dim)
    return tt_diag_op(identity), identity


def tt_obj_matrix(rank: int, dim: int):
    graph_tt = tt_rank_reduce(tt_random_graph(dim, rank))
    ones_vec = [jnp.ones((1, 2, 1), dtype=config.dtype())] * dim
    degrees = tt_fast_matrix_vec_mul(graph_tt, ones_vec, 1e-12)
    return tt_sub(tt_diag(degrees), graph_tt)


def create_problem(dim: int, rank: int):
    scale = np.sqrt(dim)
    obj_tt = tt_obj_matrix(rank, dim)
    L_tt, bias_tt = tt_diag_constraint_op(dim)
    lag_y = tt_diag_op(tt_sub(tt_one_matrix(dim), tt_identity(dim)))
    return (
        tt_reshape(tt_normalise(obj_tt, radius=scale), (4,)),
        L_tt,
        tt_reshape(tt_normalise(bias_tt, radius=scale), (4,)),
        lag_y,
    )
