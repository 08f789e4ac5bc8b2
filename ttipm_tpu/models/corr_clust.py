"""Correlation-clustering SDP in TT form: similarity graph + dissimilarity
Laplacian objective, diag(X)=1, entrywise inequality X >= -beta on the
graph support (the inequality-path stress test).

Parity: /root/reference/psd_system/corr_clust/corr_clust.py:11-38.
"""

from __future__ import annotations

import numpy as np

from ttipm_tpu.ops.random import tt_random_graph
from ttipm_tpu.ops.rounding import tt_rank_reduce
from ttipm_tpu.ops.products import tt_fast_hadamard, tt_fast_matrix_vec_mul
from ttipm_tpu.ops.tt import (
    tt_add,
    tt_diag,
    tt_diag_op,
    tt_identity,
    tt_normalise,
    tt_one_matrix,
    tt_reshape,
    tt_sub,
)
from ttipm_tpu.models.maxcut import tt_diag_constraint_op

import jax.numpy as jnp

from ttipm_tpu import config

__all__ = ["create_problem", "tt_obj_matrix_and_ineq_mask"]


def tt_obj_matrix_and_ineq_mask(rank: int, dim: int):
    actual_graph = tt_rank_reduce(tt_random_graph(dim, rank), 1e-10)
    mask_graph = tt_rank_reduce(tt_random_graph(dim, 1), 1e-10)
    sim_graph = tt_rank_reduce(tt_fast_hadamard(actual_graph, mask_graph, 1e-12), 1e-10)
    disim_graph = tt_rank_reduce(
        tt_fast_hadamard(actual_graph, tt_sub(tt_one_matrix(dim), mask_graph), 1e-12),
        1e-10,
    )
    ones_vec = [jnp.ones((1, 2, 1), dtype=config.dtype())] * dim
    disim_laplacian = tt_sub(
        tt_diag(tt_fast_matrix_vec_mul(disim_graph, ones_vec, 1e-12)), disim_graph
    )
    obj_tt = tt_rank_reduce(tt_add(sim_graph, disim_laplacian), 1e-10)
    return obj_tt, actual_graph


def create_problem(dim: int, rank: int):
    scale = np.sqrt(dim)
    obj_tt, ineq_mask = tt_obj_matrix_and_ineq_mask(rank, dim)
    L_tt, bias_tt = tt_diag_constraint_op(dim)
    lag_y = tt_sub(tt_one_matrix(dim), tt_identity(dim))
    lag_t = tt_sub(tt_one_matrix(dim), ineq_mask)
    lag_maps = {"y": tt_diag_op(lag_y), "t": tt_diag_op(lag_t)}
    return (
        tt_reshape(tt_normalise(obj_tt, radius=scale), (4,)),
        L_tt,
        tt_reshape(tt_normalise(bias_tt, radius=scale), (4,)),
        ineq_mask,
        lag_maps,
    )
