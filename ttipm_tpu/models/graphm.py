"""Graph-matching QAP relaxation SDP in TT form.

The lifted variable has block structure [[Q, P, 0], [P^T, 1, 0], [0, 0, I]]
over ``2n+1`` TT cores; five constraint operators (partial trace,
partial-J-trace, diagonal block sums, Q-P coupling, padding) are summed
into a single TT operator, with an inequality mask on the off-diagonal
Q/P blocks and a hand-built Lagrange complement map.

Parity: /root/reference/psd_system/graphm/graphm.py:14-233 (constraint
numbering IV-IX follows the docstring there).
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
    tt_diag,
    tt_diag_op,
    tt_identity,
    tt_normalise,
    tt_one_matrix,
    tt_reshape,
    tt_split_bonds,
    tt_sub,
    tt_sum,
    tt_tril_one_matrix,
    tt_triu_one_matrix,
)

__all__ = ["create_problem"]


def _q_prefix():
    return [E(0, 0), E(0, 0)]


def _zeros_like_split(c):
    return jnp.zeros((c.shape[0], 2, 2, c.shape[-1]), dtype=config.dtype())


def tt_partial_trace_op(block_size: int, dim: int):
    """Constraint IV (graphm.py:14-18)."""
    op_tt = tt_diag(tt_split_bonds(tt_sub(tt_one_matrix(dim - block_size),
                                          tt_identity(dim - block_size))))
    block_op = tt_diag(tt_split_bonds(tt_identity(block_size)))
    return tt_reshape(tt_rank_reduce(_q_prefix() + op_tt + block_op), (4, 4))


def tt_partial_J_trace_op(block_size: int, dim: int):
    """Constraint V (graphm.py:23-48)."""
    matrix_tt = tt_sub(tt_identity(dim - block_size),
                       [E(0, 0)] * (dim - block_size))
    block_op_0 = []
    for c in tt_split_bonds(tt_identity(block_size)):
        core = _zeros_like_split(c).at[:, 1].set(c)
        block_op_0.append(core)
    op_tt_0 = tt_diag(tt_split_bonds(matrix_tt)) + block_op_0

    matrix_tt = tt_sub(tt_triu_one_matrix(dim - block_size),
                       tt_identity(dim - block_size))
    block_op_1 = []
    for i, c in enumerate(tt_split_bonds(tt_one_matrix(block_size))):
        core = _zeros_like_split(c).at[:, (i + 1) % 2].set(c)
        block_op_1.append(core)
    op_tt_1 = tt_diag(tt_split_bonds(matrix_tt)) + block_op_1

    matrix_tt = tt_sub(tt_tril_one_matrix(dim - block_size),
                       tt_identity(dim - block_size))
    block_op_2 = []
    for i, c in enumerate(tt_split_bonds(tt_one_matrix(block_size))):
        core = _zeros_like_split(c).at[:, i % 2].set(c)
        block_op_2.append(core)
    op_tt_2 = tt_diag(tt_split_bonds(matrix_tt)) + block_op_2

    return tt_reshape(
        tt_rank_reduce(_q_prefix() + tt_sum(op_tt_0, op_tt_1, op_tt_2)), (4, 4)
    )


def tt_diag_block_sum_linear_op(block_size: int, dim: int):
    """Constraint VI (graphm.py:53-67)."""
    op_tt = []
    for c in tt_split_bonds(tt_identity(dim - block_size)):
        core = _zeros_like_split(c).at[:, 0].set(c)
        op_tt.append(core)
    op_tt = op_tt + tt_diag(tt_split_bonds(tt_identity(block_size)))

    op_tt_2 = tt_diag(tt_split_bonds(tt_identity(dim - block_size)))
    op_tt_2 = op_tt_2 + tt_diag(
        tt_split_bonds(tt_sub(tt_one_matrix(block_size), tt_identity(block_size)))
    )
    return tt_reshape(tt_rank_reduce(_q_prefix() + tt_add(op_tt, op_tt_2)), (4, 4))


def tt_Q_m_P_op(dim: int):
    """Constraint VII: couples Q-row sums with the P column
    (graphm.py:72-89)."""
    Q_part = [E(0, 0), E(1, 0)]
    for _ in range(dim):
        core_1 = jnp.concatenate((E(0, 0), E(1, 1)), axis=-1)
        core_2 = jnp.concatenate((E(0, 0), E(0, 1)), axis=0)
        Q_part.extend([core_1, core_2])
    P_part = [-E(0, 0), E(1, 1)] + tt_diag(
        tt_split_bonds([E(0, 0) + E(1, 0) for _ in range(dim)])
    )
    part_1 = tt_add(Q_part, P_part)

    Q_part_2 = [E(1, 0), E(0, 0)]
    for _ in range(dim):
        core_1 = jnp.concatenate((E(0, 0), E(0, 1)), axis=-1)
        core_2 = jnp.concatenate((E(0, 0), E(1, 1)), axis=0)
        Q_part_2.extend([core_1, core_2])
    P_part_2 = [-E(1, 1), E(0, 0)] + tt_diag(
        tt_split_bonds([E(0, 0) + E(0, 1) for _ in range(dim)])
    )
    part_2 = tt_add(Q_part_2, P_part_2)
    return tt_reshape(tt_add(part_2, part_1), (4, 4))


def tt_padding_op(dim: int):
    """Constraint IX: pins the identity padding block (graphm.py:99-104)."""
    matrix_tt = [E(0, 1) + E(1, 0) + E(1, 1)] + tt_one_matrix(dim)
    matrix_tt = tt_sub(matrix_tt, [E(0, 1)] + [E(0, 0) + E(1, 0)] * dim)
    matrix_tt = tt_sub(matrix_tt, [E(1, 0)] + [E(0, 0) + E(0, 1)] * dim)
    basis = tt_diag(tt_split_bonds(matrix_tt))
    return tt_reshape(tt_rank_reduce(basis), (4, 4))


def tt_obj_matrix(rank: int, dim: int):
    G_A = tt_random_graph(dim, rank)
    G_B = tt_random_graph(dim, rank)
    return [E(0, 0)] + G_B + G_A


def create_problem(n: int, max_rank: int):
    C_tt = tt_obj_matrix(max_rank, n)

    # IV — partial trace
    L_op_tt = tt_partial_trace_op(n, 2 * n)

    # V — partial-J trace with its bias
    partial_tr_J_op = tt_partial_J_trace_op(n, 2 * n)
    bias_J = [E(0, 0)] + tt_sub(tt_tril_one_matrix(n), tt_identity(n)) + [E(0, 1)] * n
    bias_J = tt_add(
        bias_J,
        [E(0, 0)] + tt_sub(tt_triu_one_matrix(n), tt_identity(n)) + [E(1, 0)] * n,
    )
    bias_J = tt_rank_reduce(
        tt_add(
            bias_J,
            [E(0, 0)] + tt_sub(tt_identity(n), [E(0, 0)] * n) + [E(1, 1)] * n,
        )
    )
    L_op_tt = tt_rank_reduce(tt_add(L_op_tt, partial_tr_J_op), 1e-12)
    eq_bias_tt = bias_J

    # VI — diagonal block sums
    diag_block_sum_op = tt_diag_block_sum_linear_op(n, 2 * n)
    diag_block_sum_bias = [E(0, 0)] * (n + 1) + tt_identity(n)
    L_op_tt = tt_rank_reduce(tt_add(L_op_tt, diag_block_sum_op), 1e-12)
    eq_bias_tt = tt_rank_reduce(tt_add(eq_bias_tt, diag_block_sum_bias))

    # VII — Q-P coupling
    L_op_tt = tt_rank_reduce(tt_add(L_op_tt, tt_Q_m_P_op(2 * n)), 1e-12)

    # X — inequality mask on the off-diagonal Q/P blocks
    ineq_mask = tt_rank_reduce(
        [E(0, 0)]
        + tt_sub(tt_one_matrix(n), tt_identity(n))
        + tt_sub(tt_one_matrix(n), tt_identity(n))
    )

    # Lagrange complement map for Y (graphm.py:202-216)
    pad = [1 - E(0, 0)] + tt_one_matrix(2 * n)
    pad = tt_sub(pad, [E(0, 1)] + [E(0, 0) + E(1, 0)] * (2 * n))
    pad = tt_sub(pad, [E(1, 0)] + [E(0, 0) + E(0, 1)] * (2 * n))
    lag_map_y = tt_sub(
        tt_one_matrix(2 * n + 1),
        tt_sum(
            pad,
            [E(0, 1)] + [E(0, 0) + E(1, 0)] * (2 * n),
            [E(1, 0)] + [E(0, 0) + E(0, 1)] * (2 * n),
            [E(0, 0)] + [E(0, 0)] * n + tt_identity(n),
            [E(0, 0)] + tt_identity(n) + tt_sub(tt_one_matrix(n), tt_identity(n)),
            bias_J,
            [E(0, 0)] + tt_sub(tt_one_matrix(n), tt_identity(n)) + tt_identity(n),
        ),
    )
    lag_map_t = tt_sub(tt_one_matrix(2 * n + 1), ineq_mask)
    lag_maps = {"y": tt_diag_op(lag_map_y), "t": tt_diag_op(lag_map_t)}

    scale = max(2 ** (2 * n + 1 - 7), 1)
    eq_bias_tt = tt_normalise(eq_bias_tt, radius=scale)

    # IX — padding operator and its bias
    padding_op = tt_padding_op(2 * n)
    padding_bias = [E(1, 1)] + tt_identity(2 * n)
    L_op_tt = tt_rank_reduce(tt_add(L_op_tt, padding_op), 1e-12)
    eq_bias_tt = tt_rank_reduce(tt_add(eq_bias_tt, padding_bias))

    return tt_normalise(C_tt, radius=scale), L_op_tt, eq_bias_tt, ineq_mask, lag_maps
