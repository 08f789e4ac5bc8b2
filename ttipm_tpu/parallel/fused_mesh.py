"""Mesh-parallel execution of the PRODUCTION fused AMEn KKT solver.

Two mesh axes (SURVEY.md §2.3, the PETSc COMM_WORLD slot of
/root/reference/src/tt_ipm.py:120,142-148):

  * ``seeds`` — independent Newton systems (instances/seeds) are stacked
    on a leading batch axis and solved in lockstep by ``jax.vmap`` of the
    SAME whole-sweep programs the single-instance solver runs
    (solvers/fused.py::_sweep_program).  No algorithmic fork: one code
    path, batched and sharded.
  * ``kkt`` — bond/rank axes of the stacked cores are annotated with a
    ``kkt`` sharding, and XLA's SPMD partitioner propagates the sharding
    through the sweep's einsum chains, inserting ICI collectives for the
    dense local assembly contractions.  (Rank bucketing keeps these axes
    multiples of 4, so they divide small kkt groups evenly.)

Batched termination is lockstep: every instance sweeps until the WORST
instance converges (masked no-op sweeps would save nothing — the sweep is
one fused program either way).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ttipm_tpu.solvers import fused as _fused

__all__ = ["make_mesh", "tt_block_amen_fused_batch"]


def make_mesh(n_devices: int, kkt: int = 1) -> Mesh:
    """(seeds × kkt) mesh over the first ``n_devices`` devices."""
    devices = np.array(jax.devices()[:n_devices])
    while n_devices % kkt != 0:
        kkt -= 1
    return Mesh(devices.reshape(n_devices // kkt, kkt),
                axis_names=("seeds", "kkt"))


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _unstack_tree(tree, i):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


@partial(jax.jit, static_argnames=("ineq", "caps", "kick", "solve",
                                   "direction"))
def _sweep_program_batch(A, b, x_cores, z_cores, XAX, Xb, ZAX, Zb,
                         ineq: bool, caps: tuple, kick: int, solve: bool,
                         direction: int):
    fn = partial(
        _fused._sweep_program.__wrapped__,  # undecorated: vmap traces it
        ineq=ineq, caps=caps, kick=kick, solve=solve, direction=direction,
    )
    return jax.vmap(fn)(A, b, x_cores, z_cores, XAX, Xb, ZAX, Zb)


def _seed_sharding(mesh: Mesh, kkt_axis: bool):
    """Leaf -> NamedSharding: batch axis over 'seeds'; optionally the last
    (bond/rank) axis over 'kkt' when it divides evenly."""
    kkt_size = mesh.shape.get("kkt", 1)

    def shard(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return leaf
        spec = ["seeds"] + [None] * (leaf.ndim - 1)
        if (kkt_axis and kkt_size > 1 and leaf.ndim >= 2
                and leaf.shape[-1] % kkt_size == 0 and leaf.shape[-1] > 1):
            spec[-1] = "kkt"
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    return shard


def tt_block_amen_fused_batch(
    block_As: Sequence,
    block_bs: Sequence,
    R: int,
    ineq: bool,
    mesh: Optional[Mesh] = None,
    term_tol: float = 1e-3,
    eps: float = 1e-12,
    nswp: int = 22,
    kick_rank: int = 2,
    seed: Optional[int] = 0,
    shard_kkt: bool = True,
    verbose: bool = False,
) -> Tuple[List[list], np.ndarray]:
    """Solve a batch of structurally-identical KKT systems in lockstep.

    Same per-instance semantics as solvers/fused.py::tt_block_amen_fused
    (fixed rank R, AMEn enrichment, never-regress local guard); the batch
    axis is sharded over ``mesh``'s 'seeds' axis and bond axes over 'kkt'.
    Returns (list of per-instance x_cores, per-instance final residuals).
    """
    nb = len(block_As)
    assert nb == len(block_bs) and nb > 0
    bs = _fused._nrows(ineq)
    d = len(next(iter(block_bs[0].values())))
    rng = np.random.RandomState(seed)

    preps = []
    for A_blk, b_blk in zip(block_As, block_bs):
        A = _fused._prep_operator(A_blk, d, ineq)
        b = _fused._prep_rhs(b_blk, d, ineq)
        preps.append((A, b))
    shapes0 = jax.tree_util.tree_map(lambda x: x.shape, preps[0])
    for p in preps[1:]:
        if jax.tree_util.tree_map(lambda x: x.shape, p) != shapes0:
            raise ValueError(
                "batched fused solve needs structurally identical systems "
                "(same d, block ranks after bucketing); got a mismatch"
            )

    caps_bck = _fused._bond_caps(d, R, bs, +1)
    caps_fwd = _fused._bond_caps(d, R, bs, -1)
    direction = 1
    block_pos = d - 1

    xs, zs = [], []
    for _ in range(nb):
        xs.append(_fused._prep_x0(None, d, bs, caps_fwd, direction, rng))
        zs.append(_fused._prep_z0(d, bs, kick_rank, block_pos, rng))

    A_b = _stack_trees([p[0] for p in preps])
    b_b = _stack_trees([p[1] for p in preps])
    x_b = _stack_trees([tuple(x) for x in xs])
    z_b = _stack_trees([tuple(z) for z in zs])

    phis = []
    for p in preps:
        pA0, pz0, pb0 = _fused._boundary_phis(p[0], p[1], ineq)
        phis.append((
            tuple([pA0] + [None] * (d - 1) + [dict(pA0)]),
            tuple([pb0] + [None] * (d - 1) + [list(pb0)]),
            tuple([pz0] + [None] * (d - 1) + [dict(pz0)]),
            tuple([pb0] + [None] * (d - 1) + [list(pb0)]),
        ))
    XAX = _stack_trees([p[0] for p in phis])
    Xb = _stack_trees([p[1] for p in phis])
    ZAX = _stack_trees([p[2] for p in phis])
    Zb = _stack_trees([p[3] for p in phis])

    if mesh is not None:
        shard = _seed_sharding(mesh, kkt_axis=shard_kkt)
        A_b, b_b, x_b, z_b, XAX, Xb, ZAX, Zb = jax.tree_util.tree_map(
            shard, (A_b, b_b, x_b, z_b, XAX, Xb, ZAX, Zb)
        )

    last = False
    final_res = np.full(nb, np.inf)
    for swp in range(nswp + 1):
        solve = (swp > 0) and not last
        caps = tuple(caps_bck if direction > 0 else caps_fwd)
        (x_b, z_b, XAX, Xb, ZAX, Zb, res_d, dx_d) = _sweep_program_batch(
            A_b, b_b, x_b, z_b, XAX, Xb, ZAX, Zb,
            ineq=ineq, caps=caps, kick=kick_rank, solve=solve,
            direction=direction,
        )
        if last:
            break
        if solve:
            res = np.asarray(res_d)
            dx = np.asarray(dx_d)
            worst_res = float(res.max())
            worst_dx = float(dx.max())
        else:
            worst_res = worst_dx = np.inf
        if worst_res < term_tol or worst_dx < eps or swp == nswp - 2:
            last = True
            final_res = np.asarray(res_d) if solve else final_res
        if verbose:
            print(f"\t[fused-batch R={R}] sweep {swp}: worst res "
                  f"{worst_res:.3e}", flush=True)
        direction *= -1

    x_out = [list(_unstack_tree(x_b, i)) for i in range(nb)]
    return x_out, final_res
