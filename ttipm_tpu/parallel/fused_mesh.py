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

__all__ = ["make_mesh", "tt_block_amen_fused_batch",
           "tt_step_sizes_batch", "tt_newton_step_batch"]


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
    from ttipm_tpu.ops.kernels import panel_qr_disabled

    fn = partial(
        _fused._sweep_program.__wrapped__,  # undecorated: vmap traces it
        ineq=ineq, caps=caps, kick=kick, solve=solve, direction=direction,
    )
    # Pallas panel QR does not legalize under vmap (see kernels.py);
    # suspend it for this trace (no-op once compiled).
    with panel_qr_disabled():
        return jax.vmap(fn)(A, b, x_cores, z_cores, XAX, Xb, ZAX, Zb)


def _pad_batch(items: list, mesh: Optional[Mesh]) -> tuple[list, int]:
    """Replicate the last item up to a multiple of the mesh's seeds axis
    (sharded batch dims must divide it); returns (padded, original_len)."""
    nb = len(items)
    if mesh is None:
        return list(items), nb
    m = mesh.shape.get("seeds", 1)
    pad = (-nb) % m
    return list(items) + [items[-1]] * pad, nb


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
    x0s: Optional[Sequence] = None,
) -> Tuple[List[list], np.ndarray]:
    """Solve a batch of structurally-identical KKT systems in lockstep.

    Same per-instance semantics as solvers/fused.py::tt_block_amen_fused
    (fixed rank R, AMEn enrichment, never-regress local guard); the batch
    axis is sharded over ``mesh``'s 'seeds' axis and bond axes over 'kkt'.
    Returns (list of per-instance x_cores, per-instance final residuals).
    """
    assert len(block_As) == len(block_bs) and len(block_As) > 0
    block_As, nb = _pad_batch(list(block_As), mesh)
    block_bs, _ = _pad_batch(list(block_bs), mesh)
    if x0s is not None:
        x0s, _ = _pad_batch(list(x0s), mesh)
    bs = _fused._nrows(ineq)
    d = len(next(iter(block_bs[0].values())))
    rng = np.random.RandomState(seed)

    preps = []
    for A_blk, b_blk in zip(block_As, block_bs):
        # pad=True: the vmapped device program needs uniform shapes across
        # instances (the host engine's ragged prep must not leak in here)
        A = _fused._prep_operator(A_blk, d, ineq, pad=True)
        b = _fused._prep_rhs(b_blk, d, ineq, pad=True)
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
    for i in range(len(block_As)):
        x0_i = x0s[i] if x0s is not None else None
        xs.append(_fused._prep_x0(x0_i, d, bs, caps_fwd, direction, rng))
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
    final_res = np.full(len(block_As), np.inf)
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
    return x_out, final_res[:nb]


# ---------------------------------------------------------------------------
# Mesh-parallel step-size eigensolves: jax.vmap of the PRODUCTION
# whole-eigen device program (solvers/fused_eigen.py::_gen_eigen_program)
# over a batch of pencils, sharded on the 'seeds' axis.  One dispatch for
# ALL instances' step sizes.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("caps", "max_pairs"))
def _eigen_program_batch(A_b, D_b, x_b, alpha_b, tol, caps: tuple,
                         max_pairs: int):
    from ttipm_tpu.solvers import fused_eigen as _fe

    fn = partial(_fe._gen_eigen_program.__wrapped__, caps=caps,
                 max_pairs=max_pairs)
    return jax.vmap(fn, in_axes=(0, 0, 0, 0, None))(
        A_b, D_b, x_b, alpha_b, tol
    )


def tt_step_sizes_batch(
    pencils: Sequence[Tuple[list, list]],
    mesh: Optional[Mesh] = None,
    R: int = 8,
    tol: float = 1e-8,
    nswp: int = 10,
    x0s: Optional[Sequence] = None,
) -> Tuple[np.ndarray, List[list]]:
    """Largest ``alpha_i`` with ``A_i + alpha_i * Delta_i ⪰ 0`` for a batch
    of structurally-identical pencils (same d, n), with the same
    unconverged-solve penalty as the single-instance driver.  Returns
    (steps[nb], warm-start trains)."""
    from ttipm_tpu import config
    from ttipm_tpu.ops.tt import tt_normalise
    from ttipm_tpu.solvers import fused_eigen as _fe

    assert len(pencils) > 0
    pencils, nb = _pad_batch(list(pencils), mesh)
    if x0s is not None:
        x0s, _ = _pad_batch(list(x0s), mesh)
    d = len(pencils[0][0])
    n = pencils[0][0][0].shape[1]
    edt = config.eigen_dtype()

    def _common_ra(trains):
        if d == 1:
            return 1
        return max(
            _fe._bucket4(max(c.shape[-1] for c in t[:-1])) for t in trains
        )

    ra_A = _common_ra([p[0] for p in pencils])
    ra_D = _common_ra([p[1] for p in pencils])
    A_ps = [tuple(_fe._prep_operator(p[0], d, ra=ra_A)) for p in pencils]
    D_ps = [tuple(_fe._prep_operator(p[1], d, ra=ra_D)) for p in pencils]
    caps = _fe._vec_caps(d, R, n)
    rng = np.random
    xs = [
        tuple(_fe._prep_vec(x0s[i] if x0s is not None else None, d, n,
                            caps, rng))
        for i in range(len(pencils))
    ]
    A_b = _stack_trees(A_ps)
    D_b = _stack_trees(D_ps)
    x_b = _stack_trees(xs)
    alpha_b = jnp.ones((len(pencils),), dtype=edt)
    tol_dev = jnp.asarray(tol, dtype=edt)
    if mesh is not None:
        shard = _seed_sharding(mesh, kkt_axis=False)
        A_b, D_b, x_b, alpha_b = jax.tree_util.tree_map(
            shard, (A_b, D_b, x_b, alpha_b)
        )
    xs_out, alphas, res, scales = _eigen_program_batch(
        A_b, D_b, x_b, alpha_b, tol_dev,
        caps=tuple(caps), max_pairs=max(nswp - 1, 1),
    )
    alphas = np.asarray(alphas, dtype=np.float64)
    res = np.asarray(res, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    eps_dt = max(float(jnp.finfo(edt).eps),
                 float(jnp.finfo(config.dtype()).eps))
    steps = np.zeros(nb)
    warm = []
    for i in range(nb):
        step = float(alphas[i])
        if not np.isfinite(step) or step < 0:
            step = 0.0
        tol_i = max(tol, 30.0 * eps_dt, 4.0 * eps_dt * float(scales[i]))
        if res[i] > tol_i and np.isfinite(res[i]) and res[i] > 0:
            step *= tol_i / res[i]
        steps[i] = step
        warm.append(tt_normalise(list(_unstack_tree(xs_out, i))))
    return steps, warm


# ---------------------------------------------------------------------------
# Mesh-parallel FULL Newton step (equality path): batched predictor solve,
# per-instance direction extraction (host TT algebra, exactly the
# single-instance helpers), batched step-size eigensolves for ALL (X,dX)
# and (Z,dZ) pencils in one program, Mehrotra sigma + corrector rhs per
# instance, batched corrector solve, final batched step sizes.
#
# This is the reference's HTCondor seeds axis (SURVEY.md §2.3) executed as
# mesh SPMD: the two solve phases and the two eigen phases each run as ONE
# vmapped program over the 'seeds' axis; the TT bookkeeping between them
# is per-instance host work, as it is in the reference's Python layer.
# ---------------------------------------------------------------------------


def tt_newton_step_batch(
    systems: Sequence[Tuple],
    X_tts: Sequence[list],
    Z_tts: Sequence[list],
    mesh: Optional[Mesh] = None,
    R: int = 16,
    R_eig: int = 8,
    term_tol: float = 1e-6,
    nswp: int = 12,
    eps: float = 1e-12,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, List[Tuple]]:
    """One predictor-corrector Newton step for ``nb`` independent equality
    SDP instances (contract of ipm.py::_newton_step_inner, eq path).

    ``systems``: per-instance (lhs TTBlockMatrix, rhs TTBlockVector),
    already assembled/equilibrated.  Returns (x_steps, z_steps,
    [(dY, dX, dZ) per instance])."""
    from ttipm_tpu.ipm import (
        _affine_gap_estimate,
        _mehrotra_sigma,
        _rhs_augment,
        _tt_symmetrise,
    )
    from ttipm_tpu.ops.rounding import tt_rank_reduce
    from ttipm_tpu.ops.tt import (
        tt_identity, tt_inner_prod, tt_reshape, tt_scale,
    )
    from ttipm_tpu.solvers.blocks import TTBlockVector, tt_get_block

    nb = len(systems)
    dim = len(X_tts[0])

    def extract(delta):
        dY = tt_rank_reduce(tt_get_block(0, delta), eps=eps)
        dX = _tt_symmetrise(tt_reshape(tt_get_block(1, delta), (2, 2)), eps)
        dZ = _tt_symmetrise(tt_reshape(tt_get_block(2, delta), (2, 2)), eps)
        return dY, dX, dZ

    # --- predictor solve (batched) ---
    sols, _res = tt_block_amen_fused_batch(
        [s[0] for s in systems], [s[1] for s in systems], R=R, ineq=False,
        mesh=mesh, term_tol=term_tol, nswp=nswp, seed=seed,
    )
    dirs = [extract(s) for s in sols]

    # --- step sizes: all 2*nb pencils in ONE batched eigen program ---
    pencils = [(X_tts[i], dirs[i][1]) for i in range(nb)] + [
        (Z_tts[i], dirs[i][2]) for i in range(nb)
    ]
    steps, _ = tt_step_sizes_batch(pencils, mesh=mesh, R=R_eig)
    x_steps, z_steps = steps[:nb], steps[nb:]

    # --- Mehrotra corrector rhs (host, per instance; contract of
    # ipm.py::_corrector_rhs with mu = <X,Z>/2^d and a mu-scaled rounding
    # budget standing in for the IPMStatus-owned one) ---
    corr_systems = []
    for i in range(nb):
        lhs, rhs = systems[i]
        dY, dX, dZ = dirs[i]
        ZX = float(tt_inner_prod(X_tts[i], Z_tts[i]))
        mu = ZX / 2**dim
        mu_aff = _affine_gap_estimate(
            ZX, X_tts[i], dX, Z_tts[i], dZ, float(x_steps[i]),
            float(z_steps[i]),
        )
        sigma = _mehrotra_sigma(mu_aff, ZX, float(x_steps[i]),
                                float(z_steps[i]))
        rhs_c = TTBlockVector()
        for row in rhs:
            rhs_c[row] = rhs.get_row(row)
        if sigma > 1e-4:
            _rhs_augment(
                rhs_c, 2,
                [tt_scale(sigma * mu,
                          tt_reshape(tt_identity(dim), (4,)))],
                0.1 * max(mu, 1e-8),
            )
        corr_systems.append((lhs, rhs_c))

    # --- corrector solve (batched, warm-started by the predictor) ---
    sols_c, _ = tt_block_amen_fused_batch(
        [s[0] for s in corr_systems], [s[1] for s in corr_systems], R=R,
        ineq=False, mesh=mesh, term_tol=term_tol, nswp=nswp, seed=seed,
        x0s=sols,
    )
    out_dirs = []
    for i in range(nb):
        dY, dX, dZ = dirs[i]
        cY, cX, cZ = extract(sols_c[i])
        out_dirs.append((
            tt_rank_reduce(_add(dY, cY), eps=eps),
            tt_rank_reduce(_add(dX, cX), eps=eps),
            tt_rank_reduce(_add(dZ, cZ), eps=eps),
        ))

    pencils = [(X_tts[i], out_dirs[i][1]) for i in range(nb)] + [
        (Z_tts[i], out_dirs[i][2]) for i in range(nb)
    ]
    steps, _ = tt_step_sizes_batch(pencils, mesh=mesh, R=R_eig)
    x_steps, z_steps = steps[:nb], steps[nb:]
    tau = 0.9 + 0.05 * np.minimum(x_steps, z_steps)
    return tau * x_steps, tau * z_steps, out_dirs


def _add(a, b):
    from ttipm_tpu.ops.tt import tt_add

    return tt_add(a, b)
