"""Device-mesh scale-out for the TT-IPM.

The reference's only concurrency is threaded BLAS plus embarrassingly
parallel HTCondor job sweeps over seeds (SURVEY.md §2.3).  The TPU-native
replacements implemented here:

  * ``seeds`` axis (data-parallel analogue): independent problem
    instances/seeds are batched and sharded across devices with
    ``shard_map`` — the cleanest TPU axis since seeds never communicate
    except for metric reductions (``psum``).
  * ``kkt`` axis (tensor-parallel analogue): the dense local-KKT assembly
    contracts over the operator bond axis ``s`` of the projected blocks
    ``einsum('lsr,smnS,LSR->lmLrnR')``; that contraction is sharded over
    ``kkt`` devices and the partial sums are reduced with ``psum`` over
    ICI before the factorization.

``make_mesh(n)`` builds a 2D mesh (seeds × kkt); ``sharded_newton_micro``
jits one batched Newton micro-step (local KKT assembly + solve + residual
reduction) over the full mesh — this is the multi-chip compile target the
driver dry-runs.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ttipm_tpu import config
from ttipm_tpu.ops.linalg import qr_solve

__all__ = ["make_mesh", "sharded_newton_micro", "batched_solve_metrics"]


def make_mesh(n_devices: int, kkt: int = 2) -> Mesh:
    """Mesh with axes (seeds, kkt); kkt divides n_devices."""
    devices = np.array(jax.devices()[:n_devices])
    while n_devices % kkt != 0:
        kkt -= 1
    return Mesh(devices.reshape(n_devices // kkt, kkt), axis_names=("seeds", "kkt"))


def _local_kkt_microstep(phi_l, A_core, phi_r, rhs):
    """One projected-KKT micro solve for a single instance: assemble the
    dense local operator from a (sharded) slice of the operator bond axis,
    psum-reduce over 'kkt', factor, solve, and return the residual norm.
    """
    r_l, s_dim, n, _ = phi_l.shape[0], A_core.shape[0], A_core.shape[1], 0
    m = phi_l.shape[0] * A_core.shape[1] * phi_r.shape[0]
    # Partial assembly over this shard's slice of the operator bond axis.
    B_partial = jnp.einsum("lsr,smnS,LSR->lmLrnR", phi_l, A_core, phi_r).reshape(m, m)
    B = jax.lax.psum(B_partial, axis_name="kkt")
    B = B + 1e-10 * jnp.eye(m, dtype=B.dtype)
    x = qr_solve(B, rhs.reshape(m))
    res = jnp.linalg.norm(B @ x - rhs.reshape(m))
    return x.reshape(rhs.shape), res


def sharded_newton_micro(mesh: Mesh):
    """Jitted batched Newton micro-step over the (seeds, kkt) mesh.

    Inputs carry a leading seed-batch axis sharded over 'seeds' and an
    operator bond axis sharded over 'kkt'.  Returns per-seed solutions and
    the global mean residual (a cross-seed psum).
    """

    def step(phi_l, A_core, phi_r, rhs):
        # shapes (inside shard): phi_l (b, r, s_shard, r), A (b, s_shard, n, n, s2),
        # phi_r (b, R, s2, R), rhs (b, r, n, R)
        def per_seed(pl, ac, pr, rb):
            return _local_kkt_microstep(pl, ac, pr, rb)

        xs, res = jax.vmap(per_seed)(phi_l, A_core, phi_r, rhs)
        mean_res = jax.lax.pmean(jnp.mean(res), axis_name="seeds")
        return xs, mean_res

    spec_in = (
        P("seeds", None, "kkt", None),
        P("seeds", "kkt", None, None, None),
        P("seeds", None, None, None),
        P("seeds", None, None, None),
    )
    spec_out = (P("seeds", None, None, None), P())
    sharded = shard_map(step, mesh=mesh, in_specs=spec_in, out_specs=spec_out,
                        check_rep=False)
    return jax.jit(sharded)


def batched_solve_metrics(mesh: Mesh, feas_errors: jax.Array) -> jax.Array:
    """Cross-seed metric reduction over ICI (mean feasibility error)."""

    def reduce_fn(e):
        return jax.lax.pmean(jnp.mean(e), axis_name="seeds")

    return jax.jit(
        shard_map(reduce_fn, mesh=mesh, in_specs=P("seeds"), out_specs=P(),
                  check_rep=False)
    )(feas_errors)
