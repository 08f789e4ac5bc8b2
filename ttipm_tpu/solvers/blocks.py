"""Sparse block containers for TT operator equations.

``TTBlockMatrix`` stores a dict of TT operators keyed by (row, col) block
position with two kinds of structural sharing: *aliases* (block (k,t) is
the same TT as (i,j)) and *transposes* (block (k,t) is the TT transpose of
(i,j)) — the KKT system stores its (0,1)/(1,0) pair only once.

``TTBlockVector`` is the dict-of-rows right-hand side.

Parity: /root/reference/src/tt_als.py:16-250.  The per-core local products
(`block_local_product` and the compressed AMEn variants) are the einsum
pipelines of src/tt_als.py:190-238; each is one fused contraction per
block key — the shapes are small-matmul chains that XLA maps onto the MXU.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ttipm_tpu import config
from ttipm_tpu.ops.rounding import tt_rank_reduce
from ttipm_tpu.ops.tt import TT, tt_add, tt_inner_prod, tt_scale, tt_sub, tt_transpose

__all__ = [
    "TTBlockVector", "TTBlockMatrix", "tt_get_block", "tt_block_train_add",
    "cast_block_vector", "cast_block_matrix",
]


def cast_block_vector(b: "TTBlockVector", dt) -> "TTBlockVector":
    """Copy with every core cast to ``dt`` (mixed-precision residual
    assembly: refinement residuals b - A x must be computed above the
    working precision or they carry the very noise they try to remove)."""
    out = TTBlockVector()
    out._data = {
        k: [jnp.asarray(c, dt) for c in v] for k, v in b._data.items()
    }
    return out


def cast_block_matrix(A: "TTBlockMatrix", dt) -> "TTBlockMatrix":
    """Copy with every stored block's cores cast to ``dt`` (aliases and
    transpose-shares preserved)."""
    out = TTBlockMatrix()
    out._data = {
        k: [jnp.asarray(c, dt) for c in v] for k, v in A._data.items()
    }
    out._aliases = dict(A._aliases)
    out._transposes = dict(A._transposes)
    return out


def tt_get_block(i: int, block_train_tt: TT) -> TT:
    """Extract block ``i`` from a block TT solution (the core carrying the
    extra block axis is sliced; src/tt_als.py:12-14)."""
    b = int(np.argmax([c.ndim for c in block_train_tt]))
    return block_train_tt[:b] + [block_train_tt[b][:, i]] + block_train_tt[b + 1:]


def tt_block_train_add(x_cores: TT, e_cores: TT, num_blocks: int,
                       eps: float = 1e-12) -> TT:
    """``x + e`` for two block TT solutions whose block cores may sit at
    *different* positions (each solve parks it at whichever boundary its
    final sweep ended on).

    Per-block addition, then a diagonal re-stack at ``x``'s block
    position: the stacked block core carries each block's core in its own
    (row-slab, block, col-slab) and zeros elsewhere, so slicing block ``j``
    routes exclusively through block ``j``'s bond slabs.  Ranks are the
    per-block sums; the final rounding returns them to the true rank.
    Used by the residual-refinement rounds of the Newton solvers (no
    reference counterpart — the reference's restarts re-solve the original
    system, src/tt_als.py:744-825)."""
    d = len(x_cores)
    pos = int(np.argmax([c.ndim for c in x_cores]))
    n_phys = int(x_cores[pos].shape[2])
    sums = [
        tt_rank_reduce(
            tt_add(tt_get_block(i, list(x_cores)), tt_get_block(i, list(e_cores))),
            eps,
        )
        for i in range(num_blocks)
    ]
    sums = [[np.asarray(c) for c in blk] for blk in sums]
    out: TT = []
    for k in range(d):
        cs = [blk[k] for blk in sums]
        rls = [c.shape[0] for c in cs]
        rrs = [c.shape[-1] for c in cs]
        RL = sum(rls) if k > 0 else 1
        RR = sum(rrs) if k < d - 1 else 1
        dt = cs[0].dtype
        if k == pos:
            core = np.zeros((RL, num_blocks, n_phys, RR), dtype=dt)
            ol = orr = 0
            for i, c in enumerate(cs):
                l0, l1 = (ol, ol + c.shape[0]) if k > 0 else (0, 1)
                r0, r1 = (orr, orr + c.shape[-1]) if k < d - 1 else (0, 1)
                core[l0:l1, i, :, r0:r1] = c.reshape(c.shape[0], n_phys, c.shape[-1])
                ol += c.shape[0]
                orr += c.shape[-1]
        elif k == 0:
            core = np.concatenate(cs, axis=-1)
        elif k == d - 1:
            core = np.concatenate(cs, axis=0)
        else:
            mid = cs[0].shape[1:-1]
            core = np.zeros((RL,) + mid + (RR,), dtype=dt)
            ol = orr = 0
            for c in cs:
                core[ol:ol + c.shape[0], ..., orr:orr + c.shape[-1]] = c
                ol += c.shape[0]
                orr += c.shape[-1]
        out.append(jnp.asarray(core))
    return tt_rank_reduce(out, eps)


class TTBlockVector:
    """Dict of row-index -> TT vector."""

    def __init__(self):
        self._data: Dict[int, TT] = {}

    def __setitem__(self, index: int, value: TT):
        if not isinstance(value, list):
            raise ValueError("each block row must be a TT (list of cores)")
        self._data[index] = value

    def get_row(self, index: int):
        return self._data.get(index, None)

    def __getitem__(self, core_index: int) -> "TTBlockVectorView":
        return TTBlockVectorView(self._data, core_index)

    def __iter__(self):
        return iter(self._data)

    def __contains__(self, index: int):
        return index in self._data

    def keys(self):
        return self._data.keys()

    def values(self):
        return self._data.values()

    def items(self):
        return self._data.items()

    @property
    def norm(self) -> float:
        return float(np.sqrt(sum(tt_inner_prod(v, v) for v in self._data.values())))

    def __sub__(self, other: "TTBlockVector") -> "TTBlockVector":
        out = TTBlockVector()
        for i in self._data:
            out[i] = tt_rank_reduce(tt_sub(self.get_row(i), other.get_row(i)), 1e-12)
        return out

    def scale(self, s: float):
        self._data = {
            k: tt_rank_reduce(tt_scale(s, v), 1e-12) for k, v in self._data.items()
        }


class TTBlockVectorView:
    """All rows' cores at a fixed core index."""

    def __init__(self, data: Dict[int, TT], core_index: int):
        self._data = data
        self._idx = core_index

    def __getitem__(self, row_index: int):
        return self._data[row_index][self._idx]

    def __iter__(self):
        return iter(self._data)

    def __contains__(self, row_index: int):
        return row_index in self._data

    def items(self):
        for i, row in self._data.items():
            if self._idx < len(row):
                yield i, row[self._idx]

    def block_local_product(self, Xb_k, Xb_kp1, nrmsc, shape) -> jax.Array:
        """Project every rhs row onto the local basis:
        result[:, i] = einsum('br,bnB,BR->rnR') (src/tt_als.py:79-83)."""
        cols = {
            i: jnp.einsum(
                "br,bnB,BR->rnR", Xb_k[i], nrmsc * self._data[i][self._idx], Xb_kp1[i]
            )
            for i in self._data.keys()
        }
        zero = jnp.zeros(shape[:1] + shape[2:], dtype=config.dtype())
        return jnp.stack([cols.get(i, zero) for i in range(shape[1])], axis=1)


class TTBlockMatrix:
    """Dict of (row, col) -> TT operator with alias/transpose sharing."""

    def __init__(self):
        self._data: Dict[Tuple[int, int], TT] = {}
        self._aliases: Dict[Tuple[int, int], Tuple[int, int]] = {}
        self._transposes: Dict[Tuple[int, int], Tuple[int, int]] = {}

    def add_alias(self, key1, key2, is_transpose: bool = False):
        if is_transpose:
            self._transposes[key1] = key2
        else:
            self._aliases[key1] = key2

    def __getitem__(self, key):
        if isinstance(key, tuple) and len(key) == 2:
            return self._data.setdefault(key, [])
        if isinstance(key, int):
            return TTBlockMatrixView(self._data, self._aliases, self._transposes, key)
        raise KeyError(f"invalid key {key!r}")

    def __setitem__(self, key, value):
        if not (isinstance(key, tuple) and len(key) == 2):
            raise KeyError(f"invalid key {key!r}")
        self._data[key] = value

    def __iter__(self):
        return iter(self._data)

    def keys(self):
        return self._data.keys()

    def tkeys(self):
        return self._data.keys() | set(self._transposes.values())

    def akeys(self):
        return self._data.keys() | set(self._aliases.values())

    def all_keys(self):
        return self._data.keys() | set(self._aliases.values()) | set(self._transposes.values())

    def block_product(self, x_cores: TT, op_tol: float, eps: float = 1e-12,
                      cache: dict = None) -> TTBlockVector:
        """Full block operator applied to a block TT solution
        (src/tt_als.py:132-155).

        ``cache``: optional mutable dict carried across repeated products
        against slightly-perturbed inputs (the IPM refine rounds).  Each
        per-term ALS fit is warm-started from the previous call's fit for
        the same (block, kind) slot, then the slot is updated in place."""
        from ttipm_tpu.ops.products import tt_mat_vec_mul

        result = TTBlockVector()

        def accumulate(row, op, col, slot):
            x0 = None if cache is None else cache.get(slot)
            term = tt_mat_vec_mul(op, tt_get_block(col, x_cores), op_tol,
                                  eps, x0=x0)
            if cache is not None:
                cache[slot] = term
            if row in result.keys():
                result[row] = tt_rank_reduce(tt_add(result.get_row(row), term), eps)
            else:
                result[row] = term

        for (i, j), op in self._data.items():
            accumulate(i, op, j, (i, j, "d"))
            if (i, j) in self._transposes:
                k, t = self._transposes[i, j]
                accumulate(k, tt_transpose(op), t, (i, j, "t"))
            if (i, j) in self._aliases:
                k, t = self._aliases[i, j]
                accumulate(k, op, t, (i, j, "a"))
        return result

    def get_submatrix(self, row_index: int, col_index: int) -> "TTBlockMatrix":
        sub = TTBlockMatrix()
        sub._data = {
            k: v for k, v in self._data.items() if k[0] <= row_index and k[1] <= col_index
        }
        sub._aliases = {
            k: v for k, v in self._aliases.items() if v[0] <= row_index and v[1] <= col_index
        }
        sub._transposes = {
            k: v
            for k, v in self._transposes.items()
            if v[0] <= row_index and v[1] <= col_index
        }
        return sub


class TTBlockMatrixView:
    """All blocks' cores at a fixed core index, with the local-product
    contractions used inside AMEn sweeps."""

    def __init__(self, data, aliases, transposes, core_index):
        self._data = data
        self._aliases = aliases
        self._transposes = transposes
        self._idx = core_index

    def __getitem__(self, key):
        return self._data[key][self._idx]

    def __iter__(self):
        return iter(self._data)

    def keys(self):
        return self._data.keys()

    def tkeys(self):
        return self._data.keys() | set(self._transposes.values())

    def akeys(self):
        return self._data.keys() | set(self._aliases.values())

    def all_keys(self):
        return self._data.keys() | set(self._aliases.values()) | set(self._transposes.values())

    @property
    def transposes(self):
        return self._transposes

    @property
    def aliases(self):
        return self._aliases

    def block_local_product(self, XAX_k, XAX_kp1, x_core) -> jax.Array:
        """y[:, i] += K_ij x[:, j] in the local projected basis
        (src/tt_als.py:190-200).  Column contributions are accumulated and
        stacked once — scatter-free for XLA."""
        cols = {}
        def acc(i, val):
            cols[i] = val if i not in cols else cols[i] + val
        for (i, j) in self._data.keys():
            A_k = self._data[i, j][self._idx]
            acc(i, jnp.einsum("lsr,smnS,LSR,rnR->lmL", XAX_k[i, j], A_k, XAX_kp1[i, j], x_core[:, j]))
            if (i, j) in self._transposes:
                k, t = self._transposes[i, j]
                acc(k, jnp.einsum("lsr,smnS,LSR,lmL->rnR", XAX_k[i, j], A_k, XAX_kp1[i, j], x_core[:, t]))
            if (i, j) in self._aliases:
                k, t = self._aliases[i, j]
                acc(k, jnp.einsum("lsr,smnS,LSR,rnR->lmL", XAX_k[i, j], A_k, XAX_kp1[i, j], x_core[:, t]))
        zero = jnp.zeros(
            (x_core.shape[0], x_core.shape[2], x_core.shape[3]), dtype=x_core.dtype
        )
        return jnp.stack(
            [cols.get(i, zero) for i in range(x_core.shape[1])], axis=1
        )

    def block_local_product_batched(self, XAX_k, XAX_kp1, x_cores_q) -> jax.Array:
        """Batched form of ``block_local_product`` over a leading axis q
        (used to evaluate all rank-backoff candidates in one contraction).
        ``x_cores_q``: (q, r, block, n, R) -> (q, r, block, n, R)."""
        cols = {}

        def acc(i, val):
            cols[i] = val if i not in cols else cols[i] + val

        for (i, j) in self._data.keys():
            A_k = self._data[i, j][self._idx]
            acc(i, jnp.einsum("lsr,smnS,LSR,qrnR->qlmL", XAX_k[i, j], A_k, XAX_kp1[i, j], x_cores_q[:, :, j]))
            if (i, j) in self._transposes:
                k, t = self._transposes[i, j]
                acc(k, jnp.einsum("lsr,smnS,LSR,qlmL->qrnR", XAX_k[i, j], A_k, XAX_kp1[i, j], x_cores_q[:, :, t]))
            if (i, j) in self._aliases:
                k, t = self._aliases[i, j]
                acc(k, jnp.einsum("lsr,smnS,LSR,qrnR->qlmL", XAX_k[i, j], A_k, XAX_kp1[i, j], x_cores_q[:, :, t]))
        q, r = x_cores_q.shape[0], x_cores_q.shape[1]
        zero = jnp.zeros((q, r, x_cores_q.shape[3], x_cores_q.shape[4]),
                         dtype=x_cores_q.dtype)
        return jnp.stack(
            [cols.get(i, zero) for i in range(x_cores_q.shape[2])], axis=2
        )

    def compressed_block_local_product(self, ZAX_k, ZAX_kp1, x_core, shape) -> jax.Array:
        """Residual projection with z-bases on both sides
        (src/tt_als.py:202-212)."""
        cols = {}

        def acc(i, val):
            cols[i] = val if i not in cols else cols[i] + val

        for (i, j) in self._data.keys():
            A_k = self._data[i, j][self._idx]
            acc(i, jnp.einsum("lsr,smnS,LSR,rnR->lmL", ZAX_k[i, j], A_k, ZAX_kp1[i, j], x_core[:, j]))
            if (i, j) in self._transposes:
                k, t = self._transposes[i, j]
                acc(k, jnp.einsum("lsr,snmS,LSR,rnR->lmL", ZAX_k[k, t], A_k, ZAX_kp1[k, t], x_core[:, t]))
            if (i, j) in self._aliases:
                k, t = self._aliases[i, j]
                acc(k, jnp.einsum("lsr,smnS,LSR,rnR->lmL", ZAX_k[i, j], A_k, ZAX_kp1[i, j], x_core[:, t]))
        zero = jnp.zeros(shape[:1] + shape[2:], dtype=config.dtype())
        return jnp.stack([cols.get(i, zero) for i in range(shape[1])], axis=1)

    def lcompressed_block_local_product(self, ZAX_k, XAX_kp1, x_core, shape) -> jax.Array:
        """z-basis left / x-basis right projection (src/tt_als.py:215-225)."""
        cols = {}

        def acc(i, val):
            cols[i] = val if i not in cols else cols[i] + val

        for (i, j) in self._data.keys():
            A_k = self._data[i, j][self._idx]
            acc(i, jnp.einsum("lsr,smnS,LSR,rnR->lmL", ZAX_k[i, j], A_k, XAX_kp1[i, j], x_core[:, j]))
            if (i, j) in self._transposes:
                k, t = self._transposes[i, j]
                acc(k, jnp.einsum("lsr,snmS,RSL,rnR->lmL", ZAX_k[k, t], A_k, XAX_kp1[i, j], x_core[:, t]))
            if (i, j) in self._aliases:
                k, t = self._aliases[i, j]
                acc(k, jnp.einsum("lsr,smnS,LSR,rnR->lmL", ZAX_k[i, j], A_k, XAX_kp1[i, j], x_core[:, t]))
        zero = jnp.zeros(shape[:1] + shape[2:], dtype=config.dtype())
        return jnp.stack([cols.get(i, zero) for i in range(shape[1])], axis=1)

    def rcompressed_block_local_product(self, XAX_k, ZAX_kp1, x_core, shape) -> jax.Array:
        """x-basis left / z-basis right projection (src/tt_als.py:228-238)."""
        cols = {}

        def acc(i, val):
            cols[i] = val if i not in cols else cols[i] + val

        for (i, j) in self._data.keys():
            A_k = self._data[i, j][self._idx]
            acc(i, jnp.einsum("lsr,smnS,LSR,rnR->lmL", XAX_k[i, j], A_k, ZAX_kp1[i, j], x_core[:, j]))
            if (i, j) in self._transposes:
                k, t = self._transposes[i, j]
                acc(k, jnp.einsum("rsl,snmS,LSR,rnR->lmL", XAX_k[i, j], A_k, ZAX_kp1[k, t], x_core[:, t]))
            if (i, j) in self._aliases:
                k, t = self._aliases[i, j]
                acc(k, jnp.einsum("lsr,smnS,LSR,rnR->lmL", XAX_k[i, j], A_k, ZAX_kp1[i, j], x_core[:, t]))
        zero = jnp.zeros(shape[:1] + shape[2:], dtype=config.dtype())
        return jnp.stack([cols.get(i, zero) for i in range(shape[1])], axis=1)
