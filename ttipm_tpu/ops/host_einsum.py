"""Cached opt_einsum contraction plans for the host (numpy) engine.

Plain ``np.einsum`` contracts multi-operand expressions in declaration
order — for the 4-operand TT contractions this produces catastrophic
intermediates (measured round 4: one ALS product sweep spent 0.1-0.8 s
per call that an optimized path does in milliseconds).  The reference
solves this exactly the same way (``cached_einsum``,
/root/reference/src/tt_ops.py:22-28): plan once per (equation, shapes),
reuse forever.
"""

from __future__ import annotations

from functools import lru_cache

import opt_einsum

__all__ = ["host_einsum"]


@lru_cache(maxsize=16384)
def _expr(eq: str, shapes):
    return opt_einsum.contract_expression(eq, *shapes)


def host_einsum(eq: str, *ops):
    return _expr(eq, tuple(o.shape for o in ops))(*ops)
