"""Randomised TT tools: sketched orthogonalisation and generalised Nystrom
must recover a train exactly when target ranks dominate the true ranks."""

import numpy as np

from ttipm_tpu.ops.random import tt_random_gaussian
from ttipm_tpu.ops.randomized import (
    tt_generalised_nystroem,
    tt_lr_contraction,
    tt_lr_random_orthogonalise,
    tt_rl_contraction,
    tt_rl_random_orthogonalise,
)
from ttipm_tpu.ops.tt import tt_inner_prod, tt_matrix_to_matrix, tt_ranks


def test_partial_contractions():
    d = 4
    A = tt_random_gaussian([2] * (d - 1), (2, 2))
    B = tt_random_gaussian([3] * (d - 1), (2, 2))
    rl = tt_rl_contraction(A, B)
    assert len(rl) == d - 1
    # the full contraction through the first cores equals <A, B>
    import jax.numpy as jnp

    full = jnp.einsum("aijb,cijd->bd", A[0], B[0])  # (rA1, rB1)
    val = float(jnp.sum(full * rl[0]))
    assert abs(val - tt_inner_prod(A, B)) < 1e-10


def test_random_orthogonalise_exact_recovery():
    d = 4
    A = tt_random_gaussian([2] * (d - 1), (2, 2))
    Ad = np.asarray(tt_matrix_to_matrix(A))
    for fn in (tt_lr_random_orthogonalise, tt_rl_random_orthogonalise):
        out = fn(list(A), [3] * (d - 1))
        np.testing.assert_allclose(
            np.asarray(tt_matrix_to_matrix(out)), Ad, atol=1e-8
        )


def test_generalised_nystroem_recovery():
    d = 4
    A = tt_random_gaussian([2] * (d - 1), (2, 2))
    Ad = np.asarray(tt_matrix_to_matrix(A))
    out = tt_generalised_nystroem(list(A), [3] * (d - 1))
    np.testing.assert_allclose(np.asarray(tt_matrix_to_matrix(out)), Ad, atol=1e-7)
