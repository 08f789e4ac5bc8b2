"""ttipm_tpu — a TPU-native Tensor-Train Interior-Point Method framework.

A from-scratch JAX/XLA implementation of a primal-dual predictor-corrector
interior-point solver for large-scale semidefinite programs whose iterates
X (primal), Y (equality dual), Z (PSD dual slack) and T (inequality dual)
live entirely in Tensor-Train (TT) format.  A ``d``-core TT matrix represents
a ``2^d x 2^d`` matrix with cores of shape ``(r_k, 2, 2, r_{k+1})`` at
polynomial cost in ``d`` and the TT ranks.

Capability parity target: FreditorK/Tensor-Train-Interior-Point-Method
(see SURVEY.md at the repo root for the structural map).  The architecture
here is TPU-first: functional TT algebra over ``jax.Array`` cores, jitted
dense micro-kernels for the per-bond QR/SVD/solve panels, compiled local
KKT solvers, and a device-mesh batch axis over seeds/instances for scale-out
(see ``ttipm_tpu.parallel``).

Numerical precision: the solver targets the reference's float64 tolerances.
``import ttipm_tpu`` enables JAX x64 mode; the TPU backend executes f64 via
emulation, and a float32 performance profile is available through
``ttipm_tpu.config``.
"""

from ttipm_tpu import config as config  # noqa: F401  (enables x64 on import)

from ttipm_tpu.ops.tt import *  # noqa: F401,F403
from ttipm_tpu.ops.rounding import *  # noqa: F401,F403
from ttipm_tpu.ops.products import *  # noqa: F401,F403
from ttipm_tpu.ops.random import *  # noqa: F401,F403

__version__ = "0.1.0"
