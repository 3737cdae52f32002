"""The bundled golden example system.

Data transcribed from the reference's examples
(/root/reference/examples/pcg_solve.cu:14-25 and pcg_solve_dp.cu:14-25 — both
carry the identical stateSize=2, knotPoints=3 system, fp32 and fp64). This is
the only concrete fixture the reference ships; it is the golden parity test
for every tpcg backend.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpcg import layout
from tpcg.types import BlockTridiag

STATE_SIZE = 2
KNOT_POINTS = 3

# Reference flat cbtd layout, column-major within blocks
# (pcg_solve.cu:14-22).
_S_FLAT = [
    0, 0, 0, 0,
    -.999, 0, 0, -.999,
    .999, .0999, -.98, .999,
    .999, -.98, .0999, .999,
    -2.008, .8801, .8801, -3.0584,
    .999, .0999, -.98, .999,
    .999, -.98, .0999, .999,
    -1.019, .8801, .8801, -2.0694,
    0, 0, 0, 0,
]

_GAMMA = [3.1385, 0, 0, 3.0788, .0031, 3.0788]


def system(dtype=jnp.float32):
    """Returns (S: BlockTridiag, gamma, lam0) for the golden 2x3 system."""
    flat = jnp.asarray(_S_FLAT, dtype=dtype)
    S = layout.from_reference_flat(flat, STATE_SIZE, KNOT_POINTS)
    gamma = jnp.asarray(_GAMMA, dtype=dtype).reshape(KNOT_POINTS, STATE_SIZE)
    lam0 = jnp.zeros((KNOT_POINTS, STATE_SIZE), dtype=dtype)
    return S, gamma, lam0


def dense_solution(dtype=jnp.float64):
    """Direct dense solve of the golden system (numpy, float64) for
    ground-truth comparison."""
    import numpy as np

    S, gamma, _ = system(dtype=jnp.float64)
    A = np.asarray(S.dense(), dtype=np.float64)
    b = np.asarray(gamma, dtype=np.float64).reshape(-1)
    x = np.linalg.solve(A, b)
    return x.reshape(KNOT_POINTS, STATE_SIZE).astype(dtype)
