"""Iteration-count parity sweep: fused kernel (interpret) vs jnp oracle
across seeds/shapes/preconditioners — the tolerance-matched parity criterion
of SURVEY.md §7 (±1 iteration from fp reduction-order ulps; solutions agree
at the convergence tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg import layout, precond
from tpcg.solver import jnp_backend, pallas_backend

CASES = [(seed, n, K, pre)
         for seed in (0, 1, 2)
         for (n, K) in ((3, 8), (7, 24))
         for pre in ("identity", "symmetric_stair")]


@pytest.mark.parametrize("seed,n,K,pre", CASES)
def test_iteration_parity(seed, n, K, pre):
    S = layout.random_spd_cbtd(jax.random.PRNGKey(seed * 97 + n), n, K,
                               dtype=jnp.float32)
    gamma = jax.random.normal(jax.random.PRNGKey(seed + 1), (K, n),
                              jnp.float32)
    lam0 = jnp.zeros_like(gamma)
    identity = pre == "identity"
    pb = None if identity else precond.build(S, pre).blocks

    res_f = pallas_backend.pcg_pallas(
        S.blocks, pb, gamma, lam0, exit_tol=1e-8, max_iter=300,
        interpret=True)
    res_j = jnp_backend.pcg_jnp(
        S.blocks, S.blocks if identity else pb, gamma, lam0,
        exit_tol=1e-8, max_iter=300, identity_pinv=identity)

    assert bool(res_f.converged) == bool(res_j.converged)
    assert abs(int(res_f.iters) - int(res_j.iters)) <= 1, (
        f"seed={seed} n={n} K={K} pre={pre}: "
        f"{int(res_f.iters)} vs {int(res_j.iters)}")
    np.testing.assert_allclose(np.asarray(res_f.lam), np.asarray(res_j.lam),
                               rtol=1e-3, atol=1e-4)
