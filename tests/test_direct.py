"""Block cyclic reduction direct solver vs dense solves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg import layout
from tpcg.models import golden, lqr_kkt
from tpcg.solver.direct import bcr_solve, bcr_solve_blocks


@pytest.mark.parametrize("n,K", [(2, 3), (3, 5), (4, 8), (5, 12), (3, 37),
                                 (7, 64), (2, 1), (6, 2)])
def test_bcr_matches_dense(n, K):
    S = layout.random_spd_cbtd(jax.random.PRNGKey(n * 7 + K), n, K,
                               dtype=jnp.float64)
    gamma = jax.random.normal(jax.random.PRNGKey(K), (K, n), jnp.float64)
    x = bcr_solve_blocks(S.blocks, gamma)
    x_true = np.linalg.solve(np.asarray(S.dense()),
                             np.asarray(gamma).reshape(-1))
    np.testing.assert_allclose(np.asarray(x).reshape(-1), x_true,
                               rtol=1e-9, atol=1e-10)


def test_bcr_golden():
    S, gamma, _ = golden.system(dtype=jnp.float64)
    res = bcr_solve(S, gamma)
    expected = np.asarray(golden.dense_solution())
    np.testing.assert_allclose(np.asarray(res.lam), expected, rtol=1e-9,
                               atol=1e-9)
    assert bool(res.converged)
    assert float(res.eta) < 1e-18  # exact direct solve: true residual ~ 0


def test_bcr_lqr_system():
    p = lqr_kkt.random_lqr(jax.random.PRNGKey(2), 4, 2, 24,
                           dtype=jnp.float64)
    S, gamma = lqr_kkt.schur_system(p)
    res = bcr_solve(S, gamma)
    x_true = np.linalg.solve(np.asarray(S.dense()),
                             np.asarray(gamma).reshape(-1))
    np.testing.assert_allclose(np.asarray(res.lam).reshape(-1), x_true,
                               rtol=1e-8, atol=1e-9)


def test_bcr_vs_pcg_agree():
    """Direct and iterative solvers agree at the iterative tolerance."""
    from tpcg import PCGConfig, pcg_solve

    S = layout.random_spd_cbtd(jax.random.PRNGKey(9), 6, 32,
                               dtype=jnp.float64)
    gamma = jnp.ones((32, 6), jnp.float64)
    direct = bcr_solve(S, gamma)
    iterative = pcg_solve(S, gamma,
                          config=PCGConfig(1e-14, 500, "symmetric_stair"),
                          backend="jnp")
    np.testing.assert_allclose(np.asarray(direct.lam),
                               np.asarray(iterative.lam), rtol=1e-6,
                               atol=1e-8)


def test_bcr_jit_and_vmap():
    """BCR composes with vmap (fleets of direct solves)."""
    B, n, K = 3, 3, 8
    keys = jax.random.split(jax.random.PRNGKey(4), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K,
                                               dtype=jnp.float64).blocks
                        for k in keys])
    gamma = jnp.ones((B, K, n), jnp.float64)
    xs = jax.vmap(bcr_solve_blocks)(blocks, gamma)
    for b in range(B):
        x_true = np.linalg.solve(
            np.asarray(layout.cbtd_to_dense(blocks[b])), np.ones(K * n))
        np.testing.assert_allclose(np.asarray(xs[b]).reshape(-1), x_true,
                                   rtol=1e-9, atol=1e-10)
