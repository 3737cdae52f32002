"""Block-PCG (tpcg/solver/blockcg.py): R right-hand sides sharing one
Krylov space, vs per-column classic PCG."""

import jax
import jax.numpy as jnp
import numpy as np

from tpcg import BlockTridiag, layout, precond
from tpcg.solver import jnp_backend
from tpcg.solver.blockcg import pcg_block_jnp


def _system(n=6, K=24, seed=0, dtype=jnp.float32):
    S = layout.random_spd_cbtd(jax.random.PRNGKey(seed), n, K, dtype=dtype)
    return S


def test_block_matches_dense_solutions():
    n, K, R = 5, 16, 4
    S = _system(n, K, seed=1)
    Gamma = jax.random.normal(jax.random.PRNGKey(2), (R, K, n), jnp.float32)
    Pb = precond.build(S, "symmetric_stair").blocks
    res = pcg_block_jnp(S.blocks, Pb, Gamma, jnp.zeros_like(Gamma),
                        exit_tol=1e-10, max_iter=300)
    assert np.all(np.asarray(res.converged))
    dense = np.asarray(S.dense(), np.float64)
    for j in range(R):
        want = np.linalg.solve(dense,
                               np.asarray(Gamma[j], np.float64).reshape(-1))
        np.testing.assert_allclose(np.asarray(res.lam[j]).reshape(-1), want,
                                   rtol=2e-3, atol=2e-4)


def test_block_never_slower_than_single_on_correlated_rhs():
    """Correlated right-hand sides (a base vector plus small perturbations —
    the covariance/sensitivity-propagation use case): the shared Krylov
    space must cut the max per-column iteration count vs independent
    classic PCG."""
    n, K, R = 8, 32, 4
    S = _system(n, K, seed=3)
    base = jax.random.normal(jax.random.PRNGKey(4), (K, n), jnp.float32)
    pert = 0.05 * jax.random.normal(jax.random.PRNGKey(5), (R, K, n),
                                    jnp.float32)
    Gamma = base[None] + pert
    Pb = precond.build(S, "block_jacobi").blocks
    res_b = pcg_block_jnp(S.blocks, Pb, Gamma, jnp.zeros_like(Gamma),
                          exit_tol=1e-8, max_iter=400)
    assert np.all(np.asarray(res_b.converged))
    singles = [jnp_backend.pcg_jnp(S.blocks, Pb, Gamma[j],
                                   jnp.zeros_like(Gamma[j]),
                                   exit_tol=1e-8, max_iter=400)
               for j in range(R)]
    it_single = max(int(s.iters) for s in singles)
    it_block = int(np.asarray(res_b.iters).max())
    assert it_block <= it_single, (it_block, it_single)


def test_block_via_public_multirhs_api():
    import pytest

    import tpcg
    from tpcg.types import PCGConfig

    n, K, R = 5, 16, 3
    S = _system(n, K, seed=11)
    Gamma = jax.random.normal(jax.random.PRNGKey(12), (R, K, n), jnp.float32)
    cfg = PCGConfig(exit_tol=1e-9, max_iter=300,
                    preconditioner="symmetric_stair", method="block")
    res = tpcg.pcg_solve_multirhs(S, Gamma, config=cfg)
    assert res.lam.shape == (R, K, n)
    assert np.all(np.asarray(res.converged))
    dense = np.asarray(S.dense(), np.float64)
    for j in range(R):
        want = np.linalg.solve(dense,
                               np.asarray(Gamma[j], np.float64).reshape(-1))
        np.testing.assert_allclose(np.asarray(res.lam[j]).reshape(-1), want,
                                   rtol=2e-3, atol=2e-4)
    # single-system / batched entry points reject the multi-RHS-only method
    with pytest.raises(ValueError, match="multi-RHS only"):
        tpcg.pcg_solve(S, Gamma[0], config=cfg)


def test_block_survives_linearly_dependent_rhs():
    """gamma, 0, 2*gamma: rank-1 block — the Gram matrices are singular
    from pass one. The pseudo-inverse solves must keep everything finite,
    converge all columns, and preserve the exact linear dependence
    (regression: a ridge-regularized linalg.solve NaN'd out here)."""
    n, K = 4, 12
    S = _system(n, K, seed=9)
    g = jax.random.normal(jax.random.PRNGKey(10), (K, n), jnp.float32)
    Gamma = jnp.stack([g, jnp.zeros_like(g), 2.0 * g])
    Pb = precond.build(S, "symmetric_stair").blocks
    res = pcg_block_jnp(S.blocks, Pb, Gamma, jnp.zeros_like(Gamma),
                        exit_tol=1e-8, max_iter=200)
    assert np.all(np.isfinite(np.asarray(res.lam)))
    assert np.all(np.asarray(res.converged))
    assert int(res.iters[1]) == 0
    np.testing.assert_allclose(np.asarray(res.lam[2]),
                               2.0 * np.asarray(res.lam[0]),
                               rtol=1e-4, atol=1e-5)


def test_block_per_column_exit_semantics():
    """A zero column converges at entry (0 iterations) and must come back
    exact-zero; other columns still solve."""
    n, K, R = 4, 12, 3
    S = _system(n, K, seed=7)
    Gamma = jax.random.normal(jax.random.PRNGKey(8), (R, K, n), jnp.float32)
    Gamma = Gamma.at[1].set(0.0)
    Pb = precond.build(S, "block_jacobi").blocks
    res = pcg_block_jnp(S.blocks, Pb, Gamma, jnp.zeros_like(Gamma),
                        exit_tol=1e-9, max_iter=300)
    assert np.all(np.asarray(res.converged))
    assert int(res.iters[1]) == 0
    assert np.all(np.isfinite(np.asarray(res.lam)))
    dense = np.asarray(S.dense(), np.float64)
    for j in (0, 2):
        want = np.linalg.solve(dense,
                               np.asarray(Gamma[j], np.float64).reshape(-1))
        np.testing.assert_allclose(np.asarray(res.lam[j]).reshape(-1), want,
                                   rtol=2e-3, atol=2e-3)
