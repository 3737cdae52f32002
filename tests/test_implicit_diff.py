"""Implicit-diff VJP tests: gradients through the PCG solve must match
dense autodiff through jnp.linalg.solve."""

import jax
import jax.numpy as jnp
import numpy as np

from tpcg import PCGConfig, layout
from tpcg.ops import block
from tpcg.solver.implicit_diff import pcg_solve_grad


def _dense_loss(blocks, gamma, v):
    A = layout.cbtd_to_dense(blocks)
    lam = jnp.linalg.solve(A, gamma.reshape(-1)).reshape(gamma.shape)
    return jnp.sum(lam * v)


def _pcg_loss(blocks, gamma, v, cfg):
    lam = pcg_solve_grad(blocks, gamma, config=cfg, backend="jnp")
    return jnp.sum(lam * v)


def test_grad_matches_dense(rng):
    n, K = 3, 6
    S = layout.random_spd_cbtd(jax.random.PRNGKey(0), n, K,
                               dtype=jnp.float64)
    gamma = jnp.asarray(rng.standard_normal((K, n)))
    v = jnp.asarray(rng.standard_normal((K, n)))
    cfg = PCGConfig(exit_tol=1e-14, max_iter=500,
                    preconditioner="block_jacobi")

    g_dense = jax.grad(_dense_loss, argnums=(0, 1))(S.blocks, gamma, v)
    g_pcg = jax.grad(_pcg_loss, argnums=(0, 1))(S.blocks, gamma, v, cfg)

    # gamma gradient: exact match
    np.testing.assert_allclose(np.asarray(g_pcg[1]), np.asarray(g_dense[1]),
                               rtol=1e-7, atol=1e-9)
    # S gradient: dense autodiff produces a symmetric-matrix gradient that
    # splits across the two redundant storage slots (S_{k,k+1} appears as
    # both right[k] and left[k+1]); compare the SYMMETRIZED total gradient.
    def total(gb):
        dense_like = layout.cbtd_to_dense(gb)
        return np.asarray(dense_like)

    np.testing.assert_allclose(
        0.5 * (total(g_pcg[0]) + total(g_pcg[0]).T),
        0.5 * (total(g_dense[0]) + total(g_dense[0]).T),
        rtol=1e-6, atol=1e-8)


def test_grad_finite_difference(rng):
    n, K = 2, 4
    S = layout.random_spd_cbtd(jax.random.PRNGKey(1), n, K,
                               dtype=jnp.float64)
    gamma = jnp.asarray(rng.standard_normal((K, n)))
    v = jnp.asarray(rng.standard_normal((K, n)))
    cfg = PCGConfig(exit_tol=1e-14, max_iter=500)

    g = jax.grad(_pcg_loss, argnums=1)(S.blocks, gamma, v, cfg)
    eps = 1e-6
    for idx in [(0, 0), (2, 1), (3, 1)]:
        dg = jnp.zeros_like(gamma).at[idx].set(eps)
        f1 = _pcg_loss(S.blocks, gamma + dg, v, cfg)
        f0 = _pcg_loss(S.blocks, gamma - dg, v, cfg)
        fd = float((f1 - f0) / (2 * eps))
        np.testing.assert_allclose(float(g[idx]), fd, rtol=1e-5, atol=1e-7)


def test_grad_respects_structure(rng):
    """Pad-slot gradients must be exactly zero (structurally absent)."""
    n, K = 3, 5
    S = layout.random_spd_cbtd(jax.random.PRNGKey(2), n, K,
                               dtype=jnp.float64)
    gamma = jnp.ones((K, n), jnp.float64)
    v = jnp.ones((K, n), jnp.float64)
    cfg = PCGConfig(exit_tol=1e-13, max_iter=500)
    g = jax.grad(_pcg_loss, argnums=0)(S.blocks, gamma, v, cfg)
    assert float(jnp.abs(g[0, 0]).max()) == 0.0
    assert float(jnp.abs(g[-1, 2]).max()) == 0.0


def test_grad_batched_vmap(rng):
    """The differentiable solve composes with vmap."""
    n, K, B = 2, 3, 4
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K,
                                               dtype=jnp.float64).blocks
                        for k in keys])
    gamma = jnp.asarray(rng.standard_normal((B, K, n)))
    v = jnp.asarray(rng.standard_normal((B, K, n)))
    cfg = PCGConfig(exit_tol=1e-13, max_iter=200)

    def loss(gb, gg):
        return _pcg_loss(gb, gg, v[0], cfg)

    grads = jax.vmap(jax.grad(loss, argnums=1))(blocks, gamma)
    assert grads.shape == (B, K, n)
    g0 = jax.grad(loss, argnums=1)(blocks[0], gamma[0])
    np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(g0),
                               atol=1e-9)
