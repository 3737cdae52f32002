"""Multi-RHS fused solve: per-rhs results must match independent solves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg import layout, precond
from tpcg.ops.multirhs import pcg_pallas_multirhs
from tpcg.solver import jnp_backend


@pytest.mark.parametrize("pre", ["identity", "block_jacobi",
                                 "symmetric_stair"])
def test_multirhs_matches_independent(pre, rng):
    R, n, K = 4, 5, 16
    S = layout.random_spd_cbtd(jax.random.PRNGKey(40), n, K,
                               dtype=jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((R, K, n)), jnp.float32)
    lam0 = jnp.zeros_like(gamma)
    res = pcg_pallas_multirhs(S.blocks, gamma, lam0, exit_tol=1e-8,
                              max_iter=200, precond=pre, interpret=True)
    assert np.all(np.asarray(res.converged))
    identity = pre == "identity"
    pb = S.blocks if identity else precond.build(S, pre).blocks
    for i in range(R):
        r1 = jnp_backend.pcg_jnp(S.blocks, pb, gamma[i], lam0[i],
                                 exit_tol=1e-8, max_iter=200,
                                 identity_pinv=identity)
        # in-kernel GJ preconditioner vs XLA linalg.inv: iteration counts
        # within the usual tolerance band
        assert abs(int(res.iters[i]) - int(r1.iters)) <= 2
        np.testing.assert_allclose(np.asarray(res.lam[i]),
                                   np.asarray(r1.lam), rtol=1e-3, atol=1e-4)


def test_multirhs_converged_at_entry_is_frozen(rng):
    """rhs 0 = zeros: must return lam=0, iters=0, no NaN, while rhs 1
    solves normally."""
    n, K = 4, 8
    S = layout.random_spd_cbtd(jax.random.PRNGKey(41), n, K,
                               dtype=jnp.float32)
    gamma = jnp.zeros((2, K, n), jnp.float32).at[1].set(1.0)
    res = pcg_pallas_multirhs(S.blocks, gamma, jnp.zeros_like(gamma),
                              exit_tol=1e-10, max_iter=100,
                              precond="block_jacobi", interpret=True)
    assert np.all(np.isfinite(np.asarray(res.lam)))
    assert int(res.iters[0]) == 0 and bool(res.converged[0])
    assert bool(res.converged[1]) and int(res.iters[1]) > 0
    assert np.all(np.asarray(res.lam[0]) == 0)


def test_api_multirhs_jnp_fallback(rng):
    """Public pcg_solve_multirhs on the jnp backend (CPU/f64) matches
    independent solves; also covers the pipelined routing."""
    import tpcg

    R, n, K = 3, 4, 12
    S = layout.random_spd_cbtd(jax.random.PRNGKey(42), n, K,
                               dtype=jnp.float64)
    gamma = jnp.asarray(rng.standard_normal((R, K, n)))
    for method in ("classic", "pipelined"):
        cfg = tpcg.PCGConfig(1e-12, 300, "block_jacobi", method=method)
        res = tpcg.pcg_solve_multirhs(S, gamma, config=cfg, backend="jnp")
        assert np.all(np.asarray(res.converged))
        for i in range(R):
            x_true = np.linalg.solve(np.asarray(S.dense()),
                                     np.asarray(gamma[i]).reshape(-1))
            np.testing.assert_allclose(np.asarray(res.lam[i]).reshape(-1),
                                       x_true, rtol=1e-4, atol=1e-6)


def test_api_multirhs_rejects_bad_shape():
    import tpcg

    S = layout.random_spd_cbtd(jax.random.PRNGKey(0), 3, 4,
                               dtype=jnp.float64)
    with pytest.raises(ValueError, match="R, K, n"):
        tpcg.pcg_solve_multirhs(S, jnp.ones((4, 3)), backend="jnp")


def test_batched_pipelined_inkernel_interpret():
    """Grid-batched kernel with pipelined method + in-kernel preconditioner
    (the fastest production fleet configuration)."""
    from tpcg.solver import pallas_backend

    B, n, K = 3, 4, 12
    keys = jax.random.split(jax.random.PRNGKey(50), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K,
                                               dtype=jnp.float32).blocks
                        for k in keys])
    gamma = jnp.ones((B, K, n), jnp.float32)
    res = pallas_backend.pcg_pallas_batched(
        blocks, None, gamma, jnp.zeros_like(gamma), exit_tol=1e-8,
        max_iter=200, precond="symmetric_stair", method="pipelined",
        interpret=True)
    assert np.all(np.asarray(res.converged))
    for b in range(B):
        x_true = np.linalg.solve(
            np.asarray(layout.cbtd_to_dense(blocks[b]), np.float64),
            np.ones(K * n))
        np.testing.assert_allclose(np.asarray(res.lam[b]).reshape(-1),
                                   x_true, rtol=1e-3, atol=1e-3)


def test_multirhs_pipelined_matches_classic(rng):
    """Pipelined multi-RHS kernel: per-rhs solutions match the classic
    kernel at the convergence tolerance."""
    R, n, K = 3, 5, 16
    S = layout.random_spd_cbtd(jax.random.PRNGKey(70), n, K,
                               dtype=jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((R, K, n)), jnp.float32)
    lam0 = jnp.zeros_like(gamma)
    res_c = pcg_pallas_multirhs(S.blocks, gamma, lam0, exit_tol=1e-8,
                                max_iter=200, precond="symmetric_stair",
                                interpret=True)
    res_p = pcg_pallas_multirhs(S.blocks, gamma, lam0, exit_tol=1e-8,
                                max_iter=200, precond="symmetric_stair",
                                method="pipelined", interpret=True)
    assert np.all(np.asarray(res_p.converged))
    for i in range(R):
        assert abs(int(res_p.iters[i]) - int(res_c.iters[i])) <= 3
        np.testing.assert_allclose(np.asarray(res_p.lam[i]),
                                   np.asarray(res_c.lam[i]), rtol=1e-3,
                                   atol=1e-3)


def test_multirhs_pipelined_frozen_rhs(rng):
    """rhs 0 already converged at entry stays frozen under pipelined too."""
    n, K = 4, 8
    S = layout.random_spd_cbtd(jax.random.PRNGKey(71), n, K,
                               dtype=jnp.float32)
    gamma = jnp.zeros((2, K, n), jnp.float32).at[1].set(1.0)
    res = pcg_pallas_multirhs(S.blocks, gamma, jnp.zeros_like(gamma),
                              exit_tol=1e-10, max_iter=100,
                              precond="block_jacobi", method="pipelined",
                              interpret=True)
    assert np.all(np.isfinite(np.asarray(res.lam)))
    assert int(res.iters[0]) == 0 and bool(res.converged[0])
    assert bool(res.converged[1])
    assert np.all(np.asarray(res.lam[0]) == 0)


@pytest.mark.parametrize("method", ["fixed", "fixed_pipelined"])
def test_multirhs_fixed_modes(method):
    """Bounded-latency modes for joint right-hand sides: every rhs runs
    exactly max_iter passes; results match per-rhs single-system fixed
    oracles against the true solutions."""
    import tpcg
    from tpcg.solver.jnp_backend import pcg_fixed_jnp
    from tpcg.solver.pipelined import pcg_fixed_pipelined_jnp
    from tpcg.ops.multirhs import pcg_pallas_multirhs

    R, n, K, budget = 3, 4, 12, 50
    S = layout.random_spd_cbtd(jax.random.PRNGKey(71), n, K,
                               dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(72), (R, K, n), jnp.float32)
    l0 = jnp.zeros_like(g)
    res = pcg_pallas_multirhs(S.blocks, g, l0, exit_tol=1e-7,
                              max_iter=budget,
                              precond="symmetric_stair", method=method,
                              interpret=True)
    assert np.all(np.asarray(res.iters) == budget)
    A = np.asarray(S.dense(), np.float64)
    for i in range(R):
        assert bool(res.converged[i])
        x = np.linalg.solve(A, np.asarray(g[i], np.float64).reshape(-1))
        np.testing.assert_allclose(np.asarray(res.lam[i]).reshape(-1), x,
                                   rtol=5e-3, atol=1e-3)
    # public API routes it too (jnp fallback off-TPU)
    cfg = tpcg.PCGConfig(exit_tol=1e-7, max_iter=budget,
                         preconditioner="symmetric_stair", method=method)
    r_api = tpcg.pcg_solve_multirhs(S, g, config=cfg, backend="jnp")
    assert np.all(np.asarray(r_api.iters) == budget)
    assert bool(np.asarray(r_api.converged).all())
