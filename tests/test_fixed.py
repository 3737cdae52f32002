"""Fixed-budget PCG mode (PCGConfig.method='fixed'): exactly max_iter
passes, zero in-loop scalar syncs, post-hoc convergence verification."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg import BlockTridiag, PCGConfig, layout, pcg_solve, precond
from tpcg.solver import jnp_backend


def _sys(n=6, K=24, seed=0):
    S = layout.random_spd_cbtd(jax.random.PRNGKey(seed), n, K,
                               dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(seed + 1), (K, n), jnp.float32)
    return S, g


def test_fixed_matches_classic_at_same_pass_count():
    """With the budget set to classic's iteration count, the fixed-mode
    iterates are the same recurrence — solutions must agree to fp32
    reduction noise and the convergence flag must verify."""
    S, g = _sys()
    Pb = precond.build(S, "symmetric_stair").blocks
    ref = jnp_backend.pcg_jnp(S.blocks, Pb, g, jnp.zeros_like(g),
                              exit_tol=1e-7, max_iter=200)
    k = int(ref.iters)
    res = jnp_backend.pcg_fixed_jnp(S.blocks, Pb, g, jnp.zeros_like(g),
                                    exit_tol=1e-7, max_iter=k)
    assert int(res.iters) == k
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.lam), np.asarray(ref.lam),
                               rtol=2e-4, atol=2e-5)


def test_fixed_reports_unconverged_budget_honestly():
    S, g = _sys(seed=3)
    Pb = precond.build(S, "block_jacobi").blocks
    res = jnp_backend.pcg_fixed_jnp(S.blocks, Pb, g, jnp.zeros_like(g),
                                    exit_tol=1e-10, max_iter=2)
    assert int(res.iters) == 2
    assert not bool(res.converged)
    assert np.isfinite(float(res.eta))


def test_fixed_overrun_past_convergence_stays_finite():
    """No exit test means the loop keeps iterating after convergence: the
    +tiny denominators must keep the iterate parked (no NaN), including a
    warm start that is converged at entry."""
    S, g = _sys(seed=5)
    Pb = precond.build(S, "symmetric_stair").blocks
    res = jnp_backend.pcg_fixed_jnp(S.blocks, Pb, g, jnp.zeros_like(g),
                                    exit_tol=1e-7, max_iter=150)
    assert bool(res.converged)
    assert np.all(np.isfinite(np.asarray(res.lam)))
    # warm start at the solution, full budget: stays at the solution
    res2 = jnp_backend.pcg_fixed_jnp(S.blocks, Pb, g, res.lam,
                                     exit_tol=1e-7, max_iter=50)
    assert np.all(np.isfinite(np.asarray(res2.lam)))
    np.testing.assert_allclose(np.asarray(res2.lam), np.asarray(res.lam),
                               rtol=1e-3, atol=1e-3)


def test_fixed_through_public_api_and_pallas_interpret():
    S, g = _sys(seed=7)
    cfg = PCGConfig(exit_tol=1e-7, max_iter=60,
                    preconditioner="symmetric_stair", method="fixed")
    r_jnp = pcg_solve(S, g, config=cfg, backend="jnp")
    assert int(r_jnp.iters) == 60 and bool(r_jnp.converged)
    from tpcg.solver import pallas_backend
    r_pal = pallas_backend.pcg_pallas(
        S.blocks, None, g, jnp.zeros_like(g), exit_tol=1e-7, max_iter=60,
        precond="symmetric_stair", method="fixed", interpret=True)
    assert int(r_pal.iters) == 60 and bool(r_pal.converged)
    np.testing.assert_allclose(np.asarray(r_pal.lam), np.asarray(r_jnp.lam),
                               rtol=2e-4, atol=2e-5)


def test_fixed_rejected_where_unsupported():
    import tpcg

    S, g = _sys(seed=9)
    cfg = PCGConfig(max_iter=10, method="fixed")
    with pytest.raises(ValueError, match="single-system"):
        tpcg.pcg_solve_multirhs(S, jnp.stack([g, g]), config=cfg)


def test_fixed_batched_routes():
    """Batched fixed-budget solves: the vmapped jnp route and the Pallas
    route (lane-packed since round 3) both match per-system fixed
    solves."""
    import tpcg
    from tpcg.solver import pallas_backend

    B, n, K = 2, 4, 128  # K % 128 == 0: the grid kernel's requirement
    keys = jax.random.split(jax.random.PRNGKey(13), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K).blocks
                        for k in keys])
    gamma = jax.random.normal(jax.random.PRNGKey(14), (B, K, n),
                              jnp.float32)
    lam0 = jnp.zeros_like(gamma)
    cfg = PCGConfig(exit_tol=1e-6, max_iter=40,
                    preconditioner="block_jacobi", method="fixed")
    r_jnp = tpcg.pcg_solve_batched(blocks, gamma, config=cfg,
                                   backend="jnp")
    r_pal = pallas_backend.pcg_pallas_batched(
        blocks, None, gamma, lam0, exit_tol=1e-6, max_iter=40,
        precond="block_jacobi", method="fixed", interpret=True)
    for b in range(B):
        pb = precond.build(BlockTridiag(blocks[b]), "block_jacobi").blocks
        ref = jnp_backend.pcg_fixed_jnp(blocks[b], pb, gamma[b], lam0[b],
                                        exit_tol=1e-6, max_iter=40)
        assert int(r_jnp.iters[b]) == 40 and int(r_pal.iters[b]) == 40
        assert bool(r_jnp.converged[b]) == bool(ref.converged)
        np.testing.assert_allclose(np.asarray(r_jnp.lam[b]),
                                   np.asarray(ref.lam), rtol=2e-4,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(r_pal.lam[b]),
                                   np.asarray(ref.lam), rtol=2e-4,
                                   atol=2e-5)
