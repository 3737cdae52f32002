"""Edge shapes and failure-detection behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg import BlockTridiag, PCGConfig, layout, pcg_solve
from tpcg.solver import jnp_backend, pallas_backend


@pytest.mark.parametrize("n,K", [(1, 1), (1, 4), (3, 1), (2, 2), (5, 2)])
def test_tiny_shapes_oracle_and_fused(n, K):
    """Degenerate sizes: single knot (no off-diagonals contribute), scalar
    blocks, two-knot chains. Both backends must match the dense solve."""
    S = layout.random_spd_cbtd(jax.random.PRNGKey(n * 10 + K), n, K,
                               dtype=jnp.float32)
    gamma = jnp.ones((K, n), jnp.float32)
    x_true = np.linalg.solve(np.asarray(S.dense(), np.float64), np.ones(K * n))

    res_j = pcg_solve(S, gamma, config=PCGConfig(1e-10, 200), backend="jnp")
    assert bool(res_j.converged)
    np.testing.assert_allclose(np.asarray(res_j.lam).reshape(-1), x_true,
                               rtol=1e-3, atol=1e-4)

    res_p = pallas_backend.pcg_pallas(
        S.blocks, None, gamma, jnp.zeros_like(gamma), exit_tol=1e-10,
        max_iter=200, interpret=True)
    assert bool(res_p.converged)
    np.testing.assert_allclose(np.asarray(res_p.lam).reshape(-1), x_true,
                               rtol=1e-3, atol=1e-4)


def test_stop_on_nonfinite_jnp():
    """An indefinite system makes PCG diverge; with stop_on_nonfinite the
    loop exits as soon as eta goes non-finite instead of running out the
    iteration budget (SURVEY.md §5.3: the reference has no failure
    detection at all)."""
    n, K = 3, 6
    # S = 0 is singular: first pass computes alpha = eta/0 = inf -> eta_new
    # becomes non-finite immediately
    blocks = jnp.zeros((K, 3, n, n), jnp.float64)
    gamma = jnp.ones((K, n), jnp.float64)
    guarded = pcg_solve(BlockTridiag(blocks), gamma,
                        config=PCGConfig(exit_tol=1e-30, max_iter=10_000,
                                         stop_on_nonfinite=True),
                        backend="jnp")
    assert not bool(guarded.converged)
    assert int(guarded.iters) < 10_000
    assert not np.isfinite(float(guarded.eta))
    # without the guard the loop burns the whole budget
    unguarded = pcg_solve(BlockTridiag(blocks), gamma,
                          config=PCGConfig(exit_tol=1e-30, max_iter=50),
                          backend="jnp")
    assert int(unguarded.iters) == 50


def test_stop_on_nonfinite_fused_interpret():
    n, K = 3, 6
    blocks = jnp.zeros((K, 3, n, n), jnp.float32)
    gamma = jnp.ones((K, n), jnp.float32)
    res = pallas_backend.pcg_pallas(
        blocks, None, gamma, jnp.zeros_like(gamma), exit_tol=1e-38,
        max_iter=5000, stop_on_nonfinite=True, interpret=True)
    assert not bool(res.converged)
    assert int(res.iters) < 5000


def test_nonsquare_blocks_rejected():
    with pytest.raises(ValueError, match="knot_points, 3, n, n"):
        from tpcg.types import check_system

        check_system(BlockTridiag(jnp.zeros((4, 3, 2, 3))),
                     jnp.zeros((4, 2)), jnp.zeros((4, 2)))


def test_solver_handles_zero_rhs():
    """gamma = 0 with lam0 = 0 is already converged: eta = 0 < tol. The
    reference would enter the loop anyway and NaN through alpha = 0/0
    (pcg.cuh:154-169 has no pre-loop check); tpcg deviates (SURVEY.md §7
    quirk policy) and reports 0 iterations with lam unchanged."""
    n, K = 3, 4
    S = layout.random_spd_cbtd(jax.random.PRNGKey(0), n, K,
                               dtype=jnp.float64)
    res = pcg_solve(S, jnp.zeros((K, n), jnp.float64),
                    config=PCGConfig(1e-10, 50), backend="jnp")
    assert bool(res.converged)
    assert int(res.iters) == 0
    assert np.all(np.asarray(res.lam) == 0)

    res_p = pallas_backend.pcg_pallas(
        S.blocks.astype(jnp.float32), None,
        jnp.zeros((K, n), jnp.float32), jnp.zeros((K, n), jnp.float32),
        exit_tol=1e-10, max_iter=50, interpret=True)
    assert bool(res_p.converged)
    assert int(res_p.iters) == 0


@pytest.mark.parametrize("pre", ["identity", "block_jacobi"])
def test_pipelined_method_matches_classic(pre):
    """Pipelined PCG (one sync point/iter) must reach the same solution as
    the classic method; iteration counts may differ slightly (different
    method)."""
    from tpcg.solver.pipelined import pcg_pipelined_jnp
    from tpcg import precond as precond_mod

    n, K = 6, 32
    S = layout.random_spd_cbtd(jax.random.PRNGKey(8), n, K,
                               dtype=jnp.float64)
    gamma = jnp.ones((K, n), jnp.float64)
    lam0 = jnp.zeros_like(gamma)
    identity = pre == "identity"
    pb = S.blocks if identity else precond_mod.build(S, pre).blocks
    res_p = pcg_pipelined_jnp(S.blocks, pb, gamma, lam0, exit_tol=1e-12,
                              max_iter=500, identity_pinv=identity)
    res_c = jnp_backend.pcg_jnp(S.blocks, pb, gamma, lam0, exit_tol=1e-12,
                                max_iter=500, identity_pinv=identity)
    assert bool(res_p.converged) and bool(res_c.converged)
    assert abs(int(res_p.iters) - int(res_c.iters)) <= 3
    # both satisfy eta < 1e-12 i.e. |r| ~ 1e-6; different methods' iterates
    # agree only to that residual level
    np.testing.assert_allclose(np.asarray(res_p.lam), np.asarray(res_c.lam),
                               rtol=1e-4, atol=1e-6)


def test_pipelined_fused_interpret():
    n, K = 5, 16
    S = layout.random_spd_cbtd(jax.random.PRNGKey(9), n, K,
                               dtype=jnp.float32)
    gamma = jnp.ones((K, n), jnp.float32)
    res = pallas_backend.pcg_pallas(
        S.blocks, None, gamma, jnp.zeros_like(gamma), exit_tol=1e-8,
        max_iter=200, precond="symmetric_stair", method="pipelined",
        interpret=True)
    assert bool(res.converged)
    x_true = np.linalg.solve(np.asarray(S.dense(), np.float64),
                             np.ones(K * n))
    np.testing.assert_allclose(np.asarray(res.lam).reshape(-1), x_true,
                               rtol=1e-3, atol=1e-3)


def test_pipelined_via_config():
    from tpcg import pcg_solve

    S = layout.random_spd_cbtd(jax.random.PRNGKey(10), 4, 8,
                               dtype=jnp.float64)
    gamma = jnp.ones((8, 4), jnp.float64)
    res = pcg_solve(S, gamma,
                    config=PCGConfig(1e-12, 300, "block_jacobi",
                                     method="pipelined"), backend="jnp")
    assert bool(res.converged)
    x_true = np.linalg.solve(np.asarray(S.dense(), np.float64), np.ones(32))
    np.testing.assert_allclose(np.asarray(res.lam).reshape(-1), x_true,
                               rtol=1e-5, atol=1e-6)
