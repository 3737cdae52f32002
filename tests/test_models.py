"""Problem-generator and MPC-loop tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tpcg import PCGConfig, pcg_solve
from tpcg.models import mpc, trajopt


def test_mpc_schur_system_is_spd_tridiag():
    S, gamma = trajopt.mpc_schur_system(jax.random.PRNGKey(0), 6, 16,
                                        dtype=jnp.float64)
    A = np.asarray(S.dense())
    np.testing.assert_allclose(A, A.T, atol=1e-10)
    assert np.linalg.eigvalsh(A).min() > 0
    assert gamma.shape == (16, 6)


def test_iiwa_and_quadrotor_shapes():
    S, g = trajopt.iiwa14_scale(knot_points=32)
    assert S.blocks.shape == (32, 3, 14, 14) and g.shape == (32, 14)
    S, g = trajopt.quadrotor_scale(knot_points=16)
    assert S.blocks.shape == (16, 3, 12, 12)


def test_batch_systems_solvable():
    S, gamma = trajopt.batch_systems(jax.random.PRNGKey(1), 3, 4, 8,
                                     dtype=jnp.float64)
    assert S.blocks.shape == (3, 8, 3, 4, 4)
    from tpcg import pcg_solve_batched
    res = pcg_solve_batched(S, gamma,
                            config=PCGConfig(1e-10, 300, "block_jacobi"),
                            backend="jnp")
    assert np.all(np.asarray(res.converged))


def test_mpc_warm_start_loop():
    """Receding-horizon loop: warm starts cut cumulative iterations vs cold
    starts on a slowly-varying system (the reference's intended usage,
    SURVEY.md §3.3/§5.4)."""
    n, K = 4, 16
    cfg = PCGConfig(exit_tol=1e-10, max_iter=300,
                    preconditioner="block_jacobi")
    key = jax.random.PRNGKey(2)
    S0, g0 = trajopt.mpc_schur_system(key, n, K, dtype=jnp.float64)

    state = mpc.init_state(K, n, jnp.float64)
    warm_total = 0
    cold_total = 0
    S, g = S0, g0
    for step in range(5):
        # slowly varying problem: perturb gamma only
        g = g0 + 0.01 * step
        state, res = mpc.mpc_step(state, S, g, cfg, shift=False,
                                  backend="jnp")
        warm_total += int(res.iters)
        cold = pcg_solve(S, g, config=cfg, backend="jnp")
        cold_total += int(cold.iters)
        assert bool(res.converged)
    assert int(state.step) == 5
    assert int(state.total_iters) == warm_total
    assert warm_total < cold_total


def test_shift_warm_start():
    lam = jnp.arange(12.0).reshape(4, 3)
    shifted = mpc.shift_warm_start(lam)
    np.testing.assert_array_equal(np.asarray(shifted[:-1]),
                                  np.asarray(lam[1:]))
    np.testing.assert_array_equal(np.asarray(shifted[-1]),
                                  np.asarray(lam[-1]))
