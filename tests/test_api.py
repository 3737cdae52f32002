"""Public-API mechanics: PCGSolver AOT compilation, backend validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpcg
from tpcg import layout


def test_pcgsolver_aot_compile_and_solve():
    n, K = 4, 16
    cfg = tpcg.PCGConfig(1e-10, 200, "block_jacobi")
    solver = tpcg.PCGSolver(n, K, cfg, dtype=jnp.float64,
                            backend="jnp").compile()
    S = layout.random_spd_cbtd(jax.random.PRNGKey(0), n, K,
                               dtype=jnp.float64)
    gamma = jnp.ones((K, n), jnp.float64)
    res = solver.solve(S, gamma)
    assert bool(res.converged)
    x_true = np.linalg.solve(np.asarray(S.dense()), np.ones(K * n))
    # exit_tol 1e-10 on eta => |r| ~ 1e-5 => ~1e-4 relative solution error
    np.testing.assert_allclose(np.asarray(res.lam).reshape(-1), x_true,
                               rtol=1e-3, atol=1e-5)


def test_pcgsolver_batched_aot():
    n, K, B = 3, 8, 4
    solver = tpcg.PCGSolver(n, K, tpcg.PCGConfig(1e-10, 200), batch=B,
                            dtype=jnp.float64, backend="jnp").compile()
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K,
                                               dtype=jnp.float64).blocks
                        for k in keys])
    res = solver.solve(tpcg.BlockTridiag(blocks),
                       jnp.ones((B, K, n), jnp.float64))
    assert res.lam.shape == (B, K, n)
    assert np.all(np.asarray(res.converged))


def test_bad_backend_rejected():
    S = layout.random_spd_cbtd(jax.random.PRNGKey(0), 2, 3,
                               dtype=jnp.float64)
    with pytest.raises(ValueError, match="backend must be one of"):
        tpcg.pcg_solve(S, jnp.ones((3, 2), jnp.float64), backend="cuda")


def test_multirhs_explicit_pallas_unsupported_combo():
    S = layout.random_spd_cbtd(jax.random.PRNGKey(0), 2, 4,
                               dtype=jnp.float32)
    # pipelined IS supported in the multi-RHS kernel now; the remaining
    # unsupported combos are explicit Pinv and stop_on_nonfinite
    with pytest.raises(ValueError, match="multi-RHS fused kernel"):
        tpcg.pcg_solve_multirhs(
            S, jnp.ones((2, 4, 2), jnp.float32),
            config=tpcg.PCGConfig(stop_on_nonfinite=True),
            backend="pallas")


def test_multirhs_rejects_explicit_preconditioner():
    """'explicit' has no Pinv argument on this entry point; the error must
    say so up front instead of deep in precond.materialize (ADVICE r1)."""
    S = layout.random_spd_cbtd(jax.random.PRNGKey(0), 2, 4,
                               dtype=jnp.float64)
    with pytest.raises(ValueError, match="does not accept a prebuilt Pinv"):
        tpcg.pcg_solve_multirhs(
            S, jnp.ones((2, 4, 2), jnp.float64),
            config=tpcg.PCGConfig(preconditioner="explicit"))


def test_batched_shape_mismatch_is_clear():
    """pcg_solve_batched runs check_system: a gamma shape mismatch raises a
    named ValueError, not an opaque tracing error (ADVICE r1)."""
    B, n, K = 2, 3, 4
    blocks = jnp.zeros((B, K, 3, n, n), jnp.float64)
    with pytest.raises(ValueError, match="gamma shape"):
        tpcg.pcg_solve_batched(blocks, jnp.zeros((B, K, n + 1), jnp.float64))
    with pytest.raises(ValueError, match="dtype mismatch"):
        tpcg.pcg_solve_batched(blocks, jnp.zeros((B, K, n), jnp.float32))


def test_multirhs_shape_mismatch_is_clear():
    S = layout.random_spd_cbtd(jax.random.PRNGKey(0), 2, 4,
                               dtype=jnp.float64)
    with pytest.raises(ValueError, match="gamma shape"):
        tpcg.pcg_solve_multirhs(S, jnp.ones((2, 4, 3), jnp.float64))
    with pytest.raises(ValueError, match="lam0 shape"):
        tpcg.pcg_solve_multirhs(S, jnp.ones((2, 4, 2), jnp.float64),
                                lam0=jnp.ones((3, 4, 2), jnp.float64))
