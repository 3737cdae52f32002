"""jnp oracle backend tests: golden parity with the reference examples and
correctness vs dense direct solves (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg import (PCGConfig, layout, pcg_solve, precond,
                  solve_reference_flat)
from tpcg.models import golden
from tpcg.ops.bdmv import bdmv


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_golden_solve(dtype):
    """The bundled 2x3 example (pcg_solve.cu / pcg_solve_dp.cu) solved with
    the identity preconditioner (the reference's default empty_pinv config)."""
    S, gamma, lam0 = golden.system(dtype=dtype)
    res = pcg_solve(S, gamma, lam0, config=PCGConfig(), backend="jnp")
    expected = golden.dense_solution(dtype=jnp.float64)
    # The golden system is ill-conditioned (|lambda| ~ 300 from |gamma| ~ 3);
    # fp32 PCG at the reference's abs 1e-6 eta tolerance yields ~1e-5
    # relative solution accuracy, fp64 far better.
    rtol = 1e-4 if dtype == jnp.float32 else 1e-9
    np.testing.assert_allclose(np.asarray(res.lam, np.float64),
                               np.asarray(expected), rtol=rtol, atol=1e-9)
    assert bool(res.converged)
    assert 1 <= int(res.iters) <= 25


def test_golden_reference_flat_shim():
    lam_flat, res = solve_reference_flat(
        golden._S_FLAT, golden._GAMMA, [0.0] * 6,
        golden.STATE_SIZE, golden.KNOT_POINTS, backend="jnp")
    expected = np.asarray(golden.dense_solution()).reshape(-1)
    np.testing.assert_allclose(lam_flat, expected, rtol=1e-4, atol=1e-9)
    assert int(res.iters) >= 1


def test_bdmv_matches_dense(rng):
    K, n = 7, 5
    bt = layout.random_spd_cbtd(jax.random.PRNGKey(1), n, K,
                                dtype=jnp.float64)
    x = jnp.asarray(rng.standard_normal((K, n)))
    y = bdmv(bt.blocks, x)
    y_dense = np.asarray(bt.dense()) @ np.asarray(x).reshape(-1)
    np.testing.assert_allclose(np.asarray(y).reshape(-1), y_dense, atol=1e-10)


def test_bdmv_ignores_pad_slots(rng):
    """Nonzero garbage in the structurally-absent corner slots must not
    affect the product (the guarantee the reference gets via pcg.cuh:105-106
    + utils.cuh boundary cases)."""
    K, n = 4, 3
    bt = layout.random_spd_cbtd(jax.random.PRNGKey(2), n, K,
                                dtype=jnp.float64)
    x = jnp.asarray(rng.standard_normal((K, n)))
    dirty = bt.blocks.at[0, 0].set(99.0).at[-1, 2].set(-7.0)
    np.testing.assert_allclose(np.asarray(bdmv(dirty, x)),
                               np.asarray(bdmv(bt.blocks, x)), atol=0)


@pytest.mark.parametrize("pre", ["identity", "block_jacobi",
                                 "symmetric_stair"])
@pytest.mark.parametrize("n,K", [(2, 3), (4, 16), (12, 64)])
def test_random_spd_solve(pre, n, K):
    S = layout.random_spd_cbtd(jax.random.PRNGKey(n * 100 + K), n, K,
                               dtype=jnp.float64)
    A = np.asarray(S.dense())
    x_true = np.linalg.solve(A, np.ones(K * n))
    gamma = jnp.ones((K, n), jnp.float64)
    cfg = PCGConfig(exit_tol=1e-10, max_iter=500, preconditioner=pre)
    res = pcg_solve(S, gamma, config=cfg, backend="jnp")
    assert bool(res.converged), f"{pre} did not converge in 500 iters"
    np.testing.assert_allclose(np.asarray(res.lam).reshape(-1), x_true,
                               rtol=1e-5, atol=1e-6)


def test_preconditioning_reduces_iterations():
    """symmetric-stair <= block-jacobi <= identity iteration counts on a
    coupled KKT-like system — the reason MPCGPU builds Phi^-1 at all."""
    S = layout.random_spd_cbtd(jax.random.PRNGKey(7), 8, 32,
                               dtype=jnp.float64, diag_boost=0.5)
    gamma = jnp.ones((32, 8), jnp.float64)
    iters = {}
    for pre in ("identity", "block_jacobi", "symmetric_stair"):
        cfg = PCGConfig(exit_tol=1e-10, max_iter=1000, preconditioner=pre)
        res = pcg_solve(S, gamma, config=cfg, backend="jnp")
        assert bool(res.converged)
        iters[pre] = int(res.iters)
    assert iters["block_jacobi"] <= iters["identity"]
    assert iters["symmetric_stair"] <= iters["block_jacobi"]


def test_iteration_count_semantics():
    """Reference semantics (pcg.cuh:154,195,212): hitting max_iter reports
    exactly max_iter with converged=False; converging reports loop_index+1."""
    S = layout.random_spd_cbtd(jax.random.PRNGKey(3), 6, 24,
                               dtype=jnp.float64)
    gamma = jnp.ones((24, 6), jnp.float64)
    starved = pcg_solve(S, gamma,
                        config=PCGConfig(exit_tol=1e-14, max_iter=3),
                        backend="jnp")
    assert int(starved.iters) == 3
    assert not bool(starved.converged)

    ok = pcg_solve(S, gamma, config=PCGConfig(exit_tol=1e-10, max_iter=500),
                   backend="jnp")
    assert bool(ok.converged)
    # converged run reports the number of loop passes executed (i+1)
    assert 1 <= int(ok.iters) <= 500


def test_warm_start_helps():
    """lambda0 is a true warm start (the reference's in/out h_lambda,
    README.md:50): starting at the solution converges immediately."""
    S = layout.random_spd_cbtd(jax.random.PRNGKey(5), 4, 8,
                               dtype=jnp.float64)
    gamma = jnp.ones((8, 4), jnp.float64)
    cfg = PCGConfig(exit_tol=1e-12, max_iter=200)
    cold = pcg_solve(S, gamma, config=cfg, backend="jnp")
    warm = pcg_solve(S, gamma, cold.lam, config=cfg, backend="jnp")
    assert int(warm.iters) < int(cold.iters)


def test_explicit_pinv_matches_built():
    S = layout.random_spd_cbtd(jax.random.PRNGKey(9), 3, 10,
                               dtype=jnp.float64)
    gamma = jnp.ones((10, 3), jnp.float64)
    cfg = PCGConfig(exit_tol=1e-10, max_iter=300,
                    preconditioner="block_jacobi")
    built = pcg_solve(S, gamma, config=cfg, backend="jnp")
    explicit = pcg_solve(
        S, gamma, config=PCGConfig(exit_tol=1e-10, max_iter=300,
                                   preconditioner="explicit"),
        Pinv=precond.block_jacobi(S), backend="jnp")
    assert int(built.iters) == int(explicit.iters)
    np.testing.assert_allclose(np.asarray(built.lam),
                               np.asarray(explicit.lam), atol=1e-12)


def test_iteration_counts_comparable_to_scipy_cg():
    """SURVEY.md §4: sanity-check iteration counts against
    scipy.sparse.linalg.cg on the same system with matched absolute
    tolerance (scipy exits on ||r|| <= atol; ours on r.r < exit_tol, so
    atol = sqrt(exit_tol))."""
    import scipy.sparse.linalg as spla

    n, K = 8, 48
    S = layout.random_spd_cbtd(jax.random.PRNGKey(13), n, K,
                               dtype=jnp.float64)
    A = np.asarray(S.dense())
    b = np.ones(K * n)
    exit_tol = 1e-10

    counter = {"n": 0}
    spla.cg(A, b, rtol=0.0, atol=np.sqrt(exit_tol),
            callback=lambda xk: counter.__setitem__("n", counter["n"] + 1))
    res = pcg_solve(S, jnp.ones((K, n), jnp.float64),
                    config=PCGConfig(exit_tol=exit_tol, max_iter=2000),
                    backend="jnp")
    assert bool(res.converged)
    # same Krylov method, same operator: counts must be in the same ballpark
    assert abs(int(res.iters) - counter["n"]) <= max(3, counter["n"] // 4), (
        int(res.iters), counter["n"])


def test_precond_refine_cuts_iterations():
    """Neumann refinement of the preconditioner apply must reduce iteration
    counts monotonically-ish and produce the same solution (the measured
    motivation: fewer iterations = fewer psum rounds when sharded)."""
    from tpcg.models import trajopt

    S, g = trajopt.iiwa14_scale(knot_points=64)
    prev_iters = None
    for d in (0, 1, 2):
        cfg = PCGConfig(exit_tol=1e-6, max_iter=200,
                        preconditioner="symmetric_stair",
                        precond_refine=d)
        r = pcg_solve(S, g, config=cfg, backend="jnp")
        assert bool(r.converged)
        if prev_iters is not None:
            assert int(r.iters) < prev_iters, (d, int(r.iters), prev_iters)
        prev_iters = int(r.iters)
        # the absolute eta test measures r . M^-1 r, and M^-1 differs per
        # d — so compare on the actual residual, not lam-vs-lam
        resid = np.asarray(bdmv(S.blocks, r.lam) - g)
        rel = np.linalg.norm(resid) / np.linalg.norm(np.asarray(g))
        assert rel < 1e-3, (d, rel)


def test_precond_refine_fused_matches_jnp():
    """Fused kernel (interpret) and jnp backend agree on iteration counts
    with refinement enabled."""
    from tpcg.solver import jnp_backend, pallas_backend
    from tpcg import precond as precond_mod

    S = layout.random_spd_cbtd(jax.random.PRNGKey(17), 5, 16,
                               dtype=jnp.float32)
    g = jnp.ones((16, 5), jnp.float32)
    l0 = jnp.zeros_like(g)
    Pb = precond_mod.build(S, "block_jacobi").blocks
    r_j = jnp_backend.pcg_jnp(S.blocks, Pb, g, l0, exit_tol=1e-7,
                              max_iter=200, precond_refine=2)
    r_p = pallas_backend.pcg_pallas(S.blocks, Pb, g, l0, exit_tol=1e-7,
                                    max_iter=200, precond_refine=2,
                                    interpret=True)
    assert abs(int(r_j.iters) - int(r_p.iters)) <= 1
    np.testing.assert_allclose(np.asarray(r_j.lam), np.asarray(r_p.lam),
                               rtol=1e-4, atol=1e-5)


def test_precond_refine_rejected_negative():
    with pytest.raises(ValueError, match="precond_refine"):
        PCGConfig(precond_refine=-1)
