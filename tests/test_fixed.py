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


def test_speculative_rejected_where_unsupported():
    """multi-RHS gained the fixed modes in round 3; only the two-phase
    speculative mode stays single-system."""
    import tpcg

    S, g = _sys(seed=9)
    cfg = PCGConfig(max_iter=10, method="speculative")
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


def test_fixed_pipelined_matches_adaptive_at_same_budget():
    """method='fixed_pipelined' with the budget set to the adaptive
    pipelined method's iteration count runs the same recurrence (minus
    replacement): solutions agree to fp32 recurrence noise and the
    post-hoc convergence check verifies."""
    from tpcg.solver.pipelined import (pcg_fixed_pipelined_jnp,
                                       pcg_pipelined_jnp)

    S, g = _sys(seed=15)
    Pb = precond.build(S, "symmetric_stair").blocks
    ref = pcg_pipelined_jnp(S.blocks, Pb, g, jnp.zeros_like(g),
                            exit_tol=1e-7, max_iter=200)
    k = int(ref.iters)
    res = pcg_fixed_pipelined_jnp(S.blocks, Pb, g, jnp.zeros_like(g),
                                  exit_tol=1e-7, max_iter=k + 1)
    assert int(res.iters) == k + 1
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.lam), np.asarray(ref.lam),
                               rtol=2e-3, atol=2e-4)


def test_fixed_pipelined_public_api_and_pallas_interpret():
    from tpcg.solver import pallas_backend

    S, g = _sys(seed=17)
    cfg = PCGConfig(exit_tol=1e-7, max_iter=60,
                    preconditioner="symmetric_stair",
                    method="fixed_pipelined")
    r_jnp = pcg_solve(S, g, config=cfg, backend="jnp")
    assert int(r_jnp.iters) == 60 and bool(r_jnp.converged)
    r_pal = pallas_backend.pcg_pallas(
        S.blocks, None, g, jnp.zeros_like(g), exit_tol=1e-7, max_iter=60,
        precond="symmetric_stair", method="fixed_pipelined",
        interpret=True)
    assert int(r_pal.iters) == 60 and bool(r_pal.converged)
    # both overran convergence by ~2x the needed passes with no exit test;
    # the extra noise-floor passes amplify reduction-order differences
    # between backends, so compare each against the TRUE solution
    x = np.linalg.solve(np.asarray(S.dense(), np.float64),
                        np.asarray(g, np.float64).reshape(-1))
    for r in (r_jnp, r_pal):
        np.testing.assert_allclose(np.asarray(r.lam).reshape(-1), x,
                                   rtol=2e-3, atol=5e-4)


def test_fixed_pipelined_overrun_and_converged_at_entry_stay_finite():
    """No exit tests: an exactly-converged warm start (r = 0) and a long
    overrun past convergence must both stay parked (the alpha_prev=1
    substitution keeps beta*eta/alpha_prev at 0, not NaN)."""
    from tpcg.solver.pipelined import pcg_fixed_pipelined_jnp

    S, g = _sys(seed=19)
    Pb = precond.build(S, "symmetric_stair").blocks
    res = pcg_fixed_pipelined_jnp(S.blocks, Pb, g, jnp.zeros_like(g),
                                  exit_tol=1e-7, max_iter=150)
    assert bool(res.converged)
    assert np.all(np.isfinite(np.asarray(res.lam)))
    res2 = pcg_fixed_pipelined_jnp(S.blocks, Pb, g, res.lam,
                                   exit_tol=1e-7, max_iter=50)
    assert np.all(np.isfinite(np.asarray(res2.lam)))
    # the 50-pass overrun has no exit test, so reduction-order noise walks
    # the parked iterate a few f32 ulps per pass — and the walk is
    # host-codegen dependent (XLA:CPU FMA contraction varies by CPU
    # fingerprint). Park quality is therefore asserted against the TRUE
    # solution, not bitwise against the warm start (same discipline as
    # test_fixed_pipelined_public_api_and_pallas_interpret).
    x_true = np.linalg.solve(np.asarray(S.dense(), np.float64),
                             np.asarray(g, np.float64).reshape(-1))
    for lam in (res.lam, res2.lam):
        np.testing.assert_allclose(np.asarray(lam).reshape(-1), x_true,
                                   rtol=5e-3, atol=3e-3)
    # zero system: parked at zero through the whole budget
    res3 = pcg_fixed_pipelined_jnp(S.blocks, Pb, jnp.zeros_like(g),
                                   jnp.zeros_like(g), exit_tol=1e-7,
                                   max_iter=30)
    assert np.all(np.asarray(res3.lam) == 0)
    assert bool(res3.converged)


def test_fixed_pipelined_batched_packed_route():
    """Lane-packed fixed_pipelined: the shared zero-sync body with
    segmented dots matches per-system jnp fixed_pipelined solves."""
    from tpcg.solver import pallas_backend
    from tpcg.solver.pipelined import pcg_fixed_pipelined_jnp

    B, n, K, budget = 4, 4, 32, 40
    keys = jax.random.split(jax.random.PRNGKey(23), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K).blocks
                        for k in keys])
    gamma = jax.random.normal(jax.random.PRNGKey(24), (B, K, n),
                              jnp.float32)
    lam0 = jnp.zeros_like(gamma)
    res = pallas_backend.pcg_pallas_batched(
        blocks, None, gamma, lam0, exit_tol=1e-7, max_iter=budget,
        precond="symmetric_stair", method="fixed_pipelined",
        interpret=True)
    assert np.all(np.asarray(res.iters) == budget)
    for b in range(B):
        pb = precond.build(BlockTridiag(blocks[b]),
                           "symmetric_stair").blocks
        r1 = pcg_fixed_pipelined_jnp(blocks[b], pb, gamma[b], lam0[b],
                                     exit_tol=1e-7, max_iter=budget)
        assert bool(res.converged[b]) == bool(r1.converged)
        # a fixed budget overruns convergence with no exit test, and the
        # overrun amplifies reduction-order noise between the segmented-
        # dot packed loop and the jnp oracle — so each is checked against
        # the TRUE solution, not bitwise against each other
        x = np.linalg.solve(
            np.asarray(BlockTridiag(blocks[b]).dense(), np.float64),
            np.asarray(gamma[b], np.float64).reshape(-1))
        for lam in (res.lam[b], r1.lam):
            np.testing.assert_allclose(np.asarray(lam).reshape(-1), x,
                                       rtol=5e-3, atol=3e-3)


def test_speculative_matches_adaptive_semantics():
    """method='speculative' = zero-sync fixed sweep + adaptive top-up: it
    must CONVERGE to tolerance regardless of the budget guess, reporting
    iters = budget + top-up passes."""
    from tpcg.solver.pipelined import pcg_pipelined_jnp, pcg_speculative_jnp

    S, g = _sys(seed=27)
    Pb = precond.build(S, "symmetric_stair").blocks
    ref = pcg_pipelined_jnp(S.blocks, Pb, g, jnp.zeros_like(g),
                            exit_tol=1e-7, max_iter=200)
    k = int(ref.iters)
    # (a) budget right on target: no top-up passes beyond the verify
    res = pcg_speculative_jnp(S.blocks, Pb, g, jnp.zeros_like(g),
                              exit_tol=1e-7, max_iter=200,
                              spec_budget=k + 1)
    assert bool(res.converged)
    assert int(res.iters) <= k + 2
    # (b) budget far too small: the adaptive phase finishes the job
    res_lo = pcg_speculative_jnp(S.blocks, Pb, g, jnp.zeros_like(g),
                                 exit_tol=1e-7, max_iter=200,
                                 spec_budget=3)
    assert bool(res_lo.converged)
    assert int(res_lo.iters) > 3
    x = np.linalg.solve(np.asarray(S.dense(), np.float64),
                        np.asarray(g, np.float64).reshape(-1))
    for r in (res, res_lo):
        np.testing.assert_allclose(np.asarray(r.lam).reshape(-1), x,
                                   rtol=2e-3, atol=2e-4)


def test_speculative_public_api_and_pallas_interpret():
    from tpcg.solver import pallas_backend

    S, g = _sys(seed=29)
    cfg = PCGConfig(exit_tol=1e-7, max_iter=120,
                    preconditioner="symmetric_stair", method="speculative",
                    spec_budget=20)
    r_jnp = pcg_solve(S, g, config=cfg, backend="jnp")
    assert bool(r_jnp.converged)
    r_pal = pallas_backend.pcg_pallas(
        S.blocks, None, g, jnp.zeros_like(g), exit_tol=1e-7, max_iter=120,
        precond="symmetric_stair", method="speculative", spec_budget=20,
        interpret=True)
    assert bool(r_pal.converged)
    # the top-up pass count is exquisitely sensitive to reduction order
    # right at the tolerance (budget 20 lands eta within ulps of tol):
    # allow a few passes of slack, assert solutions against the truth
    assert abs(int(r_pal.iters) - int(r_jnp.iters)) <= 3
    x = np.linalg.solve(np.asarray(S.dense(), np.float64),
                        np.asarray(g, np.float64).reshape(-1))
    for r in (r_jnp, r_pal):
        np.testing.assert_allclose(np.asarray(r.lam).reshape(-1), x,
                                   rtol=2e-3, atol=2e-4)


def test_speculative_validation():
    import tpcg

    S, g = _sys(seed=33)
    with pytest.raises(ValueError, match="spec_budget"):
        PCGConfig(method="speculative", max_iter=10, spec_budget=10)
    with pytest.raises(ValueError, match="single-system"):
        tpcg.pcg_solve_batched(
            jnp.stack([S.blocks, S.blocks]),
            jnp.stack([g, g]),
            config=PCGConfig(method="speculative", max_iter=50))
