"""Convergence-history diagnostics vs the actual solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg import PCGConfig, layout, pcg_solve, precond
from tpcg.utils import diagnostics


def test_eta_history_matches_solver():
    n, K = 6, 24
    S = layout.random_spd_cbtd(jax.random.PRNGKey(3), n, K,
                               dtype=jnp.float64)
    gamma = jnp.ones((K, n), jnp.float64)
    cfg = PCGConfig(exit_tol=1e-10, max_iter=200,
                    preconditioner="block_jacobi")
    lam, etas = diagnostics.eta_history(S, gamma, config=cfg)
    res = pcg_solve(S, gamma, config=cfg, backend="jnp")

    # implied iteration count matches the solver's exactly
    assert diagnostics.iterations_to_tolerance(etas, 1e-10) == int(res.iters)
    # final multipliers agree
    np.testing.assert_allclose(np.asarray(lam), np.asarray(res.lam),
                               atol=1e-9)
    # curve is monotone-ish overall and flat after convergence
    e = np.abs(np.asarray(etas))
    k = int(res.iters)
    assert e[k] < 1e-10
    assert np.all(e[k:] == e[k])
    assert e[k] < e[0]


def test_eta_history_shows_preconditioner_gap():
    """The diagnostic makes the preconditioner choice visible: at a fixed
    iteration index the symmetric-stair curve sits far below identity."""
    S = layout.random_spd_cbtd(jax.random.PRNGKey(7), 8, 32,
                               dtype=jnp.float64, diag_boost=0.5)
    gamma = jnp.ones((32, 8), jnp.float64)
    curves = {}
    for pre in ("identity", "symmetric_stair"):
        _, etas = diagnostics.eta_history(
            S, gamma, config=PCGConfig(1e-14, 60, pre))
        curves[pre] = np.abs(np.asarray(etas))
    assert curves["symmetric_stair"][10] < 1e-3 * curves["identity"][10]


def test_eta_history_warm_start_zero_iters():
    """An already-converged warm start implies 0 iterations — matching the
    solver's fast path exactly (etas[0] is the pre-loop eta)."""
    S = layout.random_spd_cbtd(jax.random.PRNGKey(5), 4, 8,
                               dtype=jnp.float64)
    gamma = jnp.ones((8, 4), jnp.float64)
    cfg = PCGConfig(exit_tol=1e-10, max_iter=100)
    sol = pcg_solve(S, gamma, config=cfg, backend="jnp")
    warm = pcg_solve(S, gamma, sol.lam, config=cfg, backend="jnp")
    _, etas = diagnostics.eta_history(S, gamma, sol.lam, config=cfg)
    assert (diagnostics.iterations_to_tolerance(etas, 1e-10)
            == int(warm.iters))


def test_eta_history_rejects_batched():
    import pytest

    S = layout.random_spd_cbtd(jax.random.PRNGKey(6), 3, 4,
                               dtype=jnp.float64)
    batched = jnp.stack([S.blocks, S.blocks])
    with pytest.raises(ValueError, match="one system"):
        diagnostics.eta_history(batched, jnp.ones((2, 4, 3), jnp.float64))


def test_eta_history_stop_on_nonfinite_matches_solver():
    blocks = jnp.zeros((6, 3, 3, 3), jnp.float64)  # singular S
    gamma = jnp.ones((6, 3), jnp.float64)
    cfg = PCGConfig(exit_tol=1e-30, max_iter=50, stop_on_nonfinite=True)
    res = pcg_solve(blocks, gamma, config=cfg, backend="jnp")
    _, etas = diagnostics.eta_history(blocks, gamma, config=cfg)
    e = np.asarray(etas)
    # curve freezes at the first non-finite eta, like the solver's exit
    first_bad = int(np.argmax(~np.isfinite(e)))
    assert first_bad <= int(res.iters) + 1
    assert not np.isfinite(e[-1])


def test_eta_history_pipelined_matches_solver():
    """Pipelined eta curve: iterations-to-tolerance from the curve must
    match the pipelined solver's reported count, and the returned lam must
    match the solver's solution (same recurrence, scan vs while)."""
    from tpcg.solver.pipelined import pcg_pipelined_jnp

    S = layout.random_spd_cbtd(jax.random.PRNGKey(31), 4, 16,
                               dtype=jnp.float64)
    gamma = jnp.ones((16, 4), jnp.float64)
    cfg = PCGConfig(exit_tol=1e-10, max_iter=100,
                    preconditioner="block_jacobi", method="pipelined")
    lam, etas = diagnostics.eta_history(S, gamma, config=cfg)
    pb = precond.build(S, "block_jacobi").blocks
    r = pcg_pipelined_jnp(S.blocks, pb, gamma, jnp.zeros((16, 4),
                                                         jnp.float64),
                          exit_tol=1e-10, max_iter=100)
    assert bool(r.converged)
    k = diagnostics.iterations_to_tolerance(etas, 1e-10)
    assert k == int(r.iters)
    np.testing.assert_allclose(np.asarray(lam), np.asarray(r.lam),
                               rtol=1e-9, atol=1e-10)
    # curve is flat after exit
    assert np.allclose(np.asarray(etas[k:]), np.asarray(etas[k]))


def test_fleet_summary_aggregates_batched_results():
    from tpcg import pcg_solve_batched
    from tpcg.models import trajopt

    B, n, K = 8, 4, 16
    Sb, gb = trajopt.batch_systems(jax.random.PRNGKey(5), B, n, K)
    res = pcg_solve_batched(Sb.blocks, gb,
                            config=PCGConfig(exit_tol=1e-7, max_iter=100,
                                             preconditioner="block_jacobi"),
                            backend="jnp")
    s = diagnostics.fleet_summary(res)
    assert s["n_systems"] == B
    assert s["n_converged"] == B and s["convergence_rate"] == 1.0
    assert s["iters_min"] <= s["iters_median"] <= s["iters_max"]
    assert s["iters_max"] == int(np.asarray(res.iters).max())
    assert s["straggler_index"] == int(np.asarray(res.iters).argmax())
    assert s["unconverged_indices"] == []
    assert s["nonfinite_eta_indices"] == []
    import json
    json.dumps(s)  # JSON-ready contract


def test_fleet_summary_flags_unconverged():
    import types

    res = types.SimpleNamespace(
        iters=np.asarray([3, 100, 5]),
        converged=np.asarray([True, False, True]),
        eta=np.asarray([1e-8, np.nan, 2e-8]))
    s = diagnostics.fleet_summary(res)
    assert s["convergence_rate"] < 1.0
    assert s["unconverged_indices"] == [1]
    assert s["nonfinite_eta_indices"] == [1]
    assert s["straggler_index"] == 1


def test_eta_history_pallas_backend_matches_jnp():
    """backend='pallas' writes the trace from INSIDE the fused kernel
    (debug_eta); off-chip interpret mode must reproduce the jnp scan's
    curve to reduction-order noise, flat tail included."""
    import jax
    from tpcg import layout

    S = layout.random_spd_cbtd(jax.random.PRNGKey(3), 5, 12)
    g = jax.random.normal(jax.random.PRNGKey(4), (12, 5), jnp.float32)
    for method in ("classic", "pipelined"):
        cfg = PCGConfig(exit_tol=1e-7, max_iter=60,
                        preconditioner="symmetric_stair", method=method)
        lam_j, etas_j = diagnostics.eta_history(S, g, config=cfg)
        lam_p, etas_p = diagnostics.eta_history(S, g, config=cfg,
                                                backend="pallas")
        assert etas_p.shape == etas_j.shape
        np.testing.assert_allclose(np.asarray(lam_p), np.asarray(lam_j),
                                   rtol=2e-4, atol=2e-5, err_msg=method)
        np.testing.assert_allclose(np.asarray(etas_p), np.asarray(etas_j),
                                   rtol=2e-3, atol=1e-9, err_msg=method)


def test_eta_history_pallas_fixed_traces_every_pass():
    import jax
    from tpcg import layout

    S = layout.random_spd_cbtd(jax.random.PRNGKey(5), 4, 8)
    g = jax.random.normal(jax.random.PRNGKey(6), (8, 4), jnp.float32)
    cfg = PCGConfig(exit_tol=1e-7, max_iter=40,
                    preconditioner="block_jacobi", method="fixed")
    lam, etas = diagnostics.eta_history(S, g, config=cfg, backend="pallas")
    assert etas.shape == (41,)
    e = np.abs(np.asarray(etas))
    assert e[0] > e[-1]          # monotone-ish decay overall
    assert e[-1] < 1e-7          # converged by the end of the budget
    with pytest.raises(ValueError, match="pallas"):
        diagnostics.eta_history(S, g, config=cfg, backend="jnp")
