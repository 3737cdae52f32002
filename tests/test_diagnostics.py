"""Convergence-history diagnostics vs the actual solver."""

import jax
import jax.numpy as jnp
import numpy as np

from tpcg import PCGConfig, layout, pcg_solve
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
    assert e[k - 1] < 1e-10
    assert np.all(e[k - 1:] == e[k - 1])
    assert e[k - 1] < e[0]


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
