"""SQP outer loop (tpcg/models/sqp.py): the nonlinear layer above the
linear solver — linearize, assemble Schur complement, PCG-solve, line
search, repeat (the MPCGPU loop, reference README.md:66-77)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpcg.models import dynamics
from tpcg.models.sqp import (TrajOptProblem, quadrotor_hover_problem,
                             sqp_solve)


def test_planar_quadrotor_converges_in_a_handful_of_iterations():
    p = quadrotor_hover_problem(K=32)
    res = sqp_solve(p)
    assert res.converged
    assert res.iterations <= 12
    assert res.defect < 1e-4
    # reaches hover: position/tilt near zero at the end of the horizon
    assert float(jnp.max(jnp.abs(res.x[-1][:3]))) < 0.1
    # monotone merit trend: final cost well below the first iterate's
    assert res.history[-1]["cost"] < res.history[0]["cost"]


def test_sqp_solution_is_dynamically_feasible():
    """Rolling the solved controls through the TRUE nonlinear dynamics must
    track the SQP state trajectory (defects closed, not just penalized)."""
    p = quadrotor_hover_problem(K=24)
    res = sqp_solve(p)
    x = p.x_init
    for k in range(23):
        x = p.dynamics(x, res.u[k])
        np.testing.assert_allclose(np.asarray(x), np.asarray(res.x[k + 1]),
                                   atol=5e-3)


def test_sqp_on_linear_problem_matches_lqr_in_one_step():
    """With exactly linear dynamics the Gauss-Newton QP IS the problem: SQP
    must land on the LQR optimum in one full step."""
    from tpcg.models.lqr_kkt import LQRProblem, solve_lqr

    n_half = 2
    A, B = dynamics.double_integrator(n_half)
    n, m = 2 * n_half, n_half
    K = 16
    x0 = jnp.asarray([1.0, -1.0, 0.0, 0.5])
    lqr = dynamics.tracking_lqr(A, B, K, x0)
    x_lqr, u_lqr, _ = solve_lqr(lqr)

    p = TrajOptProblem(
        dynamics=lambda x, u: A @ x + B @ u,
        Q=lqr.Q, q=lqr.q, R=lqr.R, r=lqr.r, x_init=x0)
    res = sqp_solve(p, max_sqp_iters=5)
    assert res.converged
    # one full Newton step solves a linear-quadratic problem; allow the
    # follow-up no-progress iteration that detects convergence
    assert res.iterations <= 3
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_lqr),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(u_lqr),
                               rtol=1e-3, atol=1e-3)


def test_sqp_history_observability():
    p = quadrotor_hover_problem(K=16)
    res = sqp_solve(p)
    assert len(res.history) == res.iterations
    for h in res.history:
        assert set(h) == {"cost", "defect", "pcg_iters", "alpha", "step"}
        assert h["pcg_iters"] > 0
