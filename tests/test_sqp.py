"""SQP outer loop (tpcg/models/sqp.py): the nonlinear layer above the
linear solver — linearize, assemble Schur complement, PCG-solve, line
search, repeat (the MPCGPU loop, reference README.md:66-77)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpcg.models import dynamics
from tpcg.models.sqp import (TrajOptProblem, quadrotor_hover_problem,
                             sqp_solve, sqp_solve_bounded)


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


def test_bounded_sqp_respects_active_control_bounds():
    """Thrust bounds tight enough to be active: the unconstrained solution
    must violate them, the AL solution must satisfy them (to tolerance) and
    still close the dynamics defects."""
    p = quadrotor_hover_problem(K=24)
    free = sqp_solve(p)
    u_hi = 5.6  # hover thrust is 4.905 per rotor; transient peaks exceed 5.6
    u_lo = 3.0
    assert float(jnp.max(free.u)) > u_hi or float(jnp.min(free.u)) < u_lo, \
        "bounds not active — test would be vacuous"
    res = sqp_solve_bounded(p, u_lo, u_hi, viol_tol=1e-3)
    assert res.converged
    assert res.max_violation < 1e-3
    assert res.defect < 1e-3
    # bounds actually bind somewhere (the constrained optimum saturates)
    assert float(jnp.max(res.u)) > u_hi - 0.2 or \
        float(jnp.min(res.u)) < u_lo + 0.2
    # still stabilizes toward hover (looser than the unconstrained test:
    # the clipped thrust envelope slows the approach within the horizon)
    assert float(jnp.max(jnp.abs(res.x[-1][:3]))) < 0.3
    # constrained cost >= unconstrained cost (sanity of the AL solution)
    assert res.cost >= free.cost - 1e-3


def test_bounded_sqp_state_constraints():
    """Velocity corridor on the quadrotor: the unconstrained trajectory
    exceeds |vx| <= v_max; the AL solution must respect it (to tolerance)
    while keeping defects closed."""
    p = quadrotor_hover_problem(K=24)
    free = sqp_solve(p)
    v_max = 0.7 * float(jnp.max(jnp.abs(free.x[1:, 3])))
    assert v_max > 0.05, "trivial velocity profile — test would be vacuous"
    big = 100.0
    x_lo = jnp.asarray([-big, -big, -big, -v_max, -big, -big], jnp.float32)
    x_hi = jnp.asarray([big, big, big, v_max, big, big], jnp.float32)
    res = sqp_solve_bounded(p, -big, big, x_lo=x_lo, x_hi=x_hi,
                            viol_tol=1e-3)
    assert res.converged
    assert res.max_violation < 1e-3
    assert res.defect < 1e-3
    vx = np.asarray(res.x[1:, 3])
    assert np.abs(vx).max() <= v_max + 1e-3
    # the limit binds (the constrained optimum saturates the corridor)
    assert np.abs(vx).max() > 0.9 * v_max


def test_bounded_sqp_inactive_bounds_match_unconstrained():
    """Slack bounds: the AL loop must terminate in one outer iteration and
    reproduce the unconstrained solution."""
    p = quadrotor_hover_problem(K=16)
    free = sqp_solve(p)
    res = sqp_solve_bounded(p, -100.0, 100.0)
    assert res.converged
    assert res.iterations == 1
    assert res.max_violation == 0.0
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(free.u),
                               rtol=1e-3, atol=1e-3)


def test_sqp_history_observability():
    p = quadrotor_hover_problem(K=16)
    res = sqp_solve(p)
    assert len(res.history) == res.iterations
    for h in res.history:
        assert set(h) == {"cost", "defect", "pcg_iters", "alpha", "step"}
        assert h["pcg_iters"] > 0
