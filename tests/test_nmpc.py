"""Closed-loop RTI nonlinear MPC (tpcg/models/nmpc.py): stabilization,
single-QP-per-step tracking, and the value of the carried multiplier warm
start (the reference's h_lambda pattern)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpcg.models import nmpc
from tpcg.models.sqp import quadrotor_hover_problem


def test_rti_stabilizes_quadrotor():
    """From a displaced, tilted start, one QP per control step must fly
    the planar quadrotor to hover: position/tilt -> 0, controls -> hover
    thrust, trajectory-guess defects -> small after the transient."""
    p = quadrotor_hover_problem(K=16)
    res = nmpc.simulate(p, p.x_init, n_steps=60)
    x_final = np.asarray(res.xs[-1])
    assert np.abs(x_final[:3]).max() < 0.05, x_final     # at hover
    assert np.abs(x_final[3:]).max() < 0.05, x_final     # at rest
    u_final = np.asarray(res.us[-1])
    np.testing.assert_allclose(u_final, 9.81 / 2, atol=0.1)
    assert float(res.defects[-1]) < 1e-2
    assert np.all(np.isfinite(np.asarray(res.xs)))


def test_rti_handles_model_mismatch():
    """Plant heavier than the model: the closed loop must still converge
    near hover (integral-free NMPC tolerates parametric mismatch by
    re-linearizing at measured states every step)."""
    from tpcg.models.dynamics import planar_quadrotor_step

    p = quadrotor_hover_problem(K=16)
    heavy = lambda x, u: planar_quadrotor_step(x, u, dt=0.05, mass=1.15)
    res = nmpc.simulate(p, p.x_init, n_steps=80, plant=heavy)
    x_final = np.asarray(res.xs[-1])
    # steady-state offset allowed (no integrator), but bounded and stable
    assert np.abs(x_final).max() < 0.3, x_final
    tail = np.asarray(res.xs[-10:])
    assert np.abs(tail - tail[-1]).max() < 0.02  # settled


def test_rti_actuator_bounds():
    """Thrust limits that the unconstrained transient exceeds: the bounded
    RTI loop must keep every applied control within limits and still reach
    hover (the limit mostly binds during the aggressive transient)."""
    p = quadrotor_hover_problem(K=16)
    free = nmpc.simulate(p, p.x_init, n_steps=60)
    u_hi = 0.8 * float(jnp.max(free.us))
    u_lo = 2.0
    assert float(jnp.max(free.us)) > u_hi  # the limit would bind
    res = nmpc.simulate(p, p.x_init, n_steps=80, u_lo=u_lo, u_hi=u_hi)
    us = np.asarray(res.us)
    assert us.max() <= u_hi + 1e-5 and us.min() >= u_lo - 1e-5
    x_final = np.asarray(res.xs[-1])
    assert np.abs(x_final[:3]).max() < 0.1, x_final
    assert np.all(np.isfinite(np.asarray(res.xs)))


def test_rti_rigid_body_chain():
    """Closed-loop RTI on a 3-DoF rigid-body chain (a short iiwa-class
    arm, kept small so the Lagrangian-autodiff QP traces fast): reaches
    and holds the goal configuration through true nonlinear dynamics."""
    from tpcg.models.rigid_body import ChainModel, iiwa14_like, rk4_step
    from tpcg.models.sqp import TrajOptProblem

    full = iiwa14_like()
    model = ChainModel(*(a[:3] for a in
                         (full.axes, full.origins, full.masses, full.coms,
                          full.inertias, full.damping)),
                       gravity=full.gravity, armature=full.armature[:3])
    nj, K, dt = 3, 12, 0.03
    n, m = 2 * nj, nj
    f32 = jnp.float32
    q_goal = jnp.asarray([0.6, 0.5, -0.4], f32)
    x_goal = jnp.concatenate([q_goal, jnp.zeros(nj, f32)])
    w = jnp.concatenate([jnp.full((nj,), 5.0, f32),
                         jnp.full((nj,), 0.5, f32)])
    Q = jnp.broadcast_to(jnp.diag(w), (K, n, n)).astype(f32)
    Q = Q.at[-1].multiply(10.0)
    q_lin = -jnp.einsum('kij,j->ki', Q, x_goal)
    R = jnp.broadcast_to(0.01 * jnp.eye(m, dtype=f32), (K - 1, m, m))
    # reference the gravity-compensation torque at the goal: a pure
    # quadratic tracking cost otherwise trades position error against
    # torque cost and parks with a steady-state offset
    from tpcg.models.rigid_body import inverse_dynamics
    u_ss = inverse_dynamics(model, q_goal, jnp.zeros(nj, f32),
                            jnp.zeros(nj, f32))
    r_lin = jnp.broadcast_to(-jnp.einsum('ij,j->i', R[0], u_ss),
                             (K - 1, m)).astype(f32)
    p = TrajOptProblem(
        dynamics=lambda x, u: rk4_step(model, x, u, dt),
        Q=Q, q=q_lin, R=R, r=r_lin,
        x_init=jnp.zeros(n, jnp.float32))
    res = nmpc.simulate(p, p.x_init, n_steps=50)
    q_end = np.asarray(res.xs[-1][:nj])
    np.testing.assert_allclose(q_end, np.asarray(q_goal), atol=0.05)
    qd_end = np.asarray(res.xs[-1][nj:])
    assert np.abs(qd_end).max() < 0.05
    assert np.all(np.isfinite(np.asarray(res.xs)))


def test_rti_multiplier_warm_start_cuts_inner_iterations():
    """The carried-and-shifted PCG multipliers (the reference's in/out
    h_lambda, interface.cuh:58,76) must reduce inner iterations vs
    cold-started solves once the loop reaches steady tracking."""
    p = quadrotor_hover_problem(K=16)
    warm = nmpc.simulate(p, p.x_init, n_steps=40, warm_start_lam=True)
    cold = nmpc.simulate(p, p.x_init, n_steps=40, warm_start_lam=False)
    # compare the settled tail (the transient is similar for both)
    warm_tail = int(np.asarray(warm.pcg_iters[-20:]).sum())
    cold_tail = int(np.asarray(cold.pcg_iters[-20:]).sum())
    assert warm_tail < cold_tail, (warm_tail, cold_tail)
    # both still track
    assert np.abs(np.asarray(warm.xs[-1])).max() < 0.1
    assert np.abs(np.asarray(cold.xs[-1])).max() < 0.1


def test_rti_lagged_jacobians_track_exact_loop():
    """jac_refresh_every=k (rti_setup_lagged): Jacobians refreshed every
    k-th step and shifted/reused in between, defects exact every step —
    the closed loop must track the exact-refresh loop closely (stale A/B
    perturb the Gauss-Newton step operator, not the solution manifold)
    without the inner PCG effort blowing up."""
    from tpcg.models.rigid_body import manipulator_reach_problem
    from tpcg.types import PCGConfig

    cfg = PCGConfig(exit_tol=1e-6, max_iter=150,
                    preconditioner="symmetric_stair")
    p = manipulator_reach_problem(K=10, dt=0.01)
    x0 = p.x_init
    exact = nmpc.simulate(p, x0, n_steps=8, config=cfg)
    lag = nmpc.simulate(p, x0, n_steps=8, config=cfg,
                        jac_refresh_every=3)
    assert np.all(np.isfinite(np.asarray(lag.xs)))
    # closed-loop trajectories stay close (the RTI loop absorbs the
    # stale-Jacobian perturbation like the heun-tangent mode does)
    err = np.abs(np.asarray(lag.xs) - np.asarray(exact.xs)).max()
    scale = max(1.0, np.abs(np.asarray(exact.xs)).max())
    assert err / scale < 2e-2, err
    # the warm-started inner solves must not degenerate under stale A/B
    assert int(np.asarray(lag.pcg_iters).sum()) < \
        3 * int(np.asarray(exact.pcg_iters).sum()) + 30
    # and the guess-defect trajectory matches the exact loop's (measured:
    # within 0.3% at every step — stale A/B leave the manifold intact;
    # the absolute value is transient-dominated at this short horizon)
    assert float(lag.defects[-1]) < 1.5 * float(exact.defects[-1]) + 1e-3

    # lag_pinv: the lagged stair_refined preconditioner (rebuilt at each
    # refresh, reused stale in between) must preserve the closed loop —
    # preconditioning is semantics-free — and not cost inner iterations
    # (measured on-chip: it SAVES them; here we assert no blowup)
    lagp = nmpc.simulate(p, x0, n_steps=8, config=cfg,
                         jac_refresh_every=3, lag_pinv=True)
    errp = np.abs(np.asarray(lagp.xs) - np.asarray(exact.xs)).max()
    assert errp / scale < 2e-2, errp
    assert int(np.asarray(lagp.pcg_iters).sum()) <= \
        int(np.asarray(lag.pcg_iters).sum()) + 16


def test_fleet_rti_matches_per_robot_loops():
    """Multi-robot serving (nmpc.simulate_fleet): B robots advanced by one
    JOINTLY-solved QP per control period must reproduce the per-robot
    single-loop trajectories. On the jnp backend the batched solve is the
    vmapped single solve, so parity is exact; the packed-kernel route is
    covered by the batched-solver parity suite (tests/test_packed.py)."""
    from tpcg.models.rigid_body import manipulator_reach_problem
    from tpcg.types import PCGConfig

    cfg = PCGConfig(exit_tol=1e-6, max_iter=100,
                    preconditioner="symmetric_stair")
    p = manipulator_reach_problem(K=10, dt=0.01)
    rng = np.random.default_rng(0)
    B = 3
    x0s = jnp.asarray(rng.uniform(-0.2, 0.2, (B, 14)), jnp.float32)
    fleet = nmpc.simulate_fleet(p, x0s, n_steps=3, config=cfg,
                                backend="jnp")
    assert fleet.xs.shape == (3, B, 14)
    assert fleet.us.shape == (3, B, 7)
    assert bool(jnp.all(jnp.isfinite(fleet.xs)))
    for b in range(B):
        single = nmpc.simulate(p, x0s[b], n_steps=3, config=cfg)
        np.testing.assert_allclose(np.asarray(fleet.xs[:, b]),
                                   np.asarray(single.xs),
                                   rtol=1e-5, atol=1e-6)


def test_fleet_lagged_matches_per_robot_lagged_loops():
    """simulate_fleet(jac_refresh_every=k) must reproduce the per-robot
    single lagged loops exactly on the jnp backend (the fleet lagged path
    is the vmapped single path + the jointly-solved packed QP)."""
    from tpcg.models.rigid_body import manipulator_reach_problem
    from tpcg.types import PCGConfig

    cfg = PCGConfig(exit_tol=1e-6, max_iter=150,
                    preconditioner="symmetric_stair")
    p = manipulator_reach_problem(K=10, dt=0.01)
    rng = np.random.default_rng(1)
    B = 2
    x0s = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 14)), jnp.float32)
    fleet = nmpc.simulate_fleet(p, x0s, n_steps=4, config=cfg,
                                backend="jnp", jac_refresh_every=2)
    assert bool(jnp.all(jnp.isfinite(fleet.xs)))
    for b in range(B):
        single = nmpc.simulate(p, x0s[b], n_steps=4, config=cfg,
                               jac_refresh_every=2)
        np.testing.assert_allclose(np.asarray(fleet.xs[:, b]),
                                   np.asarray(single.xs),
                                   rtol=1e-5, atol=1e-6)
