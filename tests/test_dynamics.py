"""Physically-structured dynamics models: discretization correctness and
end-to-end LQR solves through the tpcg pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from tpcg import PCGConfig
from tpcg.models import dynamics, lqr_kkt


def test_double_integrator_exact():
    """ZOH discretization must exactly integrate constant acceleration:
    p1 = p0 + dt*v0 + dt^2/2*u, v1 = v0 + dt*u."""
    A, B = dynamics.double_integrator(3, dt=0.1)
    x0 = jnp.asarray([1., 2., 3., 0.5, -0.5, 0.0])
    u = jnp.asarray([2., 0., -1.])
    x1 = A @ x0 + B @ u
    p1 = np.asarray(x0[:3]) + 0.1 * np.asarray(x0[3:]) + 0.005 * np.asarray(u)
    v1 = np.asarray(x0[3:]) + 0.1 * np.asarray(u)
    np.testing.assert_allclose(np.asarray(x1), np.concatenate([p1, v1]),
                               atol=1e-6)


def test_quadrotor_hover_structure():
    A, B = dynamics.quadrotor_hover(dt=0.02)
    assert A.shape == (12, 12) and B.shape == (12, 4)
    # velocity integrates position; pitch drives vx, roll drives vy (sign)
    assert float(A[0, 3]) == 0.02
    assert float(A[3, 7]) > 0 and float(A[4, 6]) < 0
    # thrust only affects vz among velocities
    assert float(B[5, 0]) > 0 and float(B[3, 0]) == 0


def test_manipulator_dims():
    A, B = dynamics.manipulator_joint_space(7)
    assert A.shape == (14, 14) and B.shape == (14, 7)
    # positions integrate velocities, controls act through M^-1 on velocities
    np.testing.assert_allclose(np.asarray(A[:7, 7:]), 0.01 * np.eye(7),
                               atol=1e-7)
    assert np.allclose(np.asarray(B[:7]), 0)


def test_quadrotor_lqr_stabilizes():
    """Hover LQR from a perturbed state: terminal state much closer to the
    origin than the initial one, controls finite."""
    A, B = dynamics.quadrotor_hover()
    x0 = jnp.zeros(12).at[0].set(1.0).at[6].set(0.2)  # offset + roll
    p = dynamics.tracking_lqr(A, B, knot_points=192, x_init=x0,
                              qf_weight=100.0, dtype=jnp.float64)
    x, u, res = lqr_kkt.solve_lqr(
        p, config=PCGConfig(1e-12, 500, "symmetric_stair"), backend="jnp")
    assert bool(res.converged)
    x = np.asarray(x)
    assert np.linalg.norm(x[-1]) < 0.2 * np.linalg.norm(x[0])
    # dynamics feasibility along the whole trajectory
    for k in range(191):
        np.testing.assert_allclose(
            x[k + 1], np.asarray(p.A[k]) @ x[k] + np.asarray(p.B[k]) @
            np.asarray(u)[k], atol=1e-5)


def test_manipulator_lqr_iiwa_scale():
    """iiwa14-dimensioned manipulator tracking problem solves through the
    full pipeline (n=14, the reference's headline state size)."""
    A, B = dynamics.manipulator_joint_space(7)
    x0 = jnp.concatenate([jnp.ones(7) * 0.3, jnp.zeros(7)])
    goal = jnp.zeros(14)
    p = dynamics.tracking_lqr(A, B, knot_points=128, x_init=x0,
                              x_goal=goal, dtype=jnp.float64)
    assert p.state_size == 14 and p.knot_points == 128
    x, u, res = lqr_kkt.solve_lqr(
        p, config=PCGConfig(1e-12, 500, "symmetric_stair"), backend="jnp")
    assert bool(res.converged)
    assert np.linalg.norm(np.asarray(x)[-1]) < np.linalg.norm(np.asarray(x0))
