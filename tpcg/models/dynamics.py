"""Physically-structured linearized dynamics for LQR/MPC problem builders.

The reference's benchmark domains (MPCGPU: iiwa14 manipulator and
quadrotor-class MPC) use linearized robot dynamics. These builders produce
the discrete-time ``(A_k, B_k)`` of three standard models analytically — not
random matrices — so the LQR layer (tpcg/models/lqr_kkt.py) assembles KKT
systems with the coupling structure real trajectory optimizers see:

* double-integrator chain (exact zero-order-hold discretization),
* quadrotor linearized at hover (12 states, 4 controls),
* manipulator with constant joint-space inertia (iiwa14-dimensioned:
  14 states, 7 controls) — double-integrator structure through M^-1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpcg.models.lqr_kkt import LQRProblem


def double_integrator(dims: int, dt: float = 0.05):
    """Exact ZOH discretization of ``p' = v, v' = u``.

    Returns ``(A (n, n), B (n, m))`` with n = 2*dims, m = dims:
    A = [[I, dt I], [0, I]], B = [[dt^2/2 I], [dt I]].
    """
    I = jnp.eye(dims)
    Z = jnp.zeros((dims, dims))
    A = jnp.block([[I, dt * I], [Z, I]])
    B = jnp.concatenate([0.5 * dt ** 2 * I, dt * I], axis=0)
    return A, B


def quadrotor_hover(dt: float = 0.02, mass: float = 1.0, g: float = 9.81,
                    inertia=(0.01, 0.01, 0.02)):
    """Quadrotor linearized at hover, Euler-discretized.

    State (12): position (3), velocity (3), roll/pitch/yaw (3), body
    rates (3). Control (4): thrust deviation, body torques.
    Small-angle hover model: x" = g*pitch, y" = -g*roll, z" = u_thrust/m;
    attitude integrates body rates; rates driven by torques over inertia.
    """
    Ac = jnp.zeros((12, 12))
    Ac = Ac.at[0:3, 3:6].set(jnp.eye(3))          # p' = v
    Ac = Ac.at[3, 7].set(g)                       # vx' =  g * pitch
    Ac = Ac.at[4, 6].set(-g)                      # vy' = -g * roll
    Ac = Ac.at[6:9, 9:12].set(jnp.eye(3))         # angles' = rates
    Bc = jnp.zeros((12, 4))
    Bc = Bc.at[5, 0].set(1.0 / mass)              # vz' = u1/m
    Bc = Bc.at[9, 1].set(1.0 / inertia[0])
    Bc = Bc.at[10, 2].set(1.0 / inertia[1])
    Bc = Bc.at[11, 3].set(1.0 / inertia[2])
    A = jnp.eye(12) + dt * Ac
    B = dt * Bc
    return A, B


def manipulator_joint_space(n_joints: int = 7, dt: float = 0.01,
                            damping: float = 0.5, key=None):
    """Joint-space manipulator linearization (iiwa14-dimensioned at
    n_joints=7 -> 14 states): ``q" = M^-1 (u - D q')`` with a constant SPD
    inertia M (linearization at a configuration) and viscous damping D.

    A = I + dt * [[0, I], [0, -M^-1 D]],  B = dt * [[0], [M^-1]].
    """
    key = key if key is not None else jax.random.PRNGKey(7)
    L = jax.random.normal(key, (n_joints, n_joints)) * 0.2
    M = L @ L.T + jnp.eye(n_joints)              # SPD joint inertia
    Minv = jnp.linalg.inv(M)
    I = jnp.eye(n_joints)
    Z = jnp.zeros((n_joints, n_joints))
    A = jnp.block([[I, dt * I],
                   [Z, I - dt * damping * Minv]])
    B = jnp.concatenate([Z, dt * Minv], axis=0)
    return A, B


def planar_quadrotor_step(x, u, dt: float = 0.05, mass: float = 1.0,
                          inertia: float = 0.05, arm: float = 0.25,
                          g: float = 9.81):
    """Genuinely NONLINEAR discrete dynamics for the SQP layer
    (tpcg/models/sqp.py): planar quadrotor, Euler-discretized.

    State (6): px, pz, theta, vx, vz, omega. Control (2): rotor thrusts.
    Thrust acts along the body axis -> sin/cos nonlinearity in theta.
    """
    px, pz, th, vx, vz, om = x
    thrust = u[0] + u[1]
    ax = -thrust * jnp.sin(th) / mass
    az = thrust * jnp.cos(th) / mass - g
    al = arm * (u[1] - u[0]) / inertia
    return jnp.stack([px + dt * vx,
                      pz + dt * vz,
                      th + dt * om,
                      vx + dt * ax,
                      vz + dt * az,
                      om + dt * al])


def tracking_lqr(A, B, knot_points: int, x_init, x_goal=None,
                 q_weight: float = 1.0, r_weight: float = 0.1,
                 qf_weight: float = 10.0, dtype=jnp.float32) -> LQRProblem:
    """Time-invariant tracking LQR problem around ``(A, B)``: quadratic
    costs ``q_weight*|x - x_goal|^2`` (terminal ``qf_weight``),
    ``r_weight*|u|^2``, dynamics ``x_{k+1} = A x_k + B u_k``."""
    n, m = B.shape
    K = knot_points
    x_goal = jnp.zeros(n) if x_goal is None else jnp.asarray(x_goal)
    Q = jnp.broadcast_to(q_weight * jnp.eye(n), (K, n, n))
    Q = Q.at[-1].set(qf_weight * jnp.eye(n))
    q = jnp.broadcast_to(-q_weight * x_goal, (K, n))
    q = q.at[-1].set(-qf_weight * x_goal)
    R = jnp.broadcast_to(r_weight * jnp.eye(m), (K - 1, m, m))
    r = jnp.zeros((K - 1, m))
    As = jnp.broadcast_to(A, (K - 1, n, n))
    Bs = jnp.broadcast_to(B, (K - 1, n, m))
    c = jnp.zeros((K - 1, n))
    return LQRProblem(*(z.astype(dtype) for z in
                        (Q, q, R, r, As, Bs, c, jnp.asarray(x_init))))
