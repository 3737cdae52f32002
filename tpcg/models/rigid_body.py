"""Nonlinear rigid-body dynamics for serial-chain manipulators — the model
family of the reference's benchmark domain (MPCGPU drives an iiwa14 arm,
/root/reference/README.md:66-77; the reference repo itself contains no
dynamics — it is the linear-solver core those dynamics feed).

TPU/JAX-idiomatic formulation: instead of hand-derived Featherstone
recursions (what a CUDA stack like GRiD hand-codes), the equations of
motion come from Lagrangian mechanics with autodiff doing the derivations:

* forward kinematics is a static unrolled chain of Rodrigues rotations
  (N=7 links — XLA unrolls and fuses the whole chain);
* the joint-space mass matrix is assembled from the GEOMETRIC COM
  Jacobians (columns ``axis_j x (com_i - p_j)`` / ``axis_j`` — closed
  form, no autodiff inside), ``M(q) = sum_i J_v^T m_i J_v + J_w^T I_w
  J_w``;
* the Coriolis/centrifugal + gravity bias is produced by differentiating
  the energies: ``b(q, qd) = d/dt(dT/dqd) - dT/dq + dV/dq`` evaluated at
  ``qdd = 0``, i.e. one ``jvp`` of ``q -> M(q) qd`` in direction ``qd``
  plus two gradients. No Christoffel symbols are ever written down, and
  because the inner kinematics are analytic the autodiff nesting stays
  one level deep — the SQP layer's outer ``jacfwd`` over the RK4 step is
  level two, which traces and compiles in seconds (a ``jacfwd``-built
  Jacobian here instead made the nesting three-deep and blew trace time
  up beyond 15 minutes).

Everything is a closed jittable expression: ``jax.vmap(jax.jacfwd(step))``
(how tpcg/models/sqp.py linearizes along a trajectory) differentiates
straight through the dynamics, which is the property the SQP layer needs
and the reason to prefer this formulation over recursion-with-buffers.

The bundled ``iiwa14_like()`` chain is an APPROXIMATE 7-DoF arm with
alternating z/y joint axes and iiwa-class link masses/lengths — the
benchmark *shape* (n = 14 states, m = 7 controls), not Kuka's certified
parameters.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


class ChainModel(NamedTuple):
    """Serial chain of revolute joints. Per-link quantities in the LINK
    frame (the frame rotating with joint i), parent = link i-1, fixed base.

    Attributes:
      axes: ``(N, 3)`` unit joint axes.
      origins: ``(N, 3)`` joint-origin offset from the parent frame.
      masses: ``(N,)`` link masses.
      coms: ``(N, 3)`` link centers of mass.
      inertias: ``(N, 3, 3)`` rotational inertia about the COM.
      damping: ``(N,)`` viscous joint damping.
      gravity: scalar gravitational acceleration (world -z).
      armature: ``(N,)`` motor/gearbox reflected inertia added to the mass
        matrix diagonal (MuJoCo convention). Physically real for geared
        arms, and numerically load-bearing: without it the distal links'
        tiny rod inertias (M_jj ~ 5e-4 kg m^2) make the damping
        eigenvalues ~200/s — outside RK4's stability region at MPC-grade
        dt, which turns the discrete dynamics (and every linearization of
        them) into garbage.
    """
    axes: jax.Array
    origins: jax.Array
    masses: jax.Array
    coms: jax.Array
    inertias: jax.Array
    damping: jax.Array
    gravity: float
    armature: jax.Array

    @property
    def n_joints(self) -> int:
        return self.axes.shape[0]


def _rodrigues(axis, angle):
    """Rotation matrix about a unit axis (Rodrigues' formula)."""
    kx, ky, kz = axis
    K = jnp.array([[0.0, -kz, ky],
                   [kz, 0.0, -kx],
                   [-ky, kx, 0.0]], dtype=angle.dtype)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3, dtype=angle.dtype) + s * K + (1.0 - c) * (K @ K)


def _fk(model: ChainModel, q):
    """World rotations, COM positions, joint-origin positions, and joint
    axes per link."""
    N = model.n_joints
    R = jnp.eye(3, dtype=q.dtype)
    p = jnp.zeros(3, dtype=q.dtype)
    Rs, coms, joints, axes_w = [], [], [], []
    for i in range(N):  # static unroll — N is a compile-time constant
        p = p + R @ model.origins[i].astype(q.dtype)
        axis_w = R @ model.axes[i].astype(q.dtype)
        R = R @ _rodrigues(model.axes[i].astype(q.dtype), q[i])
        Rs.append(R)
        joints.append(p)
        coms.append(p + R @ model.coms[i].astype(q.dtype))
        axes_w.append(axis_w)
    return Rs, jnp.stack(coms), jnp.stack(joints), jnp.stack(axes_w)


def _mass_from_fk(model: ChainModel, fk, dtype):
    """Assemble ``M`` from precomputed forward kinematics (shared between
    :func:`mass_matrix` and the fused Lagrangian closures)."""
    N = model.n_joints
    Rs, coms, joints, axes_w = fk
    mask = (jnp.arange(N)[:, None] >= jnp.arange(N)[None, :])  # (i, j)
    # arms[i, j] = com_i - p_j ; columns masked to j <= i
    arms = coms[:, None, :] - joints[None, :, :]               # (N, N, 3)
    Jv = jnp.where(mask[:, :, None], jnp.cross(
        jnp.broadcast_to(axes_w[None, :, :], arms.shape), arms), 0.0)
    Jv = jnp.swapaxes(Jv, 1, 2)                                # (N, 3, N)
    Jw = jnp.where(mask[:, None, :],
                   jnp.swapaxes(axes_w, 0, 1)[None, :, :], 0.0)  # (N, 3, N)
    M = jnp.zeros((N, N), dtype)
    for i in range(N):
        Iw = Rs[i] @ model.inertias[i].astype(dtype) @ Rs[i].T
        M = M + model.masses[i] * Jv[i].T @ Jv[i] \
            + Jw[i].T @ Iw @ Jw[i]
    return M + jnp.diag(model.armature.astype(dtype))


def mass_matrix(model: ChainModel, q):
    """Joint-space inertia ``M(q)`` (N, N), symmetric positive definite.

    Geometric (closed-form) Jacobians: for link i and revolute joint
    j <= i, the COM velocity column is ``axis_j x (com_i - p_j)`` and the
    angular column is ``axis_j``."""
    return _mass_from_fk(model, _fk(model, q), q.dtype)


def _potential(model: ChainModel, q):
    coms = _fk(model, q)[1]
    return model.gravity * jnp.sum(model.masses.astype(q.dtype) *
                                   coms[:, 2])


def com_jacobians(model: ChainModel, q):
    """Geometric COM Jacobians ``(Jv, Jw)``, each ``(N, 3, N)`` — exposed
    for the Jacobian-vs-autodiff parity test."""
    N = model.n_joints
    _Rs, coms, joints, axes_w = _fk(model, q)
    mask = (jnp.arange(N)[:, None] >= jnp.arange(N)[None, :])
    arms = coms[:, None, :] - joints[None, :, :]
    Jv = jnp.where(mask[:, :, None], jnp.cross(
        jnp.broadcast_to(axes_w[None, :, :], arms.shape), arms), 0.0)
    Jw = jnp.where(mask[:, None, :],
                   jnp.swapaxes(axes_w, 0, 1)[None, :, :], 0.0)
    return jnp.swapaxes(Jv, 1, 2), Jw


def _mass_and_bias(model: ChainModel, q, qd):
    """``(M, b)`` with the autodiff passes SHARED (the NMPC linearize
    hotspot: the SQP layer's jacfwd multiplies every pass by ~n+m
    tangents, and on TPU these deep chains of tiny ops are latency-bound
    — bench.py measured the linearize at ~5.6 ms of a 13.7 ms control
    step at K=128 before this refactor):

    * ONE jvp of ``q -> M(q)`` in direction ``qd`` yields both the primal
      ``M`` (reused for the solve) and ``(dM/dq qd)``, whose product with
      ``qd`` is the first Coriolis term;
    * ONE gradient of the combined scalar ``V(q) - T(q, qd)`` replaces the
      separate ``dT/dq`` and ``dV/dq`` passes (and shares the fk between
      the potential and kinetic terms).
    """
    M, dM_qd = jax.jvp(lambda qq: mass_matrix(model, qq), (q,), (qd,))

    def neg_lagrangian_q(qq):
        fk = _fk(model, qq)                  # ONE fk for both T and V
        Mq = _mass_from_fk(model, fk, qq.dtype)
        V = model.gravity * jnp.sum(model.masses.astype(qq.dtype) *
                                    fk[1][:, 2])
        return V - 0.5 * qd @ Mq @ qd

    b = dM_qd @ qd + jax.grad(neg_lagrangian_q)(q)
    return M, b


def bias_forces(model: ChainModel, q, qd):
    """Coriolis/centrifugal + gravity torques ``b(q, qd)`` such that
    ``M(q) qdd + b(q, qd) = tau`` (no damping). Derived by autodiff of the
    Lagrangian: ``b = (d/dq (M qd)) qd - dT/dq + dV/dq``."""
    return _mass_and_bias(model, q, qd)[1]


def forward_dynamics(model: ChainModel, q, qd, tau):
    """``qdd = M(q)^{-1} (tau - damping qd - b(q, qd))``."""
    M, b = _mass_and_bias(model, q, qd)
    rhs = tau - model.damping.astype(q.dtype) * qd - b
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.solve(M, rhs)


def inverse_dynamics(model: ChainModel, q, qd, qdd):
    """``tau = M(q) qdd + damping qd + b(q, qd)`` — the consistency dual of
    :func:`forward_dynamics` (used by the round-trip tests)."""
    return (mass_matrix(model, q) @ qdd +
            model.damping.astype(q.dtype) * qd + bias_forces(model, q, qd))


def rk4_step(model: ChainModel, x, u, dt: float):
    """One RK4 step of ``x = [q, qd]`` under torques ``u`` — the discrete
    nonlinear dynamics fn the SQP layer consumes (tpcg/models/sqp.py
    ``TrajOptProblem.dynamics``)."""
    n = model.n_joints

    def f(x_):
        q, qd = x_[:n], x_[n:]
        return jnp.concatenate([qd, forward_dynamics(model, q, qd,
                                                     u.astype(x_.dtype))])

    k1 = f(x)
    k2 = f(x + 0.5 * dt * k1)
    k3 = f(x + 0.5 * dt * k2)
    k4 = f(x + dt * k3)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def total_energy(model: ChainModel, q, qd):
    """Kinetic + potential energy (conservation is the physics test)."""
    return 0.5 * qd @ mass_matrix(model, q) @ qd + _potential(model, q)


def pendulum(length: float = 1.0, mass: float = 1.0,
             damping: float = 0.0, dtype=jnp.float32) -> ChainModel:
    """Single point-mass pendulum about the world y axis — the analytic
    sanity model: q=0 hangs the mass at world -z and
    ``qdd = -(g/l) sin(q) - d/(m l^2) qd``."""
    return ChainModel(
        axes=jnp.asarray([[0.0, 1.0, 0.0]], dtype),
        origins=jnp.zeros((1, 3), dtype),
        masses=jnp.asarray([mass], dtype),
        coms=jnp.asarray([[0.0, 0.0, -length]], dtype),
        inertias=jnp.zeros((1, 3, 3), dtype),
        damping=jnp.asarray([damping], dtype),
        gravity=9.81,
        armature=jnp.zeros((1,), dtype))


def iiwa14_like(damping: float = 0.1, armature: float = 0.15,
                dtype=jnp.float32) -> ChainModel:
    """APPROXIMATE iiwa14-class 7-DoF arm: alternating z/y joint axes,
    iiwa-scale link lengths/masses, rod-like link inertias. The benchmark
    SHAPE of the reference's domain (14 states) — not vendor parameters."""
    axes = jnp.asarray([[0, 0, 1], [0, 1, 0], [0, 0, 1], [0, -1, 0],
                        [0, 0, 1], [0, 1, 0], [0, 0, 1]], dtype)
    origins = jnp.asarray([[0, 0, 0.1575], [0, 0, 0.2025], [0, 0, 0.2045],
                           [0, 0, 0.2155], [0, 0, 0.1845], [0, 0, 0.2155],
                           [0, 0, 0.081]], dtype)
    masses = jnp.asarray([5.76, 6.35, 3.5, 3.5, 3.5, 1.8, 1.2], dtype)
    coms = jnp.asarray([[0, -0.03, 0.12], [0.0003, 0.059, 0.042],
                        [0, 0.03, 0.13], [0, 0.067, 0.034],
                        [0.0001, 0.021, 0.076], [0, 0.0006, 0.0004],
                        [0, 0, 0.02]], dtype)
    rod = lambda m, l: m * l * l / 12.0
    inertias = jnp.stack([jnp.diag(jnp.asarray(
        [rod(m, 0.25), rod(m, 0.25), rod(m, 0.08)], dtype))
        for m in [5.76, 6.35, 3.5, 3.5, 3.5, 1.8, 1.2]])
    return ChainModel(axes=axes, origins=origins, masses=masses, coms=coms,
                      inertias=inertias,
                      damping=jnp.full((7,), damping, dtype), gravity=9.81,
                      armature=jnp.full((7,), armature, dtype))


def manipulator_reach_problem(K: int = 32, dt: float = 0.02,
                              model: ChainModel = None,
                              q_goal=None, dtype=jnp.float32,
                              lane_linearizer: bool = True,
                              jac_integrator: str = "rk4"):
    """Nonlinear manipulator trajectory optimization (n=14, m=7 — the
    reference's iiwa14 benchmark shape) as a ``TrajOptProblem`` for
    :func:`tpcg.models.sqp.sqp_solve`: swing from hanging rest to a goal
    configuration through full rigid-body dynamics.

    ``lane_linearizer=True`` (default) injects the lane-major trajectory
    linearizer (tpcg/models/rbd_lane.py — same physics, K-trailing
    layout; measured 0.59 ms vs 5.5 ms for the jacfwd route at K=128 on
    v5e); set False to linearize by jacfwd over ``dynamics``.
    ``jac_integrator`` ("rk4"/"heun"/"euler") selects the variational
    integrator for the A/B tangents — see
    :func:`tpcg.models.rbd_lane.make_lane_linearizer` (the defect rollout
    stays exact RK4 in every mode)."""
    from tpcg.models.sqp import TrajOptProblem

    model = model or iiwa14_like(dtype=dtype)
    nj = model.n_joints
    n, m = 2 * nj, nj
    q_goal = (jnp.asarray([0.5, 0.4, -0.3, 0.6, 0.2, -0.4, 0.3], dtype)
              if q_goal is None else jnp.asarray(q_goal, dtype))
    x_goal = jnp.concatenate([q_goal, jnp.zeros(nj, dtype)])
    w = jnp.concatenate([jnp.full((nj,), 5.0, dtype),
                         jnp.full((nj,), 0.5, dtype)])
    Q = jnp.broadcast_to(jnp.diag(w), (K, n, n))
    Q = Q.at[-1].multiply(20.0)
    q_lin = -jnp.einsum('kij,j->ki', Q, x_goal, precision=_HIGH)
    R = jnp.broadcast_to(0.01 * jnp.eye(m, dtype=dtype), (K - 1, m, m))
    r = jnp.zeros((K - 1, m), dtype)
    dyn = lambda x, u: rk4_step(model, x, u, dt)
    x_init = jnp.zeros(n, dtype)
    lin = roll = None
    if lane_linearizer:
        from tpcg.models.rbd_lane import (make_lane_linearizer,
                                          make_lane_rollout)
        lin = make_lane_linearizer(model, dt,
                                   jac_integrator=jac_integrator)
        roll = make_lane_rollout(model, dt)
    return TrajOptProblem(dynamics=dyn, Q=Q, q=q_lin, R=R, r=r,
                          x_init=x_init, linearize=lin, rollout=roll)
