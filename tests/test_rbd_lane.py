"""Parity of the lane-major (K-trailing) rigid-body route (rbd_lane)
against the per-sample Lagrangian formulation (rigid_body) — same physics,
different layout, so every quantity must agree to f32 roundoff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg.models import rbd_lane as rbl
from tpcg.models import rigid_body as rb


@pytest.fixture(scope="module")
def model():
    return rb.iiwa14_like()


@pytest.fixture(scope="module")
def cs(model):
    return rbl._np_consts(model)


@pytest.fixture(scope="module")
def qqd():
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.uniform(-1.2, 1.2, (7, 5)), jnp.float32)
    qd = jnp.asarray(rng.uniform(-2.0, 2.0, (7, 5)), jnp.float32)
    return q, qd


def test_mass_parity(model, cs, qqd):
    q, _ = qqd
    M_t = np.asarray(rbl._mass_t(cs, rbl._fk_t(cs, q), jnp.float32))
    for k in range(q.shape[1]):
        want = np.asarray(rb.mass_matrix(model, q[:, k]))
        np.testing.assert_allclose(M_t[..., k], want, rtol=2e-5, atol=2e-5)


def test_bias_parity(model, cs, qqd):
    q, qd = qqd
    _, b_t = rbl._mass_and_bias_t(cs, q, qd)
    for k in range(q.shape[1]):
        want = np.asarray(rb.bias_forces(model, q[:, k], qd[:, k]))
        np.testing.assert_allclose(np.asarray(b_t[:, k]), want,
                                   rtol=2e-4, atol=2e-4)


def test_forward_dynamics_parity(model, cs, qqd):
    q, qd = qqd
    tau = jnp.asarray(np.linspace(-3, 3, 7), jnp.float32)
    qdd_t = rbl._fd_t(cs, q, qd, jnp.broadcast_to(tau[:, None], q.shape))
    for k in range(q.shape[1]):
        want = np.asarray(rb.forward_dynamics(model, q[:, k], qd[:, k],
                                              tau))
        np.testing.assert_allclose(np.asarray(qdd_t[:, k]), want,
                                   rtol=5e-4,
                                   atol=5e-4 * max(1.0, np.abs(want).max()))


def test_rk4_step_parity(model):
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-0.8, 0.8, 14), jnp.float32)
    u = jnp.asarray(rng.uniform(-2, 2, 7), jnp.float32)
    a = np.asarray(rb.rk4_step(model, x, u, 0.01))
    b = np.asarray(rbl.rk4_step(model, x, u, 0.01))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_linearizer_parity(model):
    """The quantities the SQP layer consumes: A, B, and the primal
    rollout must match the jacfwd route over rigid_body.rk4_step."""
    rng = np.random.default_rng(3)
    K = 12
    X = jnp.asarray(rng.uniform(-0.5, 0.5, (K, 14)), jnp.float32)
    U = jnp.asarray(rng.uniform(-1, 1, (K - 1, 7)), jnp.float32)
    dt = 0.01
    A, B, F = jax.jit(rbl.make_lane_linearizer(model, dt))(X, U)
    step = lambda x_, u_: rb.rk4_step(model, x_, u_, dt)
    A_ref = jax.vmap(jax.jacfwd(step, argnums=0))(X[:-1], U)
    B_ref = jax.vmap(jax.jacfwd(step, argnums=1))(X[:-1], U)
    F_ref = jax.vmap(step)(X[:-1], U)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(B), np.asarray(B_ref),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(F), np.asarray(F_ref),
                               rtol=1e-4, atol=2e-5)


def test_pendulum_lane(model):
    """Single pendulum sanity through the lane route: qdd =
    -(g/l) sin(q) - d/(m l^2) qd."""
    pend = rb.pendulum(length=0.8, mass=1.3, damping=0.2)
    cs = rbl._np_consts(pend)
    q = jnp.asarray([[0.7, -0.2]], jnp.float32)
    qd = jnp.asarray([[-0.4, 0.9]], jnp.float32)
    got = np.asarray(rbl._fd_t(cs, q, qd, jnp.zeros_like(q)))
    want = (-(9.81 / 0.8) * np.sin(np.asarray(q[0]))
            - 0.2 / (1.3 * 0.8 ** 2) * np.asarray(qd[0]))
    np.testing.assert_allclose(got[0], want, rtol=1e-5)


def test_reach_problem_injects_lane_linearizer(model):
    p = rb.manipulator_reach_problem(K=8, dt=0.01)
    assert p.linearize is not None
    p2 = rb.manipulator_reach_problem(K=8, dt=0.01, lane_linearizer=False)
    assert p2.linearize is None
    from tpcg.models.sqp import _linearize
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.uniform(-0.3, 0.3, (8, 14)), jnp.float32)
    U = jnp.asarray(rng.uniform(-1, 1, (7, 7)), jnp.float32)
    A1, B1, F1 = _linearize(p, X, U)
    A2, B2, F2 = _linearize(p2, X, U)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(F1), np.asarray(F2),
                               rtol=1e-4, atol=2e-5)


def test_inexact_jacobian_modes(model):
    """The heun/euler tangent integrators (inexact-Jacobian RTI,
    rbd_lane.make_lane_linearizer): the primal rollout F must be EXACTLY
    the RK4 one in every mode (it defines the defect, hence the solution
    manifold), while A/B approximate the exact Jacobian to the variational
    integrator's order in dt."""
    rng = np.random.default_rng(5)
    K, dt = 10, 0.01
    X = jnp.asarray(rng.uniform(-0.5, 0.5, (K, 14)), jnp.float32)
    U = jnp.asarray(rng.uniform(-1, 1, (K - 1, 7)), jnp.float32)
    A0, B0, F0 = jax.jit(rbl.make_lane_linearizer(model, dt))(X, U)
    errs = {}
    for ji in ("heun", "euler"):
        A, B, F = jax.jit(
            rbl.make_lane_linearizer(model, dt, jac_integrator=ji))(X, U)
        # same RK4 discretization; ulp-level differences allowed (the
        # rk4 mode's primal comes out of jax.linearize's partial eval,
        # the cheap modes re-evaluate _rk4_t directly, and XLA:CPU
        # FMA-contracts the two graphs differently)
        np.testing.assert_allclose(np.asarray(F), np.asarray(F0),
                                   rtol=1e-6, atol=1e-6)
        errs[ji] = float(jnp.max(jnp.abs(A - A0)))
        # close to the exact Jacobian (O(dt^3)/O(dt^2) local error at
        # dt=0.01 on a chain with |J| ~ O(10^2))
        np.testing.assert_allclose(np.asarray(A), np.asarray(A0),
                                   atol=5e-3 if ji == "heun" else 5e-2)
        np.testing.assert_allclose(np.asarray(B), np.asarray(B0),
                                   atol=5e-3 if ji == "heun" else 5e-2)
    # higher-order tangents are strictly more accurate
    assert errs["heun"] < errs["euler"]
    with pytest.raises(ValueError, match="jac_integrator"):
        rbl.make_lane_linearizer(model, dt, jac_integrator="rk9")


def test_inexact_jacobian_closed_loop(model):
    """RTI closed loop with heun tangents tracks the exact-Jacobian loop:
    same QP solution manifold (exact defects), slightly perturbed step
    operator — trajectories must stay close over a short horizon."""
    from tpcg.models import nmpc
    from tpcg.types import PCGConfig

    cfg = PCGConfig(exit_tol=1e-6, max_iter=100,
                    preconditioner="symmetric_stair")
    xs = {}
    for ji in ("rk4", "heun"):
        p = rb.manipulator_reach_problem(K=16, dt=0.01, jac_integrator=ji)
        sim = nmpc.simulate(p, p.x_init, n_steps=6, config=cfg)
        assert bool(jnp.all(jnp.isfinite(sim.xs)))
        xs[ji] = np.asarray(sim.xs)
    np.testing.assert_allclose(xs["heun"], xs["rk4"], rtol=1e-3, atol=1e-3)
