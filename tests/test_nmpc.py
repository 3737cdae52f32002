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
