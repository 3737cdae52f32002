"""Rigid-body dynamics (tpcg/models/rigid_body.py): analytic pendulum
parity, mass-matrix structure, inverse/forward consistency, energy
conservation, and the n=14 nonlinear manipulator through the SQP stack."""

import jax
import jax.numpy as jnp
import numpy as np

from tpcg.models.rigid_body import (forward_dynamics, iiwa14_like,
                                    inverse_dynamics, manipulator_reach_problem,
                                    mass_matrix, pendulum, rk4_step,
                                    total_energy)


def test_pendulum_matches_analytic():
    l, m, d = 1.3, 0.7, 0.2
    model = pendulum(length=l, mass=m, damping=d)
    g = model.gravity
    for q0, qd0, tau in [(0.3, 0.0, 0.0), (-1.1, 0.5, 0.0), (2.0, -0.4, 1.5)]:
        q = jnp.asarray([q0], jnp.float32)
        qd = jnp.asarray([qd0], jnp.float32)
        u = jnp.asarray([tau], jnp.float32)
        got = float(forward_dynamics(model, q, qd, u)[0])
        want = (-(g / l) * np.sin(q0) - d * qd0 / (m * l * l)
                + tau / (m * l * l))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mass_matrix_symmetric_positive_definite():
    model = iiwa14_like()
    q = jax.random.uniform(jax.random.PRNGKey(0), (7,), jnp.float32,
                           -1.5, 1.5)
    M = np.asarray(mass_matrix(model, q), np.float64)
    np.testing.assert_allclose(M, M.T, rtol=1e-4, atol=1e-6)
    w = np.linalg.eigvalsh(M)
    assert w.min() > 1e-4, w


def test_geometric_jacobian_matches_autodiff():
    """The closed-form COM Jacobian (axis x arm columns) must equal
    jacfwd of the FK COM positions — the correctness anchor for keeping
    autodiff OUT of the inner kinematics (trace-time reasons, module
    docstring)."""
    from tpcg.models.rigid_body import _fk, com_jacobians

    model = iiwa14_like()
    q = jax.random.uniform(jax.random.PRNGKey(3), (7,), jnp.float32,
                           -1.2, 1.2)
    Jv, _ = com_jacobians(model, q)
    Jv_ad = jax.jacfwd(lambda qq: _fk(model, qq)[1])(q)  # (N, 3, N)
    np.testing.assert_allclose(np.asarray(Jv), np.asarray(Jv_ad),
                               rtol=1e-4, atol=1e-5)


def test_inverse_forward_roundtrip():
    model = iiwa14_like()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.uniform(k1, (7,), jnp.float32, -1.0, 1.0)
    qd = jax.random.normal(k2, (7,), jnp.float32)
    tau = 5.0 * jax.random.normal(k3, (7,), jnp.float32)
    qdd = forward_dynamics(model, q, qd, tau)
    tau_back = inverse_dynamics(model, q, qd, qdd)
    np.testing.assert_allclose(np.asarray(tau_back), np.asarray(tau),
                               rtol=1e-3, atol=1e-3)


def test_energy_conservation_undamped():
    """Unforced, undamped chain under gravity: RK4 must conserve total
    energy to integrator accuracy (the physics-level correctness check —
    wrong Coriolis terms show up as secular energy drift)."""
    model = iiwa14_like(damping=0.0)
    x = jnp.concatenate([
        jnp.asarray([0.4, 0.8, -0.3, 0.9, 0.2, -0.5, 0.1], jnp.float32),
        jnp.zeros(7, jnp.float32)])
    u = jnp.zeros(7, jnp.float32)
    e0 = float(total_energy(model, x[:7], x[7:]))

    step = jax.jit(lambda x_: rk4_step(model, x_, u, 0.002))
    for _ in range(100):
        x = step(x)
    e1 = float(total_energy(model, x[:7], x[7:]))
    # scale by kinetic+potential swing, not the absolute offset
    assert abs(e1 - e0) < 5e-2, (e0, e1)
    assert np.all(np.isfinite(np.asarray(x)))


def test_manipulator_reach_through_sqp():
    """The full MPCGPU-shaped stack at the reference's benchmark scale
    (n=14): nonlinear rigid-body dynamics -> Gauss-Newton SQP -> LQR-KKT
    Schur complement -> PCG. Converges and closes the defects.

    Runs in a SUBPROCESS: XLA:CPU's compile of this graph (the suite's
    largest — vmapped jacfwd over rigid-body RK4 inside the jitted SQP
    iteration) SIGSEGVs nondeterministically ~270 tests into a long
    pytest process (observed at exactly this test across three full-suite
    runs; a fresh process — solo file run or the pair with its
    alphabetical predecessor — always passes). Process isolation plus the
    shared persistent compile cache make it robust AND fast when warm."""
    import os
    import subprocess
    import sys
    import textwrap

    import jax

    cache = jax.config.jax_compilation_cache_dir
    code = textwrap.dedent(f"""
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        if {cache!r}:
            jax.config.update("jax_compilation_cache_dir", {cache!r})
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.1)
        import numpy as np
        from tpcg.models.rigid_body import manipulator_reach_problem
        from tpcg.models.sqp import sqp_solve

        p = manipulator_reach_problem(K=12, dt=0.03)
        res = sqp_solve(p, max_sqp_iters=15, defect_tol=1e-3,
                        step_tol=1e-3)
        assert res.defect < 1e-3, res.defect
        assert res.history[-1]["cost"] < res.history[0]["cost"]
        q_end = np.asarray(res.x[-1][:7])
        q_goal = np.asarray([0.5, 0.4, -0.3, 0.6, 0.2, -0.4, 0.3])
        assert (np.linalg.norm(q_end - q_goal)
                < 0.5 * np.linalg.norm(q_goal))
        print("REACH_OK")
    """)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1500,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert out.returncode == 0 and "REACH_OK" in out.stdout, (
        out.returncode, out.stdout[-1000:], out.stderr[-3000:])
