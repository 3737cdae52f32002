"""Parity of the closed-form rigid-body derivatives (rbd_analytic) against
the Lagrangian-autodiff formulation (rigid_body) — same physics, different
derivation route, so every quantity must agree to f32 roundoff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg.models import rbd_analytic as rba
from tpcg.models import rigid_body as rb


@pytest.fixture(scope="module", autouse=True)
def _no_persistent_cache():
    """This module's jacfwd-over-closed-form graphs are the suite's
    deepest flat XLA:CPU executables, and their PERSISTENT-CACHE entries
    segfault the process — observed in round 4 on both the write
    (put_executable_and_time) and, deterministically once written, the
    read (get_executable_and_time) of the test_rk4_jacobian_parity
    entry, strictly solo, same host/fingerprint that wrote it minutes
    before. Recompiling every run (~2-3 min for the module) is the
    robust trade; every other module keeps the warm cache.

    The latch reset rides jax._src internals (a JAX upgrade may move
    them); if the import/reset fails this degrades to leaving the cache
    config as-is with a warning — recompilation-or-cache behavior then
    follows whatever JAX does, rather than failing collection."""
    try:
        from jax._src import compilation_cache
        reset = compilation_cache.reset_cache
    except Exception as e:  # pragma: no cover - depends on JAX version
        import warnings

        warnings.warn(
            f"jax._src.compilation_cache internals unavailable ({e}); "
            "persistent-cache disabling skipped for this module")
        yield
        return

    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    # the used/not-used decision is LATCHED at the first compile of the
    # process (compilation_cache._cache_checked); a config change alone
    # is ignored mid-suite — reset_cache() clears the latch
    reset()
    yield
    jax.config.update("jax_compilation_cache_dir", old)
    reset()


@pytest.fixture(scope="module")
def model():
    return rb.iiwa14_like()


@pytest.fixture(scope="module")
def qs():
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.uniform(-1.2, 1.2, (5, 7)), jnp.float32)


@pytest.fixture(scope="module")
def qds():
    rng = np.random.default_rng(11)
    return jnp.asarray(rng.uniform(-2.0, 2.0, (5, 7)), jnp.float32)


def test_dmass_dq_matches_jacfwd(model, qs):
    jac = jax.jit(jax.jacfwd(lambda q: rb.mass_matrix(model, q)))
    ana = jax.jit(lambda q: rba.dmass_dq(model, q))
    for q in qs:
        want = np.moveaxis(np.asarray(jac(q)), -1, 0)  # (N, N, N), [k] = dM/dq_k
        got = np.asarray(ana(q))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_bias_matches_lagrangian(model, qs, qds):
    f_ref = jax.jit(lambda q, qd: rb.bias_forces(model, q, qd))
    f_ana = jax.jit(lambda q, qd: rba.bias_forces(model, q, qd))
    for q, qd in zip(qs, qds):
        np.testing.assert_allclose(np.asarray(f_ana(q, qd)),
                                   np.asarray(f_ref(q, qd)),
                                   rtol=2e-4, atol=2e-4)


def test_forward_dynamics_parity(model, qs, qds):
    tau = jnp.asarray(np.linspace(-3, 3, 7), jnp.float32)
    f_ref = jax.jit(lambda q, qd: rb.forward_dynamics(model, q, qd, tau))
    f_ana = jax.jit(lambda q, qd: rba.forward_dynamics(model, q, qd, tau))
    for q, qd in zip(qs, qds):
        a, b = np.asarray(f_ana(q, qd)), np.asarray(f_ref(q, qd))
        np.testing.assert_allclose(a, b, rtol=5e-4,
                                   atol=5e-4 * max(1.0, np.abs(b).max()))


def test_rk4_jacobian_parity(model):
    """The quantity the SQP layer consumes: jacfwd of the discrete step.
    Single-level autodiff over the closed form must match two-level
    autodiff over the Lagrangian form."""
    x = jnp.asarray(np.concatenate([np.linspace(-0.6, 0.6, 7),
                                    np.linspace(-1.0, 1.0, 7)]), jnp.float32)
    u = jnp.asarray(np.linspace(-2, 2, 7), jnp.float32)
    dt = 0.01
    A_ref = jax.jit(jax.jacfwd(lambda x_: rb.rk4_step(model, x_, u, dt)))(x)
    A_ana = jax.jit(jax.jacfwd(lambda x_: rba.rk4_step(model, x_, u, dt)))(x)
    np.testing.assert_allclose(np.asarray(A_ana), np.asarray(A_ref),
                               rtol=1e-3, atol=2e-4)
    B_ref = jax.jit(jax.jacfwd(lambda u_: rb.rk4_step(model, x, u_, dt)))(u)
    B_ana = jax.jit(jax.jacfwd(lambda u_: rba.rk4_step(model, x, u_, dt)))(u)
    np.testing.assert_allclose(np.asarray(B_ana), np.asarray(B_ref),
                               rtol=1e-3, atol=2e-4)


def test_pendulum_analytic(model):
    """Single pendulum sanity: qdd = -(g/l) sin(q) - d/(m l^2) qd through
    the closed-form route."""
    pend = rb.pendulum(length=0.8, mass=1.3, damping=0.2)
    q = jnp.asarray([0.7], jnp.float32)
    qd = jnp.asarray([-0.4], jnp.float32)
    got = rba.forward_dynamics(pend, q, qd, jnp.zeros(1, jnp.float32))
    want = -(9.81 / 0.8) * np.sin(0.7) - 0.2 / (1.3 * 0.8**2) * (-0.4)
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-5)
